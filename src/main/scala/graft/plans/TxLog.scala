package graft.plans

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name, lit}

/** A minimal but real table-format transaction log — the self-contained
  * stand-in for the Delta log the reference materializes 197 models on
  * (reference: macros/spark_adapter_patch/create_table.sql:29-34 pins
  * `using delta`; incremental.sql drives MERGE against it). No Delta jar
  * exists in this environment, so the log format itself is implemented from
  * first principles; the design is the published Delta/Iceberg recipe:
  *
  *  - **Data files are immutable.** Writers stage fresh parquet files under
  *    `<table>/data/` with unique names; nothing ever rewrites a published
  *    file in place.
  *  - **The log is the table.** `<table>/_txlog/<version%020d>.json` holds
  *    one commit each: a JSON-lines list of `add`/`remove`(tombstone)/`meta`
  *    actions naming file paths relative to the table root, with per-file
  *    partition values (row counts optional, -1 = unknown). A snapshot at
  *    version V = replay of
  *    commits 0..V (or checkpoint + suffix). Readers NEVER list the data
  *    directory — on object stores listing is both slow and (historically)
  *    eventually consistent, and dead files from aborted/vacuum-pending
  *    commits legitimately live next to live ones.
  *  - **Commit = atomic claim of the next version number.** The writer
  *    serializes its actions to a temp file and atomically claims
  *    `_txlog/<next>.json` via create-new (CREATE_NEW is the filesystem
  *    analogue of S3 if-none-match / GCS generation-0 preconditions). A
  *    concurrent writer that lost the race gets [[TxConflict]] and re-reads
  *    the new snapshot before retrying — optimistic concurrency, exactly
  *    Delta's protocol.
  *  - **Checkpoints bound replay.** Every [[checkpointInterval]] commits the
  *    full live-file set is also written to `<version>.checkpoint.json`;
  *    snapshot resolution reads the latest checkpoint plus the commits after
  *    it — O(interval), not O(history). At 100 TB the live set is millions
  *    of files; the checkpoint is what keeps planning latency flat in table
  *    AGE (Delta does the same with parquet checkpoints every 10 commits).
  *  - **Tombstones + VACUUM give snapshot isolation.** `remove` actions
  *    leave the file bytes in place; a concurrent reader holding an older
  *    snapshot keeps reading them. [[vacuum]] physically deletes only
  *    tombstones older than the retention window — the missing piece the
  *    rename/pointer protocols in [[graft.runtime.TableCommitProtocol]]
  *    explicitly documented as the log's job.
  *  - **Time travel** falls out: [[snapshot]] accepts any historical
  *    version (subject to vacuum retention).
  *
  * Scale posture: commits are metadata (KBs per commit independent of data
  * volume); readers resolve a snapshot with ≤2 small reads (latest
  * checkpoint + tail commits) and partition-prune on the manifest's
  * partition values BEFORE any parquet footer is opened — driver-side work
  * proportional to file count, the same work Spark's own
  * PartitioningAwareFileIndex does after an O(files) directory listing.
  */
object TxLog {

  final case class AddFile(path: String, partitionValues: Map[String, String], rows: Long)
  final case class Snapshot(version: Long, files: Seq[AddFile],
                            partitionCols: Seq[String]) {
    def paths(root: Path): Seq[String] = files.map(f => root.resolve(f.path).toString)
  }

  /** Optimistic-concurrency loss: another writer claimed the version this
    * writer was about to commit. Re-read the snapshot and retry. */
  final class TxConflict(msg: String) extends RuntimeException(msg)

  private val checkpointInterval = 10

  /** Optional wall-time sink `(key, seconds)` — the corpus runner plugs its
    * profiler in to attribute the log-format tax; null (default) costs one
    * volatile read per call. */
  @volatile var profiler: (String, Double) => Unit = null
  private def prof[A](k: String)(f: => A): A = {
    val p = profiler
    if (p == null) f
    else { val t0 = System.nanoTime(); try f finally p(k, (System.nanoTime() - t0) / 1e9) }
  }

  private def logDir(table: Path): Path = table.resolve("_txlog")
  private def dataDir(table: Path): Path = table.resolve("data")
  private def commitFile(table: Path, v: Long): Path =
    logDir(table).resolve(f"$v%020d.json")
  private def checkpointFile(table: Path, v: Long): Path =
    logDir(table).resolve(f"$v%020d.checkpoint.json")

  def exists(table: Path): Boolean = Files.isDirectory(logDir(table))

  // ---- JSON (hand-rolled: actions are flat maps of strings/longs; no
  // external JSON dependency is available in this environment) ----

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }

  private def addJson(a: AddFile): String = {
    val pv = a.partitionValues.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString(",")
    s"""{"add":{"path":"${esc(a.path)}","pv":{$pv},"rows":${a.rows}}}"""
  }

  private def removeJson(path: String, ts: Long): String =
    s"""{"remove":{"path":"${esc(path)}","ts":$ts}}"""

  private def metaJson(partitionCols: Seq[String]): String =
    s"""{"meta":{"partitionCols":[${partitionCols.map(c => s""""${esc(c)}"""").mkString(",")}]}}"""

  private val addRe =
    """\{"add":\{"path":"((?:[^"\\]|\\.)*)","pv":\{((?:[^{}]|\{\})*)\},"rows":(-?\d+)\}\}""".r
  private val removeRe = """\{"remove":\{"path":"((?:[^"\\]|\\.)*)","ts":(\d+)\}\}""".r
  private val metaRe = """\{"meta":\{"partitionCols":\[([^\]]*)\]\}\}""".r
  private val pvRe = """"((?:[^"\\]|\\.)*)":"((?:[^"\\]|\\.)*)"""".r

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n' => sb += '\n'; i += 2
          case 'u' => sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case other => sb += other; i += 2
        }
      } else { sb += s(i); i += 1 }
    }
    sb.toString
  }

  private final case class Replay(
    files: scala.collection.mutable.LinkedHashMap[String, AddFile],
    tombstones: scala.collection.mutable.LinkedHashMap[String, Long],
    var partitionCols: Seq[String])

  private def applyLine(r: Replay, line: String): Unit = line match {
    case addRe(p, pv, rows) =>
      val path = unesc(p)
      val pvs = pvRe.findAllMatchIn(pv).map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap
      r.files(path) = AddFile(path, pvs, rows.toLong)
      r.tombstones.remove(path)
    case removeRe(p, ts) =>
      val path = unesc(p)
      r.files.remove(path)
      r.tombstones(path) = ts.toLong
    case metaRe(cols) =>
      r.partitionCols =
        """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(cols).map(m => unesc(m.group(1))).toSeq
    case "" => ()
    case other => throw new IllegalStateException(s"unparseable txlog action: $other")
  }

  private def listVersions(table: Path): (Seq[Long], Seq[Long]) = prof("txlog.listVersions") {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) return (Nil, Nil)
    val ls = Files.list(dir)
    try {
      val names = ls.iterator().asScala.map(_.getFileName.toString).toSeq
      val commits = names.collect { case n if n.endsWith(".json") && !n.contains("checkpoint") && !n.endsWith(".tmp") =>
        n.stripSuffix(".json") }.filter(_.forall(_.isDigit)).map(_.toLong).sorted
      val checkpoints = names.collect { case n if n.endsWith(".checkpoint.json") =>
        n.stripSuffix(".checkpoint.json") }.filter(_.forall(_.isDigit)).map(_.toLong).sorted
      (commits, checkpoints)
    } finally ls.close()
  }

  /** Resolve the table state at `asOf` (default: latest committed version).
    * Reads the newest checkpoint ≤ target plus the commits after it. */
  def snapshot(table: Path, asOf: Long = Long.MaxValue): Snapshot = prof("txlog.snapshot") {
    val (commits, checkpoints) = listVersions(table)
    val upto = commits.filter(_ <= asOf)
    require(upto.nonEmpty, s"no committed version <= $asOf in ${logDir(table)}")
    val target = upto.max
    val base = checkpoints.filter(_ <= target).maxOption
    val r = Replay(scala.collection.mutable.LinkedHashMap.empty,
      scala.collection.mutable.LinkedHashMap.empty, Nil)
    base.foreach { cp =>
      Files.readAllLines(checkpointFile(table, cp), StandardCharsets.UTF_8)
        .asScala.foreach(applyLine(r, _))
    }
    for (v <- upto if base.forall(v > _)) // checkpoint already includes its own version
      Files.readAllLines(commitFile(table, v), StandardCharsets.UTF_8)
        .asScala.foreach(applyLine(r, _))
    Snapshot(target, r.files.values.toSeq, r.partitionCols)
  }

  /** Replay INCLUDING tombstones — vacuum needs the remove timestamps. */
  private def replayFull(table: Path): (Replay, Long) = prof("txlog.replayFull") {
    val (commits, _) = listVersions(table)
    val r = Replay(scala.collection.mutable.LinkedHashMap.empty,
      scala.collection.mutable.LinkedHashMap.empty, Nil)
    for (v <- commits)
      Files.readAllLines(commitFile(table, v), StandardCharsets.UTF_8)
        .asScala.foreach(applyLine(r, _))
    (r, commits.lastOption.getOrElse(-1L))
  }

  /** Atomically publish `actions` as the next version after `readVersion`.
    * Throws [[TxConflict]] if any other writer committed since `readVersion`
    * was read — the caller re-reads and retries (optimistic concurrency).
    * The claim itself is create-new on the commit file: two writers racing
    * for the same version number cannot both win. */
  private def commit(table: Path, readVersion: Long, actions: Seq[String]): Long = prof("txlog.commit") {
    Files.createDirectories(logDir(table))
    val next = readVersion + 1
    val tmp = logDir(table).resolve(f"$next%020d.json.${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp, actions.mkString("\n").getBytes(StandardCharsets.UTF_8))
    try {
      // The version-number claim must be CREATE-NEW: rename(2) (and thus
      // Files.move, even with ATOMIC_MOVE) silently REPLACES an existing
      // target on POSIX, which would let a race loser destroy the winner's
      // commit. link(2) is the true create-new primitive — hard-linking the
      // staged temp file onto the commit path fails with EEXIST if any
      // writer already claimed this version.
      try Files.createLink(commitFile(table, next), tmp)
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        throw new TxConflict(s"version $next already committed by a concurrent writer")
      }
    } finally Files.deleteIfExists(tmp)
    maybeCheckpoint(table, next)
    next
  }

  private def maybeCheckpoint(table: Path, version: Long): Unit =
    if (version > 0 && version % checkpointInterval == 0) prof("txlog.checkpoint") {
      val snap = snapshot(table, version)
      val lines = metaJson(snap.partitionCols) +: snap.files.map(addJson)
      val tmp = checkpointFile(table, version).resolveSibling(
        f"$version%020d.checkpoint.json.tmp")
      Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      // losing a checkpoint race is harmless (identical content); REPLACE
      Files.move(tmp, checkpointFile(table, version),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }

  // ---- write paths ----

  /** Stage `df` as fresh immutable parquet files under data/ and return
    * their add-actions. Uses a private staging dir + move so a crashed
    * writer leaves only unreferenced garbage, never a half-visible file. */
  private def stage(table: Path, df: DataFrame,
                    partitionBy: Seq[String]): Seq[AddFile] = prof("txlog.stage") {
    val stagingId = java.util.UUID.randomUUID().toString.take(8)
    val staging = table.resolve(s"_staging_$stagingId")
    // NOTE (guide §6 file layout): stage writes `df` with whatever
    // distribution the caller chose. Unclustered input to a partitioned
    // write means every task writes a sliver into every partition directory
    // it holds (tasks × partitions files per commit) — the Warehouse write
    // paths repartition via distributeForWrite (including the hashSpread
    // skew spread, which a forced repartition here would clobber); direct
    // TxLog callers must cluster by the partition columns themselves.
    val writer = if (partitionBy.nonEmpty) df.write.partitionBy(partitionBy: _*) else df.write
    writer.mode("overwrite").parquet(staging.toString)
    Files.createDirectories(dataDir(table))
    val staged = Files.walk(staging)
    val adds = try {
      staged.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map { p =>
          val rel = staging.relativize(p)
          // partition values come from the directory structure Spark wrote
          val pvs = rel.iterator().asScala.map(_.toString).toSeq.dropRight(1)
            .flatMap { seg =>
              seg.split("=", 2) match {
                case Array(k, v) => Some(k -> v)
                case _ => None
              }
            }.toMap
          val dest = dataDir(table).resolve(s"$stagingId-${rel.toString.replace('/', '-')}")
          Files.move(p, dest)
          AddFile(table.relativize(dest).toString, pvs, -1L)
        }.toSeq
    } finally staged.close()
    graft.runtime.TempDirs.deleteTree(staging)
    adds
  }

  /** Create or fully replace the table: tombstone every live file, add the
    * new ones. One atomic commit. */
  def overwrite(table: Path, df: DataFrame, partitionBy: Seq[String] = Nil): Long =
    retryingCommit(table) { snap =>
      val now = System.currentTimeMillis()
      val adds = stage(table, df, partitionBy)
      metaJson(partitionBy) +:
        (snap.files.map(f => removeJson(f.path, now)) ++ adds.map(addJson))
    }

  /** Append new files; nothing is removed. */
  def append(table: Path, df: DataFrame, partitionBy: Seq[String] = Nil): Long =
    retryingCommit(table) { snap =>
      val cols = if (snap.partitionCols.nonEmpty) snap.partitionCols else partitionBy
      val adds = stage(table, df, cols)
      metaJson(cols) +: adds.map(addJson)
    }

  /** Dynamic-partition overwrite: replace exactly the partitions present in
    * `df`, leave all others untouched — the reference's insert_overwrite
    * semantics, as one atomic commit (no reader ever sees a partition
    * half-swapped). */
  def overwritePartitions(table: Path, df: DataFrame, partitionBy: Seq[String]): Long =
    retryingCommit(table) { snap =>
      val now = System.currentTimeMillis()
      val adds = stage(table, df, partitionBy)
      val touched: Set[Map[String, String]] = adds.map(_.partitionValues).toSet
      val removes = snap.files.filter(f => touched.contains(f.partitionValues))
      metaJson(partitionBy) +: (removes.map(f => removeJson(f.path, now)) ++ adds.map(addJson))
    }

  private def retryingCommit(table: Path, maxRetries: Int = 5)
                            (actions: Snapshot => Seq[String]): Long = {
    var attempt = 0
    while (true) {
      attempt += 1
      val snap = if (exists(table) && listVersions(table)._1.nonEmpty)
        snapshot(table) else Snapshot(-1L, Nil, Nil)
      try return commit(table, snap.version, actions(snap))
      catch { case _: TxConflict if attempt <= maxRetries => () }
    }
    -1L // unreachable
  }

  /** Read the live snapshot (or a historical one) as a DataFrame, from the
    * manifest's explicit file list — no directory listing. `partitionFilter`
    * prunes files by their manifest partition values BEFORE any footer is
    * opened. Partition columns are re-attached from the manifest (they are
    * not in the file bytes, same as Spark's own partitioned layout). */
  def read(spark: SparkSession, table: Path, asOf: Long = Long.MaxValue,
           partitionFilter: Map[String, String] => Boolean = _ => true): DataFrame = {
    val snap = snapshot(table, asOf)
    val live = snap.files.filter(f => partitionFilter(f.partitionValues))
    if (live.isEmpty)
      throw new IllegalStateException(s"txlog snapshot v${snap.version} has no files after pruning")
    readSubset(spark, table, live, snap.partitionCols)
  }

  /** The staging-unique terminal name segment of the file being scanned —
    * input_file_name()'s scheme/prefix varies by filesystem, the name does
    * not. Joins a scanned row back to its manifest entry. */
  def scannedFileName: Column = org.apache.spark.sql.functions
    .regexp_extract(input_file_name(), "[^/]+$", 0)

  /** Above this file count the partition re-attach switches from an inline
    * literal map to a broadcast manifest join: a 10k–100k-file snapshot (the
    * 100 TB regime) would otherwise plant an O(files) expression tree in
    * EVERY reader plan — quadratic driver work across queries, and far past
    * codegen's method-size limits. 256 keeps small tables on the zero-join
    * codegen'd path. */
  private[graft] val inlinePartitionMapThreshold = 256

  /** Read an explicit subset of manifest files, re-attaching partition
    * columns (as strings) from their manifest partition values. Small
    * snapshots inline the file→value map into the plan (codegen'd, no join);
    * large ones broadcast-join the manifest — constant-size plans at any
    * file count, the same shape Delta's own scan uses (partition values ride
    * the file index, not the plan). */
  def readSubset(spark: SparkSession, table: Path, files: Seq[AddFile],
                 partitionCols: Seq[String],
                 inlineThreshold: Int = inlinePartitionMapThreshold): DataFrame = {
    val base = spark.read.parquet(files.map(f => table.resolve(f.path).toString): _*)
    if (partitionCols.isEmpty) base
    else if (files.size <= inlineThreshold)
      partitionCols.foldLeft(base) { (df, c) =>
        val mapping = files.map { f =>
          (f.path.split('/').last, f.partitionValues.getOrElse(c, "__NULL__"))
        }
        val m = org.apache.spark.sql.functions.map(
          mapping.flatMap { case (p, v) => Seq(lit(p), lit(v)) }: _*)
        df.withColumn(c,
          org.apache.spark.sql.functions.nullif(m(scannedFileName), lit("__NULL__")))
      }
    else manifestJoin(spark, base, files, partitionCols)
  }

  /** The large-snapshot partition re-attach: broadcast a (file count)-row
    * manifest frame and equi-join on the scanned file name. One broadcast of
    * KBs-per-file metadata, zero shuffle of the data side. */
  private def manifestJoin(spark: SparkSession, base: DataFrame,
                           files: Seq[AddFile], partitionCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    // the working column must not shadow a real data column (withColumn
    // would overwrite it with the scanned file name and drop() would then
    // remove the user's data) — suffix until free
    val fileCol = Iterator.from(0).map {
      case 0 => "__txlog_file"
      case i => s"__txlog_file_$i"
    }.find(n => !base.columns.contains(n)).get
    val schema = StructType(StructField(fileCol, StringType, nullable = false) +:
      partitionCols.map(StructField(_, StringType, nullable = true)))
    val rows: java.util.List[Row] = files.map { f =>
      Row.fromSeq(f.path.split('/').last +:
        partitionCols.map(c => f.partitionValues.get(c).orNull))
    }.asJava
    val manifest = spark.createDataFrame(rows, schema)
    base.withColumn(fileCol, scannedFileName)
      .join(org.apache.spark.sql.functions.broadcast(manifest), Seq(fileCol), "left")
      .drop(fileCol)
  }

  /** File-level replace — the commit shape of a Delta MERGE: tombstone
    * exactly `removePaths` (manifest-relative) and add `df`'s freshly staged
    * files, in one atomic commit that must land at `readVersion`+1. Throws
    * [[TxConflict]] if a concurrent writer got there first; the caller
    * re-probes against the new snapshot and retries (its staged files are
    * left as unreferenced orphans for vacuum). */
  def replaceFiles(table: Path, readVersion: Long, removePaths: Seq[String],
                   df: DataFrame, partitionBy: Seq[String]): Long = {
    val now = System.currentTimeMillis()
    val adds = stage(table, df, partitionBy)
    commit(table, readVersion,
      metaJson(partitionBy) +: (removePaths.map(removeJson(_, now)) ++ adds.map(addJson)))
  }

  /** Physically delete tombstoned files older than `retentionMs`, and prune
    * fully-covered log history. Never touches COMMITTED live files; a reader
    * holding a snapshot newer than the retention window is unaffected — this
    * is Delta's VACUUM contract. Caveat (also Delta's): every pass that
    * reclaims possibly-in-flight artifacts — unreferenced files under
    * `data/` (stage() moves them there BEFORE the commit references them),
    * unclaimed `.tmp` commit files under `_txlog`, and `_staging_*` dirs —
    * is bounded by the write's wall-clock, not by retention policy, so a
    * vacuum run with ~0 retention concurrent with a live writer could
    * otherwise delete staged-but-not-yet-committed files that the imminent
    * commit then references, corrupting committed state. The floor below
    * enforces a conservative minimum for ALL those passes; only tombstoned
    * (logged-removed) files honor the caller's retention verbatim. Returns
    * the deleted file count. */
  def vacuum(table: Path, retentionMs: Long): Int = {
    // minimum retention for IN-FLIGHT artifact reclamation (unreferenced
    // data/ files, tmp commits, staging dirs): tombstoned files honor the
    // caller's retention verbatim (the log proves they were committed then
    // removed), but an unreferenced file may belong to a stage→commit window
    // still in flight — its age is bounded by write time, not policy — so
    // keep a 15-minute floor
    val inflightCutoffMs = math.max(retentionMs, 15L * 60 * 1000)
    val (r, _) = replayFull(table)
    val now = System.currentTimeMillis()
    val cutoff = now - retentionMs
    val inflightCutoff = now - inflightCutoffMs
    var deleted = 0
    for ((path, ts) <- r.tombstones if ts <= cutoff) {
      val p = table.resolve(path)
      if (Files.deleteIfExists(p)) deleted += 1
    }
    // orphans: files in data/ referenced by NO log action (a crashed or
    // race-losing writer's staging leftovers — OR a live writer's freshly
    // staged files whose commit has not landed yet: stage() moves parquet
    // into data/ before commit references it, with mtimes preserved from
    // write time, so this pass MUST use the in-flight floor, not the raw
    // retention). The one place vacuum lists the data directory; Delta's
    // VACUUM does the same.
    val referenced = r.files.keySet ++ r.tombstones.keySet
    if (Files.isDirectory(dataDir(table))) {
      val ls = Files.list(dataDir(table))
      try ls.iterator().asScala.foreach { p =>
        val rel = table.relativize(p).toString
        if (!referenced.contains(rel) &&
            Files.getLastModifiedTime(p).toMillis <= inflightCutoff &&
            Files.deleteIfExists(p)) deleted += 1
      } finally ls.close()
    }
    // crash leftovers the commit/stage protocols can strand (a kill between
    // staging and claim skips every `finally`): serialized-but-unclaimed
    // commit tmps in _txlog, and abandoned _staging_* spill dirs under the
    // table root. Both are invisible to readers (listVersions filters
    // *.tmp; readers never list data dirs) — reclaim past the same floor.
    val lsLog = Files.list(logDir(table))
    try lsLog.iterator().asScala.foreach { p =>
      if (p.getFileName.toString.endsWith(".tmp") &&
          Files.getLastModifiedTime(p).toMillis <= inflightCutoff &&
          Files.deleteIfExists(p)) deleted += 1
    } finally lsLog.close()
    val lsRoot = Files.list(table)
    try lsRoot.iterator().asScala.foreach { p =>
      if (p.getFileName.toString.startsWith("_staging_") && Files.isDirectory(p) &&
          Files.getLastModifiedTime(p).toMillis <= inflightCutoff) {
        graft.runtime.TempDirs.deleteTree(p); deleted += 1
      }
    } finally lsRoot.close()
    deleted
  }

  /** Compaction (Delta's OPTIMIZE): rewrite the live file set into
    * `targetFiles` coalesced files per partition-value group and commit
    * remove-all + add-few atomically. Append-heavy tables accumulate one
    * small file per commit; at 200 commits the ScaleProbe measured snapshot
    * RESOLUTION still flat (checkpointed) but the parquet READ dominated by
    * per-file open cost — exactly the lifecycle gap OPTIMIZE exists for.
    * Readers holding the pre-compaction snapshot keep working (the old
    * files are tombstones until vacuum); the table's rows are unchanged. */
  def compact(spark: SparkSession, table: Path, targetFiles: Int = 1): Long = {
    val snap = snapshot(table)
    val df = readSubset(spark, table, snap.files, snap.partitionCols)
      .coalesce(math.max(1, targetFiles))
    retryingCommit(table) { cur =>
      val now = System.currentTimeMillis()
      val adds = stage(table, df, cur.partitionCols)
      metaJson(cur.partitionCols) +:
        (cur.files.map(f => removeJson(f.path, now)) ++ adds.map(addJson))
    }
  }

  /** Commit history (version, action counts) — observability parity with
    * `DESCRIBE HISTORY`. */
  def history(table: Path): Seq[(Long, Int, Int)] = {
    val (commits, _) = listVersions(table)
    commits.map { v =>
      val lines = Files.readAllLines(commitFile(table, v), StandardCharsets.UTF_8).asScala
      (v, lines.count(_.startsWith("""{"add"""")), lines.count(_.startsWith("""{"remove"""")))
    }
  }
}
