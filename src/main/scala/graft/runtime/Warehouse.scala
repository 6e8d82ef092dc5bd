package graft.runtime

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Managed-table store: the engine's stand-in for the reference's Hive
  * metastore + S3 warehouse (reference: CTAS through
  * macros/spark_adapter_patch/create_table.sql:23-43).
  *
  * Tables are parquet directories under `root`; views are named lazy plans.
  * A `_schema.json` sidecar pins each table's canonical column set so
  * `on_schema_change` policies (sync/append/ignore) work over immutable
  * parquet files: reads merge file schemas, then project to the canonical
  * schema (null-filling dropped/added columns).
  *
  * Scale note: all writes `repartition` on the partition columns first —
  * the automatic equivalent of the reference's 28 hand-written
  * `DISTRIBUTE BY` sites (SURVEY.md §4) — so each output partition is
  * written by few tasks and small-file explosion is avoided.
  */
final class Warehouse(val spark: SparkSession, val root: String,
                      namer: String => String = identity,
                      commitProtocol: TableCommitProtocol =
                        TableCommitProtocol.LocalAtomicRename,
                      val logFormatEnabled: Boolean = false) {

  // Every model execution reads/writes through a Warehouse, so this is the
  // runtime chokepoint for the reference's non-ANSI dialect (see [[Dialect]]).
  Dialect.pin(spark)

  /** A registered view: the lazy plan's BUILDER plus the plan as last
    * derived. A built DataFrame captures its upstream tables' file listings
    * (InMemoryFileIndex snapshots at plan-build time), so after ANY table
    * mutation the cached plan may chase deleted part files — re-derive from
    * the builder instead (true lazy-view semantics). Builder-less entries
    * (tests registering a literal frame) keep the frame as-is. */
  private final class ViewEntry(val build: Option[() => DataFrame],
                                @volatile var df: DataFrame,
                                @volatile var epoch: Long)
  private val views = scala.collection.concurrent.TrieMap.empty[String, ViewEntry]
  // AtomicLong, not a @volatile var: DagRunner materializes models in
  // parallel, and two concurrent writes collapsing into one increment would
  // let a racing read observe an already-matching epoch and serve a view
  // plan still pinning the pre-mutation file listing.
  private val mutationEpochCtr = new java.util.concurrent.atomic.AtomicLong(0L)
  private def mutationEpoch: Long = mutationEpochCtr.get()
  private def noteMutation(): Unit = mutationEpochCtr.incrementAndGet()

  /** `namer` is the generate_schema_name / generate_alias_name hook
    * (reference: macros/get_custom_schema.sql:1-22,
    * macros/generate_alias_name.sql:1-28 — dev runs prefix relations). */
  def tablePath(name: String): String = s"$root/${namer(name)}"

  /** Directory currently holding the table's data: the logical path under a
    * rename protocol, the pointed-to version directory under [[TableCommitProtocol.PointerSwap]].
    * Every physical read and in-place write resolves through here; only
    * [[replaceTable]]'s publish targets the logical path. */
  private def dataDir(name: String): String =
    commitProtocol.resolveData(Paths.get(tablePath(name))).toString
  private def schemaPath(name: String): Path = Paths.get(dataDir(name), "_schema.json")

  def tableExists(name: String): Boolean =
    views.contains(name) || Files.exists(Paths.get(dataDir(name)))

  def registerView(name: String, df: DataFrame): Unit =
    views.put(name, new ViewEntry(None, df, mutationEpoch))

  /** Register a view with its builder so the plan re-derives after table
    * mutations instead of serving a stale captured file listing. */
  def registerView(name: String, build: () => DataFrame): Unit =
    views.put(name, new ViewEntry(Some(build), build(), mutationEpoch))

  /** Remove a table or view entirely (e.g. corpus-execute fixpoint passes
    * rebuild every node from scratch so schema growth never has to merge
    * into last pass's files). */
  def drop(name: String): Unit = {
    views.remove(name)
    // a dropped name must also forget its log routing — a later plain
    // createTable for the same name (e.g. a materialization change across
    // corpus fixpoint passes) would otherwise silently write a
    // transaction-log table instead of parquet
    logRouted.remove(name)
    noteMutation()
    val p = Paths.get(tablePath(name))
    if (Files.exists(p)) TempDirs.deleteTree(p)
    // Spark's shared FileStatusCache has no TTL: a reader planning against
    // this path after a drop+rewrite would otherwise chase deleted part
    // files (FAILED_READ_FILE on corpus mid-pass upstream refreshes)
    try spark.catalog.refreshByPath(p.toString)
    catch { case scala.util.control.NonFatal(_) => }
  }

  /** Read a managed table or view. Tables with a `_schema.json` sidecar are
    * read with that canonical schema applied directly — no per-file footer
    * sweep (`mergeSchema`), which at 100TB is a full listing+footer read per
    * query for information the engine already persisted. The parquet reader
    * null-fills columns absent from older files (append_new_columns) and
    * ignores file columns outside the canonical set (ignore policy), which is
    * exactly what the old merge-then-project path computed. Only sidecar-less
    * directories (externally created) fall back to mergeSchema. */
  def read(name: String): DataFrame = views.get(name) match {
    case Some(v) =>
      if (v.epoch != mutationEpoch) v.build.foreach { b =>
        v.df = b(); v.epoch = mutationEpoch
      }
      v.df
    case None if isLogBacked(name) => readLogCanonical(name)
    case None =>
      canonicalSchema(name) match {
        case Some(schema) =>
          // partition columns surface last regardless of the given schema;
          // project back to canonical order (no extra I/O, plan-only)
          spark.read.schema(schema).parquet(dataDir(name))
            .select(schema.fieldNames.toSeq.map(col): _*)
        case None => spark.read.option("mergeSchema", "true").parquet(dataDir(name))
      }
  }

  def canonicalSchema(name: String): Option[StructType] = {
    val p = schemaPath(name)
    if (Files.exists(p)) Some(DataType.fromJson(Files.readString(p)).asInstanceOf[StructType])
    else None
  }

  private def writeSchema(name: String, schema: StructType): Unit = {
    Files.createDirectories(Paths.get(dataDir(name)))
    Files.writeString(schemaPath(name), schema.json)
  }

  /** r18 (guide §6 / §2, Profile finding): `repartition(cols)` without an
    * explicit count is AQE-coalescible, and for the aggregate-sized outputs
    * most models write, AQE merges the whole exchange into ONE task — which
    * then creates every partition directory's file SERIALLY (q62's
    * fact_cells: one 2.5 s task opening ~160 parquet files; q30/q47/q66/q81
    * same shape). An explicit count pins write parallelism: each partition
    * VALUE still hashes to exactly one task (files per directory unchanged,
    * no small-file regression), but distinct values spread across tasks so
    * the per-file open/footer latency is paid in parallel. The count is the
    * session's shuffle-partition conf — the cluster-tuned knob, not a local
    * constant (the bench sets it to the core count; a 100 TB run sets it to
    * the cluster's reducer count). */
  private def writeParallelism: Int = spark.sessionState.conf.numShufflePartitions

  private def distributeForWrite(df: DataFrame, partitionBy: Seq[String],
                                 hashSpread: Option[(String, Int)]): DataFrame =
    (partitionBy, hashSpread) match {
      case (Nil, _) => df
      case (cols, None) => df.repartition(writeParallelism, cols.map(col): _*)
      case (cols, Some((spreadCol, n))) =>
        df.repartition(writeParallelism,
          (cols.map(col) :+ (abs(hash(col(spreadCol))) % n)): _*)
    }

  /** Full-rebuild CTAS (reference: materialized='table').
    *
    * @param orderBy global ORDER BY sink (reference: ~690 cosmetic trailing
    *   `ORDER BY` sites): range-partition + per-partition sort, so part files
    *   hold disjoint ordered ranges in file-name order. */
  /** Tables routed to the transaction-log format by the caller that knows
    * the model's file_format but writes through format-agnostic helpers —
    * the SCD2 snapshot path (all 54 reference snapshots are
    * `file_format='delta'`). createTable/replaceTable on a routed name
    * delegate to the log equivalents; reads auto-route via isLogBacked. */
  private val logRouted = scala.collection.concurrent.TrieMap.empty[String, Unit]
  def routeAsLog(name: String): Unit = logRouted.put(name, ())

  def createTable(name: String, df: DataFrame, partitionBy: Seq[String] = Nil,
                  hashSpread: Option[(String, Int)] = None,
                  orderBy: Seq[String] = Nil): Unit = {
    if (logRouted.contains(name)) {
      createTableLog(name, df, partitionBy, hashSpread, orderBy); return
    }
    noteMutation()
    // persisted docs survive a full rebuild (reference persists comments
    // across runs); SaveMode.Overwrite wipes the directory incl. the sidecar.
    // Restore happens in a finally (a failed write must not lose the docs),
    // filtered to columns that still exist in the new schema.
    val docsPath = Paths.get(dataDir(name), "_docs.json")
    val savedDocs = docs(name)
    try {
      val out =
        if (orderBy.nonEmpty) df.orderBy(orderBy.map(col): _*)
        else distributeForWrite(df, partitionBy, hashSpread)
      val w = out.write.mode(SaveMode.Overwrite)
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(dataDir(name))
      writeSchema(name, df.schema)
    } finally {
      val survivors = savedDocs.filter { case (k, _) =>
        k == "__table__" || df.schema.fieldNames.contains(k) }
      if (survivors.nonEmpty) {
        Files.createDirectories(docsPath.getParent)
        Files.writeString(docsPath, serializeDocs(survivors))
      }
    }
  }

  /** Dynamic-partition insert-overwrite: only partitions present in `df` are
    * replaced (reference: incremental_strategy='insert_overwrite' + the
    * spark.sql.sources.partitionOverwriteMode=dynamic conf). */
  def insertOverwritePartitions(name: String, df: DataFrame, partitionBy: Seq[String],
                                onSchemaChange: OnSchemaChange,
                                hashSpread: Option[(String, Int)] = None): Unit = {
    noteMutation()
    if (partitionBy.isEmpty) {
      // dbt-spark semantics: insert_overwrite without partition_by replaces
      // the whole table (reference: dsa_orders.sql declares exactly this)
      createTable(name, alignSchema(name, df, onSchemaChange))
      return
    }
    val aligned = alignSchema(name, df, onSchemaChange)
    val out = distributeForWrite(aligned, partitionBy, hashSpread)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try out.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).parquet(dataDir(name))
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Key-based upsert — the parquet-native equivalent of the Delta `MERGE
    * INTO … WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
    * that backs the reference's 197 delta-format models (reference:
    * macros/spark_adapter_patch/create_table.sql:29-34 `create or replace
    * table … using delta`; dbt-spark's incremental_strategy='merge' emits the
    * MERGE above for delta relations).
    *
    * Rewrite granularity is the partition directory — one level coarser than
    * Delta's file-level rewrite, the best parquet-over-FS can do:
    *  1. probe which partitions are affected: partitions carrying incoming
    *     rows, plus partitions holding an existing row whose key is being
    *     replaced (covers a key MOVING partitions — Delta's matched-update
    *     also relocates the row);
    *  2. scan ONLY those partition directories (the `isin`-style literal
    *     predicate below prunes at listing time), anti-join out replaced keys;
    *  3. dynamic-partition-overwrite survivors ∪ increment, and drop any
    *     affected directory that ends up with zero rows (a fully-replaced
    *     partition absent from the output would otherwise be left stale —
    *     dynamic overwrite only touches partitions present in the write).
    *
    * Scale shape: the key probe is a key-only semi-join (broadcast when the
    * increment is small, AQE otherwise); the collected affected-partition list
    * is bounded by partition count, the same driver-side bookkeeping Spark's
    * own dynamic partition overwrite does. Unpartitioned tables fall back to
    * a full rewrite — documented cost, same as Delta MERGE with no pruning
    * predicate matching every file.
    *
    * Contract (same as dbt merge): the increment must be unique on
    * `uniqueKey`; reference models guarantee this with their ROW_NUMBER dedup
    * CTEs (models/spark/gold/gold_orders.sql:20-85). */
  def mergeUpsert(name: String, df: DataFrame, uniqueKey: Seq[String],
                  partitionBy: Seq[String],
                  onSchemaChange: OnSchemaChange = OnSchemaChange.Ignore,
                  incrementPartitionsOnly: Boolean = false): Unit = {
    noteMutation()
    // dbt-spark merge without unique_key is insert-only (WHEN NOT MATCHED
    // INSERT): nothing can match, so it degrades to append (reference
    // archetype: models/spark/junk2/dbt_test.sql — bare incremental config)
    if (uniqueKey.isEmpty) {
      if (tableExists(name)) append(name, alignSchema(name, df, onSchemaChange), partitionBy)
      else createTable(name, df, partitionBy)
      return
    }
    if (!tableExists(name)) { createTable(name, df, partitionBy); return }
    val aligned = alignSchema(name, df, onSchemaChange)
    val keys = aligned.select(uniqueKey.map(col): _*).distinct()
    if (partitionBy.isEmpty) {
      // read(name) is constructed only on the paths that scan the whole
      // table: building the DataFrame lists every file eagerly, which the
      // 100× probe measured as the dominant merge term at 7,700 partitions
      val survivors = read(name).join(keys, uniqueKey, "left_anti")
      replaceTable(name, aligned.unionByName(survivors.select(aligned.columns.map(col).toSeq: _*)))
      return
    }
    val (out, affected) = mergeSlice(name, aligned, uniqueKey, partitionBy,
      incrementPartitionsOnly)
    // partitions still present after the merge; the rest of `affected` must
    // have their directories dropped explicitly
    // stage the merged slice before overwriting: Spark (correctly) refuses a
    // plan that overwrites the same directory it reads, and `out` reads the
    // affected partitions of the target. Double-writes only the affected
    // partitions, not the table.
    // not dot-prefixed: Spark's file listing treats dot/underscore paths as
    // hidden, which risks the staged read silently resolving to zero files
    val staging = s"$root/merge-staging-tmp/${namer(name)}"
    out.write.mode(SaveMode.Overwrite).parquet(staging)
    val outParts =
      try {
        val staged = spark.read.schema(out.schema).parquet(staging)
        insertOverwritePartitions(name, staged, partitionBy, OnSchemaChange.Ignore)
        staged.select(partitionBy.map(col): _*).distinct().collect()
          .map(r => partitionBy.indices.map(r.get)).toSet
      } finally {
        deleteRecursively(Paths.get(staging))
        val parent = Paths.get(staging).getParent
        if (Files.exists(parent)) {
          val listing = Files.list(parent)
          val empty = try !listing.findAny().isPresent finally listing.close()
          if (empty) Files.delete(parent)
        }
      }
    affected.filterNot(r => outParts.contains(partitionBy.indices.map(r.get)))
      .foreach { r =>
        val p = Paths.get(dataDir(name), partitionDir(partitionBy, r))
        if (Files.exists(p)) deleteRecursively(p)
      }
  }

  /** `col=value/...` relative path of one partition, hive-escaped.
    *
    * Value rendering MUST match what Spark's dynamic-partition writer put on
    * disk: `Cast(col, StringType, sessionLocalTimeZone)` fed through
    * `ExternalCatalogUtils.getPartitionPathString` (see Spark's
    * `FileFormatDataWriter.partitionPathExpression`). `Row.get(i).toString`
    * diverges for typed columns — `java.sql.Timestamp.toString` appends
    * ".0" for whole seconds, so a timestamp-partitioned merge would compute
    * directory names that don't exist and silently drop survivors. */
  private def partitionDir(partitionBy: Seq[String],
                           r: org.apache.spark.sql.Row): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    import org.apache.spark.sql.types.StringType
    partitionBy.zipWithIndex.map { case (c, i) =>
      val v = r.get(i)
      val str =
        if (v == null) null
        else Option(Cast(Literal(v), StringType,
          Option(spark.sessionState.conf.sessionLocalTimeZone)).eval(null))
          .map(_.toString).orNull
      ExternalCatalogUtils.getPartitionPathString(c, str)
    }.mkString("/")
  }

  /** Read ONLY the given partition directories of a table. At a large
    * partition count this skips the full-table file listing that a plain
    * `read(name).filter(partition predicate)` pays before pruning — the
    * 100× merge probe measured that listing, not data, as the dominant
    * term (SCALE.md). Missing directories (brand-new partitions) are
    * skipped; with none on disk the result is an empty slice. */
  private def readPartitionDirs(name: String, partitionBy: Seq[String],
                                parts: Seq[org.apache.spark.sql.Row]): DataFrame = {
    val base = dataDir(name)
    val dirs = parts.map(r => s"$base/${partitionDir(partitionBy, r)}")
      .filter(p => Files.exists(Paths.get(p)))
    val schema = canonicalSchema(name)
    (dirs, schema) match {
      case (Nil, Some(s)) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case (Nil, None) => read(name).limit(0)
      case (ds, Some(s)) =>
        spark.read.option("basePath", base).schema(s).parquet(ds: _*)
          .select(s.fieldNames.toSeq.map(col): _*)
      case (ds, None) => spark.read.option("basePath", base).parquet(ds: _*)
    }
  }

  /** The merged slice — increment ∪ surviving rows of affected partitions —
    * plus the affected partition-value rows. `df` must already match the
    * table's canonical column set.
    *
    * The matched-key probe scans the target's key columns across ALL
    * partitions (column-pruned: a few % of table bytes at 100 TB — the same
    * cost a Delta MERGE without a pruning predicate pays to find matched
    * files). When the caller knows a key can never change partition (the
    * usual case: the partition column derives from immutable attributes),
    * `incrementPartitionsOnly` skips the probe entirely — dbt's
    * incremental_predicates contract — and merge cost depends only on the
    * increment's partitions, independent of table size. Trade-off under
    * that flag: a matched key living in a non-increment partition is NOT
    * updated (it is out of the pruned scan), same as dbt's.
    *
    * Exposed for plan assertions: the survivors side must scan only the
    * affected partition directories (read directly by directory, so even the
    * file LISTING is O(affected)), which ScaleSpec pins via the
    * FileSourceScan's selected partition count. */
  private[graft] def mergeSlice(name: String, df: DataFrame, uniqueKey: Seq[String],
                                partitionBy: Seq[String], incrementPartitionsOnly: Boolean)
      : (DataFrame, Array[org.apache.spark.sql.Row]) = {
    // Partition values are compared driver-side via Row equality — both in
    // (incParts ++ matched).distinct here and in the caller's
    // outParts.contains cleanup — and Row equality has no Spark set-op type
    // coercion: an increment whose partition column drifted (int vs long
    // under append_new_columns/sync, which alignSchema does not cast) would
    // make equal values unequal, duplicating survivor reads and
    // mis-classifying a just-written partition as dropped. Normalize the
    // increment's partition columns to the canonical types once, up front:
    // `matched` (from read(), canonical-typed), the union fed to staging,
    // and the cleanup comparison then all agree.
    val canonTypes: Map[String, DataType] = canonicalSchema(name)
      .map(_.fields.map(f => f.name -> f.dataType).toMap).getOrElse(Map.empty)
    val dfN = df.select(df.columns.toSeq.map { c =>
      if (partitionBy.contains(c))
        canonTypes.get(c).map(t => col(c).cast(t).as(c)).getOrElse(col(c))
      else col(c)
    }: _*)
    val keys = dfN.select(uniqueKey.map(col): _*).distinct()
    val incParts = dfN.select(partitionBy.map(col): _*).distinct()
    val affected =
      if (incrementPartitionsOnly) incParts.collect()
      else {
        // the probe is the only whole-table access (key columns only);
        // read(name) is constructed here, not at the top, so pruned mode
        // never pays the full file listing
        val matched = read(name).join(keys, uniqueKey, "left_semi")
          .select(partitionBy.map(col): _*).distinct().collect()
        // matched partitions were just read off disk, so their directories
        // MUST resolve; a miss means partitionDir's encoding diverged from
        // the writer's and survivors would silently vanish — fail loudly
        val missing = matched.map(r => partitionDir(partitionBy, r))
          .filterNot(d => Files.exists(Paths.get(dataDir(name), d)))
        if (missing.nonEmpty) throw new IllegalStateException(
          s"mergeUpsert($name): matched partition directories not found under " +
            s"${dataDir(name)}: ${missing.mkString(", ")} — partition-path " +
            "encoding mismatch would silently drop surviving rows")
        (incParts.collect() ++ matched).distinct
      }
    // survivors come from a directory-scoped read of ONLY the affected
    // partitions: the affected set is already collected, so listing cost is
    // O(affected dirs), not O(table dirs) — at 7,700 partitions the full
    // listing was the dominant merge term (100× probe, SCALE.md)
    val survivors = readPartitionDirs(name, partitionBy, affected.toSeq)
      .join(keys, uniqueKey, "left_anti")
    (dfN.unionByName(survivors.select(dfN.columns.map(col).toSeq: _*)), affected)
  }

  /** Row append (reference: incremental_strategy='append'). */
  def append(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    noteMutation()
    val aligned = alignSchema(name, df, OnSchemaChange.Ignore)
    val w = aligned.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(dataDir(name))
  }

  /** Docs persistence (reference: persist_docs + alter_column_comment,
    * dbt_project.yml:43-45, macros/spark_adapter_patch/alter_column_comment.sql):
    * table + column comments stored in a sidecar and surfaced as field
    * metadata (`comment`) on read. */
  def setDocs(name: String, tableComment: String,
              columnComments: Map[String, String]): Unit =
    Files.writeString(Paths.get(dataDir(name), "_docs.json"),
      serializeDocs(Map("__table__" -> tableComment) ++ columnComments))

  private def serializeDocs(m: Map[String, String]): String =
    m.map { case (k, v) => quote(k) + ": " + quote(v) }.mkString("{", ",", "}")

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def docs(name: String): Map[String, String] = {
    val p = Paths.get(dataDir(name), "_docs.json")
    if (!Files.exists(p)) Map.empty
    else {
      val re = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      re.findAllMatchIn(Files.readString(p)).map(m =>
        m.group(1).replace("\\\"", "\"").replace("\\\\", "\\") ->
          m.group(2).replace("\\\"", "\"").replace("\\\\", "\\")).toMap
    }
  }

  /** Partition columns as laid out on disk: the `k=v` directory chain under
    * the data dir (one name per nesting level). Metadata-only — one
    * directory entry per level, never a file listing. */
  private def partitionColsOnDisk(name: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var dir = Paths.get(dataDir(name))
    var continue = true
    while (continue) {
      continue = false
      val s = Files.list(dir)
      val sub = try s.iterator().asScala
        .find(p => Files.isDirectory(p) && p.getFileName.toString.contains("="))
      finally s.close()
      sub.foreach { p =>
        out += p.getFileName.toString.takeWhile(_ != '=')
        dir = p; continue = true
      }
    }
    out.toSeq
  }

  /** Metastore-visible comments. The reference pushes `persist_docs` into
    * the Hive metastore as per-column `ALTER TABLE … CHANGE COLUMN … COMMENT`
    * statements plus a relation-level comment
    * (macros/spark_adapter_patch/alter_column_comment.sql:1-17); the sidecar
    * ([[setDocs]]) is this engine's durable store, and this method surfaces
    * it through Spark's OWN session catalog so `DESCRIBE [EXTENDED]` answers
    * with the comments:
    *  - if the name is already a catalog table (bucketed CTAS), issue the
    *    same CHANGE COLUMN / table-comment statements the reference does;
    *  - otherwise register an external parquet table over the data dir with
    *    the commented schema (+ PARTITIONED BY / RECOVER PARTITIONS, so
    *    `spark.table(name)` reads the same rows as [[read]]).
    * Views and log-backed tables are skipped — a bare-path catalog entry
    * over a TxLog dir would resurrect tombstoned files. */
  def persistDocsToCatalog(name: String): Unit = try {
    val d = docs(name)
    if (d.isEmpty || views.contains(name) || isLogBacked(name) ||
        !tableExists(name)) return
    def lit(s: String) = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val ident = "`" + name.replace("`", "") + "`"
    val schema = read(name).schema
    val tid = org.apache.spark.sql.catalyst.TableIdentifier(name)
    val meta = if (spark.sessionState.catalog.tableExists(tid))
      Some(spark.sessionState.catalog.getTableMetadata(tid)) else None
    // ALTER can only restate a column's EXISTING type (Spark rejects type
    // changes and unknown columns); when the on-disk schema has drifted from
    // the catalog entry, the entry is one of OUR external registrations —
    // drop and re-create it (re-recovering partitions, which ALTER never
    // does) instead of ALTERing into an exception. Bucketed CTAS tables keep
    // the ALTER path: saveAsTable syncs their catalog schema on rewrite, and
    // re-creating them as bare external entries would lose the bucket spec.
    val typesMatch = meta.exists(
      _.schema.map(f => (f.name, f.dataType)).toSet ==
        schema.map(f => (f.name, f.dataType)).toSet)
    val inCatalog = meta.exists(_.bucketSpec.isDefined) || typesMatch
    if (inCatalog) {
      // a bucketed entry whose on-disk types drifted from the catalog (a
      // type-widening rewrite raced the catalog sync): CHANGE COLUMN can
      // only restate the CATALOG's type, so per-column ALTERs are issued
      // only where catalog and disk agree — drifted columns keep their
      // sidecar comment but skip the catalog surface instead of throwing
      // into the cosmetic catch-all and dropping EVERY column's comment
      val catalogType = meta.map(_.schema.map(f => f.name -> f.dataType).toMap)
        .getOrElse(Map.empty)
      schema.fields.filter(f => d.get(f.name).exists(_.nonEmpty) &&
          catalogType.get(f.name).contains(f.dataType)).foreach { f =>
        spark.sql(s"ALTER TABLE $ident CHANGE COLUMN `${f.name}` `${f.name}` " +
          s"${f.dataType.sql} COMMENT ${lit(d(f.name))}")
      }
      d.get("__table__").filter(_.nonEmpty).foreach(c =>
        spark.sql(s"ALTER TABLE $ident SET TBLPROPERTIES ('comment' = ${lit(c)})"))
    } else {
      val partCols = partitionColsOnDisk(name)
      val colsDdl = schema.fields.map { f =>
        val cm = d.get(f.name).filter(_.nonEmpty)
          .map(c => s" COMMENT ${lit(c)}").getOrElse("")
        s"`${f.name}` ${f.dataType.sql}$cm"
      }.mkString(", ")
      val tblCm = d.get("__table__").filter(_.nonEmpty)
        .map(c => s" COMMENT ${lit(c)}").getOrElse("")
      val partDdl =
        if (partCols.isEmpty) ""
        else partCols.map(c => s"`$c`").mkString(" PARTITIONED BY (", ", ", ")")
      spark.sql(s"DROP TABLE IF EXISTS $ident")
      spark.sql(s"CREATE TABLE $ident ($colsDdl) USING parquet$tblCm$partDdl " +
        s"LOCATION ${lit(dataDir(name))}")
      if (partCols.nonEmpty) spark.sql(s"ALTER TABLE $ident RECOVER PARTITIONS")
    }
  } catch {
    // docs surfacing is cosmetic — a catalog hiccup (concurrent DDL, a type
    // ALTER Spark rejects) must never fail the model run that produced the
    // data. The sidecar remains the durable store either way.
    case scala.util.control.NonFatal(e) =>
      System.err.println(s"[warehouse] persistDocsToCatalog($name) skipped: ${e.getMessage}")
  }

  /** Bucketed CTAS via the session catalog: both sides of a repeated join
    * bucketed on the join key scan-align and skip the shuffle entirely — the
    * engine's answer to the reference's hand-bucketed theta joins and the
    * standard co-location tool at 100TB (SURVEY.md §4). Bucketing requires a
    * catalog table; the data still lives under the warehouse root. */
  def createBucketedTable(name: String, df: DataFrame, bucketCols: Seq[String],
                          numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    noteMutation()
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", dataDir(name))
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    spark.sql(s"DROP TABLE IF EXISTS $name")
    ws.saveAsTable(name)
  }

  /** Read a bucketed catalog table (bucketing metadata only survives through
    * the catalog, not a bare parquet read). */
  def readBucketed(name: String): DataFrame = spark.table(name)

  /** Atomic-ish full replace used by SCD2 rewrites: stage to a tmp dir, then
    * swap. (Prod-grade would use Delta/Iceberg commit protocols; parquet +
    * rename is the local-FS equivalent — SURVEY.md §7 "SCD2 without Delta".) */
  def replaceTable(name: String, df: DataFrame): Unit = {
    noteMutation()
    if (logRouted.contains(name)) {
      // TxLog.overwrite IS an atomic full replace (tombstone-all + add-new
      // in one commit) — the log format's native equivalent of the staged
      // rename below, with history/time-travel kept
      createTableLog(name, df); return
    }
    val tmp = s"$root/.staging_$name"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    // the schema sidecar ships INSIDE the staged directory, so the commit
    // publishes a complete table (no post-flip sidecar write a concurrent
    // reader could miss); underscore-prefixed files are invisible to
    // Spark's listing, so the staged dir stays a valid parquet directory
    Files.writeString(Paths.get(tmp, "_schema.json"), df.schema.json)
    // the publish step is the pluggable commit point (see
    // [[TableCommitProtocol]] — a Delta/Iceberg log-append drops in here)
    commitProtocol.commitReplace(Paths.get(tmp), Paths.get(tablePath(name)))
  }

  // ---- transaction-log table format (reference: file_format='delta') ----
  //
  // The reference declares 197 models `file_format='delta'`; when
  // `logFormatEnabled`, DagRunner routes those materializations through the
  // [[graft.plans.TxLog]] log instead of plain parquet directories. Same
  // model contract (on_schema_change, dynamic-partition overwrite, merge
  // semantics), different storage guarantees: atomic multi-partition
  // commits, snapshot isolation via tombstones, time travel, and — for
  // merge — FILE-level rewrite granularity (the actual Delta MERGE shape),
  // finer than the parquet path's partition-directory rewrite. Snapshots
  // (SCD2) stay on the parquet path: their full-table rewrite goes through
  // [[replaceTable]]'s commit protocol, which is already atomic.

  def isLogBacked(name: String): Boolean =
    graft.plans.TxLog.exists(Paths.get(tablePath(name)))

  private def logPath(name: String): Path = Paths.get(tablePath(name))

  /** Log-backed read with the canonical-schema projection (partition columns
    * come back as strings from the manifest; the cast restores their
    * canonical types, mirroring what Spark's own partition-dir inference
    * does for the parquet path). */
  private def readLogCanonical(
      name: String,
      partitionFilter: Map[String, String] => Boolean = _ => true): DataFrame = {
    // a 0-row materialization legitimately commits ZERO files (a dynamic
    // overwrite of an empty frame writes no partitions), and a pruning
    // filter can empty any snapshot — mirror the parquet path and return
    // an empty frame with the sidecar schema instead of failing the read
    // (the corpus EXECUTE phase reads 0-row tables constantly)
    val p = logPath(name)
    val snap = graft.plans.TxLog.snapshot(p)
    val live = snap.files.filter(f => partitionFilter(f.partitionValues))
    val base =
      if (live.nonEmpty) graft.plans.TxLog.readSubset(spark, p, live, snap.partitionCols)
      else canonicalSchema(name) match {
        case Some(schema) => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        case None =>
          graft.plans.TxLog.read(spark, p, partitionFilter = partitionFilter)
      }
    canonicalCast(name, base)
  }

  def createTableLog(name: String, df: DataFrame, partitionBy: Seq[String] = Nil,
                     hashSpread: Option[(String, Int)] = None,
                     orderBy: Seq[String] = Nil): Unit = {
    noteMutation()
    val out =
      if (orderBy.nonEmpty) df.orderBy(orderBy.map(col): _*)
      else distributeForWrite(df, partitionBy, hashSpread)
    graft.plans.TxLog.overwrite(logPath(name), out, partitionBy)
    writeSchema(name, df.schema)
  }

  def insertOverwritePartitionsLog(name: String, df: DataFrame, partitionBy: Seq[String],
                                   onSchemaChange: OnSchemaChange,
                                   hashSpread: Option[(String, Int)] = None): Unit = {
    noteMutation()
    if (partitionBy.isEmpty) { createTableLog(name, alignSchema(name, df, onSchemaChange)); return }
    val aligned = alignSchema(name, df, onSchemaChange)
    graft.plans.TxLog.overwritePartitions(logPath(name),
      distributeForWrite(aligned, partitionBy, hashSpread), partitionBy)
  }

  def appendLog(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    noteMutation()
    graft.plans.TxLog.append(logPath(name),
      alignSchema(name, df, OnSchemaChange.Ignore), partitionBy)
  }

  /** Delta-shaped merge: probe which FILES hold matched keys (key columns
    * only — column-pruned), tombstone exactly those, re-add their surviving
    * rows together with the increment, one atomic commit. Rewrite
    * granularity is the file, not the partition directory — candidate files
    * are still manifest-pruned to the increment's partitions under
    * `incrementPartitionsOnly` (dbt incremental_predicates analogue). On a
    * concurrency conflict the probe re-runs against the fresh snapshot. */
  def mergeUpsertLog(name: String, df: DataFrame, uniqueKey: Seq[String],
                     partitionBy: Seq[String],
                     onSchemaChange: OnSchemaChange = OnSchemaChange.Ignore,
                     incrementPartitionsOnly: Boolean = false): Unit = {
    noteMutation()
    import graft.plans.TxLog
    if (uniqueKey.isEmpty) {
      if (tableExists(name)) appendLog(name, df, partitionBy)
      else createTableLog(name, df, partitionBy)
      return
    }
    if (!tableExists(name)) { createTableLog(name, df, partitionBy); return }
    val aligned = alignSchema(name, df, onSchemaChange)
    val keys = aligned.select(uniqueKey.map(col): _*).distinct()
    val incPvs: Set[Map[String, String]] =
      if (partitionBy.isEmpty) Set.empty
      else aligned.select(partitionBy.map(col): _*).distinct().collect().map { r =>
        partitionDir(partitionBy, r).split("/").toSeq.map { seg =>
          val Array(k, v) = seg.split("=", 2); k -> v
        }.toMap
      }.toSet
    var attempts = 0
    while (attempts < 5) {
      attempts += 1
      val p = logPath(name)
      val snap = TxLog.snapshot(p)
      val candidates =
        if (incrementPartitionsOnly && partitionBy.nonEmpty)
          snap.files.filter(f => incPvs.contains(f.partitionValues))
        else snap.files
      val matchedFiles: Set[String] =
        if (candidates.isEmpty) Set.empty
        else TxLog.readSubset(spark, p, candidates, snap.partitionCols)
          .withColumn("__file", TxLog.scannedFileName)
          .join(keys, uniqueKey, "left_semi")
          .select(col("__file")).distinct().collect().map(_.getString(0)).toSet
      val removes = candidates.filter(f => matchedFiles.contains(f.path.split('/').last))
      val survivors =
        if (removes.isEmpty) None
        else Some(canonicalCast(name,
          TxLog.readSubset(spark, p, removes, snap.partitionCols))
          .join(keys, uniqueKey, "left_anti"))
      val out = survivors match {
        case Some(s) => aligned.unionByName(s.select(aligned.columns.toSeq.map(col): _*))
        case None => aligned
      }
      try { TxLog.replaceFiles(p, snap.version, removes.map(_.path), out, partitionBy); return }
      catch { case _: TxLog.TxConflict if attempts < 5 => () }
    }
  }

  private def canonicalCast(name: String, df: DataFrame): DataFrame =
    canonicalSchema(name) match {
      case Some(s) =>
        val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
        df.select(s.fields.toSeq.map { f =>
          actual.get(f.name) match {
            // nullability-normalized identity: casting e.g. array<string>
            // with containsNull=true to a canonical containsNull=false is
            // both unnecessary and rejected by the analyzer
            case Some(t) if t.catalogString == f.dataType.catalogString => col(f.name)
            case Some(_) => col(f.name).cast(f.dataType).as(f.name)
            case None => lit(null).cast(f.dataType).as(f.name)
          }
        }: _*)
      case None => df
    }

  /** Apply the on_schema_change policy against the canonical schema, update
    * the sidecar, and return the frame to write. */
  private def alignSchema(name: String, df: DataFrame, policy: OnSchemaChange): DataFrame =
    canonicalSchema(name) match {
      case None =>
        writeSchema(name, df.schema); df
      case Some(existing) =>
        val existingNames = existing.fieldNames.toSeq
        val incomingNames = df.columns.toSeq
        policy match {
          case OnSchemaChange.Ignore =>
            // project increment onto the existing schema; drop new columns
            df.select(existing.fields.toSeq.map { f =>
              if (incomingNames.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
              else lit(null).cast(f.dataType).as(f.name)
            }: _*)
          case OnSchemaChange.AppendNewColumns =>
            val newCols = df.schema.fields.filterNot(f => existingNames.contains(f.name))
            writeSchema(name, StructType(existing.fields ++ newCols))
            df
          case OnSchemaChange.SyncAllColumns =>
            writeSchema(name, df.schema)
            df
        }
    }

  private def deleteRecursively(p: Path): Unit = TempDirs.deleteTree(p)
}
