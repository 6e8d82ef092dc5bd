package graft.runtime

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Corpus-wide templater proof: run EVERY model file of a dbt-style project
  * tree through the full template pipeline and Spark's SQL parser, without
  * executing anything. For each model this checks, in order:
  *
  *   1. `config` — its `{{ config(...) }}` block parses into a supported
  *      [[Materialization]] (view / table / incremental × overwrite/append/
  *      merge) with tags and meta;
  *   2. `render` — the body renders to final SQL through macro expansion,
  *      Jinja control flow, and var/ref/source/this substitution — for
  *      incremental models BOTH the first-run and the incremental rendering;
  *   3. `parse` — every rendered text parses as Spark SQL
  *      (`sessionState.sqlParser.parsePlan`), i.e. the dialect really is
  *      Spark SQL end-to-end, not just on hand-picked bodies;
  *   4. `dag` — the corpus-wide `ref()` graph wires into an acyclic DAG with
  *      a complete topological order (what DagRunner would schedule).
  *
  * This is the scalable form of the per-file end-to-end specs: execution
  * needs per-model source fixtures, but expansion + parse + DAG wiring are
  * provable over the whole corpus (reference: 423 .sql files under the
  * models tree, macro definitions under the macros tree).
  */
object CorpusSweep {

  final case class ModelResult(name: String, path: String, phase: String,
                               error: Option[String], refs: Seq[String],
                               incremental: Boolean, tags: Set[String] = Set.empty,
                               sources: Seq[(String, String)] = Nil)

  /** Directory-scoped tag inheritance, the dbt_project.yml `+tags` contract
    * (reference: dbt_project.yml models: section — subtrees b2b_mart / onfy /
    * platform / pulse / gold each inherit a tag). Keyed by path segment. */
  val defaultDirTags: Map[String, String] = Map(
    "b2b_mart" -> "b2b_mart", "onfy" -> "onfy", "platform" -> "platform",
    "pulse" -> "pulse", "gold" -> "gold")

  def dirTags(path: Path, rules: Map[String, String] = defaultDirTags): Set[String] = {
    val segs = (0 until path.getNameCount).map(path.getName(_).toString).toSet
    rules.collect { case (seg, tag) if segs.contains(seg) => tag }.toSet
  }
  final case class Report(total: Int, passed: Seq[ModelResult], failed: Seq[ModelResult],
                          unresolvedRefs: Seq[(String, String)], cycle: Option[Seq[String]],
                          topoOrder: Seq[String]) {
    def ok: Boolean = failed.isEmpty && cycle.isEmpty
  }

  /** All .sql files under `dir` (empty if absent); the walk stream is
    * closed (shared by CiGates). */
  def sqlFiles(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Nil
    else {
      val walk = Files.walk(dir)
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".sql") && Files.isRegularFile(p))
        .toList.sortBy(_.toString)
      finally walk.close()
    }

  /** Load every `{% macro %}` definition under `macrosDir`. */
  def loadMacros(macrosDir: Path): Map[String, SqlTemplater.MacroDef] =
    sqlFiles(macrosDir).foldLeft(Map.empty[String, SqlTemplater.MacroDef]) { (acc, p) =>
      acc ++ SqlTemplater.parseMacros(Files.readString(p))
    }

  private val SnapshotNameRe = """\{%-?\s*snapshot\s+(\w+)""".r
  private val ConflictMarkerRe = """(?m)^(<{7} |={7}$|>{7} )""".r

  /** Names a `ref()` can resolve to besides models: `{% snapshot X %}` block
    * names under snapshots/ and seed CSV stems under seeds/. */
  def refTargets(snapshotsDir: Path, seedsDir: Path): Set[String] = {
    val snaps = if (Files.isDirectory(snapshotsDir))
      sqlFiles(snapshotsDir).flatMap(p =>
        SnapshotNameRe.findAllMatchIn(Files.readString(p)).map(_.group(1))).toSet
    else Set.empty[String]
    val seeds = if (Files.isDirectory(seedsDir))
      Files.walk(seedsDir).iterator().asScala
        .filter(p => p.toString.endsWith(".csv") && Files.isRegularFile(p))
        .map(_.getFileName.toString.stripSuffix(".csv")).toSet
    else Set.empty[String]
    snaps ++ seeds
  }

  /** Default var values for a dry render: dates shaped like the scheduler's
    * daily window, identifiers for name-valued vars. Callers override. */
  val defaultVars: Map[String, String] = Map(
    "start_date_ymd" -> "2025-09-30",
    "end_date_ymd" -> "2025-10-01",
    "table_name" -> "sweep_table")

  def sweep(spark: SparkSession, modelsDir: Path, macrosDir: Path,
            vars: Map[String, String] = defaultVars,
            extraRefTargets: Set[String] = Set.empty): Report = {
    val macros = loadMacros(macrosDir)
    val parser = spark.sessionState.sqlParser

    val results = sqlFiles(modelsDir).map { p =>
      val name = p.getFileName.toString.stripSuffix(".sql")
      val sql = Files.readString(p)
      val incremental = sql.contains("is_incremental")
      val tags = dirTags(p)
      var refs: Seq[String] = Nil
      var srcs: Seq[(String, String)] = Nil

      def attempt(phase: String)(body: => Unit): Option[ModelResult] =
        try { body; None } catch {
          case e: Throwable => Some(ModelResult(name, p.toString, phase,
            Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | ")}"),
            refs, incremental, tags, srcs))
        }

      val failure =
        // a committed git merge-conflict marker is a defect of the corpus
        // file itself, not of the template pipeline — classify, don't parse
        ConflictMarkerRe.findFirstIn(sql).map(_ => ModelResult(name, p.toString,
          "corpus-defect", Some("unresolved git merge-conflict marker in source file"),
          refs, incremental, tags))
        .orElse(attempt("config") {
          SqlTemplater.materializationFromConfig(
            SqlTemplater.effectiveConfig(sql, macros, vars))
        }).orElse {
          // incremental models must render AND parse in both modes: the
          // is_incremental branches are different SQL texts at runtime
          val modes = if (incremental) Seq(false, true) else Seq(false)
          modes.iterator.flatMap { inc =>
            var rendered: SqlTemplater.Rendered = null
            attempt(if (inc) "render(incremental)" else "render") {
              rendered = SqlTemplater.renderText(name, sql, macros, vars, vars(_), inc)
              refs = rendered.refs
              srcs = (srcs ++ rendered.sources).distinct
            }.orElse(attempt(if (inc) "parse(incremental)" else "parse") {
              parser.parsePlan(rendered.text)
            })
          }.nextOption()
        }

      failure.getOrElse(ModelResult(name, p.toString, "ok", None, refs, incremental, tags, srcs))
    }

    // dbt model names are project-global: two files with the same stem in
    // different directories make every ref() to that name ambiguous, and
    // would collapse into a single Kahn node below — surfacing as a phantom
    // "cycle". Classify them as their own failure class and build the DAG
    // over uniquely-named models only.
    val dupNames = results.groupBy(_.name).collect {
      case (n, rs) if rs.size > 1 => n }.toSet
    val flagged = results.map { r =>
      if (dupNames.contains(r.name)) {
        val dupNote =
          s"model name '${r.name}' defined by ${results.count(_.name == r.name)} " +
            "files — ref() resolution is ambiguous"
        // append to a genuine config/render/parse failure rather than
        // replacing it — the report must not lose the underlying defect
        r.error match {
          case Some(e) => r.copy(error = Some(s"$e; $dupNote"))
          case None    => r.copy(phase = "duplicate-name", error = Some(dupNote))
        }
      } else r
    }
    val (failed, passed) = flagged.partition(_.error.isDefined)

    // corpus DAG: edges ref -> model; refs may also resolve to snapshot
    // blocks or seed CSVs (extraRefTargets) — anything else is unresolved
    val unique = flagged.filterNot(r => dupNames.contains(r.name))
    val byName = unique.map(r => r.name -> r).toMap
    val unresolved = unique.flatMap(r =>
      r.refs.filterNot(x => byName.contains(x) || extraRefTargets.contains(x)).map(r.name -> _))
    val edges = unique.map(r => r.name -> r.refs.filter(byName.contains))

    // Kahn topological order over the in-corpus ref graph
    val inDeg = scala.collection.mutable.Map(edges.map { case (n, ds) => n -> ds.size }: _*)
    val dependents = edges.flatMap { case (n, ds) => ds.map(_ -> n) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val queue = scala.collection.mutable.Queue(
      edges.collect { case (n, ds) if ds.isEmpty => n }.sorted: _*)
    val topo = scala.collection.mutable.ArrayBuffer.empty[String]
    while (queue.nonEmpty) {
      val n = queue.dequeue(); topo += n
      for (d <- dependents.getOrElse(n, Nil).sorted) {
        inDeg(d) -= 1
        if (inDeg(d) == 0) queue += d
      }
    }
    val cycle = if (topo.size == unique.size) None
                else Some(inDeg.collect { case (n, d) if d > 0 => n }.toSeq.sorted)

    Report(results.size, passed, failed, unresolved, cycle, topo.toSeq)
  }

  /** Human-readable summary (CORPUS.md body). */
  def describe(r: Report): String = {
    val sb = new StringBuilder
    sb ++= s"total models: ${r.total}\n"
    sb ++= s"pass (config+render+parse): ${r.passed.size}\n"
    sb ++= s"incremental models (rendered+parsed in both modes): ${r.passed.count(_.incremental) + r.failed.count(_.incremental)}\n"
    sb ++= s"in-corpus ref edges resolve: ${r.total - r.unresolvedRefs.map(_._1).distinct.size}\n"
    sb ++= s"topological order covers: ${r.topoOrder.size}/${r.total} (cycle: ${r.cycle.map(_.mkString(", ")).getOrElse("none")})\n"
    val tagCounts = (r.passed ++ r.failed).flatMap(_.tags)
      .groupBy(identity).view.mapValues(_.size).toSeq.sortBy(-_._2)
    sb ++= tagCounts.map { case (t, n) => s"tag:$t $n" }.mkString("dir-tag slices: ", ", ", "\n")
    if (r.unresolvedRefs.nonEmpty)
      sb ++= r.unresolvedRefs.map { case (m, ref) => s"  unresolved ref: $m -> $ref\n" }.mkString
    for (f <- r.failed)
      sb ++= s"  FAIL [${f.phase}] ${f.name}: ${f.error.getOrElse("")}\n"
    sb.result()
  }
}
