package graft.runtime

import java.nio.file.{Files, Path}

/** The reference's CI static gates, engine-side (reference:
  * .github/workflows/dbt-jobs-pr-tests.yaml:42-60):
  *
  *   - every model/snapshot declares `meta.model_owner`
  *     (.github/scripts/get_no_owner.py:1-24);
  *   - every non-view model declares `file_format`
  *     (.github/scripts/get_no_fileformat.py — the reference only enforces
  *     it on PR-changed files, which is how a handful of legacy models
  *     remain undeclared; this gate reports them all);
  *   - no declared source goes unused by any model/snapshot/test node
  *     (.github/scripts/get_unused_sources.py:1-23).
  *
  * Config extraction is macro-aware ([[SqlTemplater.effectiveConfig]]), so a
  * model whose config lives inside a template macro body (the
  * `gold_active_*_with_ephemeral` shape) is correctly credited with the
  * macro's owner and file_format — a raw grep misses those.
  */
object CiGates {

  final case class Report(noOwner: Seq[String], noFileFormat: Seq[String],
                          unusedSources: Seq[(String, String)],
                          unparsed: Seq[String])

  def sweep(modelsDir: Path, snapshotsDir: Path, testsDir: Path, macrosDir: Path,
            declaredSources: Map[String, Set[String]]): Report = {
    val macros = CorpusSweep.loadMacros(macrosDir)
    val noOwner = scala.collection.mutable.ArrayBuffer.empty[String]
    val noFileFormat = scala.collection.mutable.ArrayBuffer.empty[String]
    // a node whose config cannot be parsed is NOT silently exempt from the
    // gates — it is its own failure class, like the reference CI failing
    // loudly on an unparseable manifest node
    val unparsed = scala.collection.mutable.ArrayBuffer.empty[String]
    val used = scala.collection.mutable.Set.empty[(String, String)]

    for (p <- CorpusSweep.sqlFiles(modelsDir)) {
      val name = p.getFileName.toString.stripSuffix(".sql")
      val sql = Files.readString(p)
      used ++= SqlTemplater.staticSources(sql)
      scala.util.Try(SqlTemplater.effectiveConfig(sql, macros, CorpusSweep.defaultVars)) match {
        case scala.util.Success(cfg) =>
          val meta = cfg.get("meta").collect {
            case Jinja.VMap(m) => m.keySet.toSet[String] }.getOrElse(Set.empty[String])
          if (!meta.contains("model_owner")) noOwner += name
          val materialized = cfg.get("materialized").map(_.render).getOrElse("view")
          if (materialized != "view" && !cfg.contains("file_format")) noFileFormat += name
        case scala.util.Failure(_) => unparsed += name
      }
    }
    for (p <- CorpusSweep.sqlFiles(snapshotsDir)) {
      val sql = Files.readString(p)
      used ++= SqlTemplater.staticSources(sql)
      scala.util.Try(SqlTemplater.snapshotModel(sql, macros)) match {
        case scala.util.Success(m) =>
          if (!m.meta.contains("model_owner")) noOwner += m.name
          // snapshots are always non-view materializations, so the
          // file_format gate applies to them exactly as to table models
          // (reference: every snapshot declares file_format='delta')
          if (!SqlTemplater.parseConfig(sql).contains("file_format"))
            noFileFormat += m.name
        case scala.util.Failure(_) =>
          unparsed += p.getFileName.toString.stripSuffix(".sql")
      }
    }
    for (p <- CorpusSweep.sqlFiles(testsDir)) used ++= SqlTemplater.staticSources(Files.readString(p))
    // macro bodies can carry source() calls that reach models only after
    // expansion — count them as used, matching the owner gate's macro
    // awareness (a source referenced solely through a macro is not unused)
    for (p <- CorpusSweep.sqlFiles(macrosDir)) used ++= SqlTemplater.staticSources(Files.readString(p))

    val unused = for {
      (schema, tables) <- declaredSources.toSeq.sortBy(_._1)
      table <- tables.toSeq.sorted if !used.contains((schema, table))
    } yield (schema, table)
    Report(noOwner.toSeq, noFileFormat.toSeq, unused, unparsed.toSeq)
  }
}
