package graft.runtime

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

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
                          unusedSources: Seq[(String, String)])

  private def sqlFiles(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Nil
    else {
      val walk = Files.walk(dir)
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".sql") && Files.isRegularFile(p)).toList
        .sortBy(_.toString)
      finally walk.close()
    }

  def sweep(modelsDir: Path, snapshotsDir: Path, testsDir: Path, macrosDir: Path,
            declaredSources: Map[String, Set[String]]): Report = {
    val macros = CorpusSweep.loadMacros(macrosDir)
    val noOwner = scala.collection.mutable.ArrayBuffer.empty[String]
    val noFileFormat = scala.collection.mutable.ArrayBuffer.empty[String]
    val used = scala.collection.mutable.Set.empty[(String, String)]

    for (p <- sqlFiles(modelsDir)) {
      val name = p.getFileName.toString.stripSuffix(".sql")
      val sql = Files.readString(p)
      used ++= SqlTemplater.staticSources(sql)
      scala.util.Try(SqlTemplater.effectiveConfig(sql, macros, CorpusSweep.defaultVars))
        .foreach { cfg =>
          val meta = cfg.get("meta").collect {
            case Jinja.VMap(m) => m.keySet.toSet[String] }.getOrElse(Set.empty[String])
          if (!meta.contains("model_owner")) noOwner += name
          val materialized = cfg.get("materialized").map(_.render).getOrElse("view")
          if (materialized != "view" && !cfg.contains("file_format")) noFileFormat += name
        }
    }
    for (p <- sqlFiles(snapshotsDir)) {
      val sql = Files.readString(p)
      used ++= SqlTemplater.staticSources(sql)
      scala.util.Try(SqlTemplater.snapshotModel(sql, macros)).foreach { m =>
        if (!m.meta.contains("model_owner")) noOwner += m.name
      }
    }
    for (p <- sqlFiles(testsDir)) used ++= SqlTemplater.staticSources(Files.readString(p))

    val unused = for {
      (schema, tables) <- declaredSources.toSeq.sortBy(_._1)
      table <- tables.toSeq.sorted if !used.contains((schema, table))
    } yield (schema, table)
    Report(noOwner.toSeq, noFileFormat.toSeq, unused)
  }
}
