package graft.runtime

import java.nio.file.{Files, Paths}

/** Ingestion of the reference's `sources.yml` declarations — the dbt
  * manifest's external-table registry (reference: 3 files declare 31 source
  * schemas / 282 tables: models/spark/sources.yml,
  * models/spark/b2b_mart/sources.yml, models/spark/onfy/sources.yml). dbt
  * refuses to compile a `source('s','t')` call that is not declared; the
  * engine gets the same integrity check by loading these declarations into
  * [[SourceRegistry]] (see `SourceRegistry.requireDeclared`) and by the
  * corpus-wide resolution sweep in CorpusSpec.
  */
object SourcesYaml {

  private val SchemaItem = """^  -\s+name:\s*(\S+)\s*$""".r
  private val TableItem = """^      -\s+name:\s*(\S+)\s*$""".r

  /** schema → declared table names. Covers exactly the corpus yml shape
    * (two fixed indentation levels under a top-level `sources:`). */
  def parse(text: String): Map[String, Set[String]] = {
    var inSources = false
    var schema: String = null
    val out = scala.collection.mutable.Map.empty[String, Set[String]]
    for (ln <- text.split("\n")) ln match {
      case l if l.trim == "sources:" => inSources = true
      case SchemaItem(s) if inSources =>
        schema = s; out.getOrElseUpdate(schema, Set.empty)
      case TableItem(t) if inSources && schema != null =>
        out(schema) = out(schema) + t
      case l if l.nonEmpty && !l.startsWith(" ") && !l.startsWith("-")
          && !l.startsWith("#") && l.contains(":") =>
        // only another top-level KEY ends the section — a column-0 comment
        // must not silently truncate the declarations the registry enforces
        if (l.trim != "version: 2") inSources = false
      case _ =>
    }
    out.toMap
  }

  def parseFiles(paths: Seq[String]): Map[String, Set[String]] =
    paths.map(p => parse(Files.readString(Paths.get(p))))
      .foldLeft(Map.empty[String, Set[String]]) { (acc, m) =>
        m.foldLeft(acc) { case (a, (k, v)) => a.updated(k, a.getOrElse(k, Set.empty) ++ v) }
      }
}
