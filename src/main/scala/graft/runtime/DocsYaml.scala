package graft.runtime

import java.nio.file.{Files, Path}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Ingestion of the reference's documentation YAML (`persist_docs` feed —
  * reference: dbt_project.yml:43-45 `persist_docs: relation: true, columns:
  * true`; 21 yml files under models/spark/ carry `models:` sections with
  * per-model and per-column `description:` entries, e.g.
  * models/spark/gold/src_gold.yml:3-40). The reference pushes these as Hive
  * table/column comments via ALTER statements
  * (macros/spark_adapter_patch/alter_column_comment.sql:1-17); this engine's
  * equivalent is the warehouse docs sidecar ([[Warehouse.setDocs]]).
  *
  * The parser covers exactly the subset the corpus uses — `models:` lists
  * with `- name:` items at either indentation style, nested `columns:`
  * lists, plain / quoted / folded (`>`, `>-`, `|`) description scalars —
  * with no YAML library (none is available offline, and the corpus shape is
  * stable).
  */
object DocsYaml {

  final case class ModelDocs(name: String, description: Option[String],
                             columns: Map[String, String])

  private val ItemName = """^(\s*)-\s+name:\s*(.*)$""".r
  private val KeyLine = """^(\s*)(description|columns):\s*(.*)$""".r
  private val TopKey = """^(\w+):\s*$""".r

  private def unquote(v: String): String = {
    val t = v.trim
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  def parse(text: String): Seq[ModelDocs] = {
    val lines = text.split("\n", -1)
    val out = mutable.ArrayBuffer.empty[ModelDocs]

    var inModels = false
    var modelIndent = -1 // indent of model-level "- name:" items
    var curName: String = null
    var curDesc: Option[String] = None
    val curCols = mutable.LinkedHashMap.empty[String, String]
    // the most recent "- name:" target a description attaches to:
    // null = none, "" = the model itself, otherwise a column name
    var target: String = null

    def flush(): Unit = {
      if (curName != null) out += ModelDocs(curName, curDesc, curCols.toMap)
      curName = null; curDesc = None; curCols.clear(); target = null
    }

    /** Folded/literal block scalar: consume deeper-indented lines. */
    def foldedValue(keyIndent: Int, from: Int): (String, Int) = {
      val sb = new StringBuilder
      var i = from
      var continue = true
      while (i < lines.length && continue) {
        val ln = lines(i)
        if (ln.trim.isEmpty) i += 1
        else {
          val ind = ln.takeWhile(_ == ' ').length
          if (ind > keyIndent) {
            if (sb.nonEmpty) sb.append(' ')
            sb.append(ln.trim); i += 1
          } else continue = false
        }
      }
      (sb.toString, i)
    }

    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      line match {
        case TopKey(k) =>
          if (k == "models") { inModels = true; modelIndent = -1 }
          else if (inModels) { flush(); inModels = false }
          i += 1
        case ItemName(ws, v) if inModels =>
          val ind = ws.length
          if (modelIndent < 0) modelIndent = ind
          if (ind == modelIndent) { // next model
            flush()
            curName = unquote(v); target = ""
          } else { // a column item
            target = unquote(v)
            if (target.nonEmpty) curCols.put(target, "")
          }
          i += 1
        case KeyLine(ws, "description", v) if inModels && target != null =>
          val (value, next) =
            if (v.trim.isEmpty || v.trim == ">" || v.trim == ">-" || v.trim == "|" || v.trim == "|-")
              foldedValue(ws.length, i + 1)
            else (unquote(v), i + 1)
          if (target == "") curDesc = Some(value)
          else curCols.put(target, value)
          i = next
        case _ => i += 1
      }
    }
    flush()
    out.toSeq
  }

  /** Parse every docs yml under `dir` (recursively). */
  def parseDir(dir: String): Seq[ModelDocs] = {
    val stream = Files.walk(java.nio.file.Paths.get(dir))
    val files =
      try stream.iterator().asScala.filter(p => p.toString.endsWith(".yml")).toList
      finally stream.close()
    files.sortBy(_.toString).flatMap(p => parse(Files.readString(p)))
  }

  /** Apply parsed docs to every model whose table exists in the warehouse
    * (the reference's post-run persist_docs pass). Returns applied names. */
  def applyTo(wh: Warehouse, docs: Seq[ModelDocs]): Seq[String] =
    docs.filter(d => wh.tableExists(d.name)).map { d =>
      wh.setDocs(d.name, d.description.getOrElse(""),
        d.columns.filter(_._2.nonEmpty))
      wh.persistDocsToCatalog(d.name)
      d.name
    }
}
