package graft.runtime

import org.apache.spark.sql.DataFrame
import graft.functions.TimeFunctions

/** Minimal dbt-Jinja surface over spark.sql — enough that the reference's
  * model bodies run near-verbatim (SURVEY.md §7 `sqlfront`: the reference's
  * dialect IS Spark SQL, so only `{{ ref }}`, `{{ source }}`, `{{ var }}`,
  * `{% if is_incremental() %}` and `{{ this }}` need substitution).
  *
  * Supported:
  *   - `{{ ref('model') }}` → temp view over the model's materialized output
  *   - `{{ source('schema','table') }}` → temp view over the source registry
  *   - `{{ var('k') }}` / `{{ var('k', 'default') }}` → raw text substitution
  *   - `{% if is_incremental() %} … {% endif %}` (with optional `{% else %}`)
  *   - `{{ this }}` → temp view over the model's own current table
  */
object SqlTemplater {

  private val ConfigRe = """(?s)\{\{\s*config\(.*?\)\s*\}\}""".r
  private val CommentRe = """(?s)\{#.*?#\}""".r
  private val RefRe = """\{\{\s*ref\(\s*['"]([^'"]+)['"]\s*\)\s*\}\}""".r
  private val SourceRe = """\{\{\s*source\(\s*['"]([^'"]+)['"]\s*,\s*['"]([^'"]+)['"]\s*\)\s*\}\}""".r
  private val VarRe = """\{\{\s*var\(\s*['"]([^'"]+)['"](?:\s*,\s*['"]([^'"]*)['"])?\s*\)\s*\}\}""".r
  private val IncrRe = """(?s)\{%\s*if\s+is_incremental\(\)\s*%\}(.*?)(?:\{%\s*else\s*%\}(.*?))?\{%\s*endif\s*%\}""".r
  private val ThisRe = """\{\{\s*this\s*\}\}""".r

  /** Static dependency extraction for DAG wiring (the refs in the text). */
  def extractRefs(sql: String): Seq[String] =
    RefRe.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct

  /** Render + execute a dbt-style SQL body in `ctx`. */
  def runSql(ctx: Ctx, modelName: String, sql: String): DataFrame = {
    TimeFunctions.register(ctx.spark)

    // reference model bodies open with {{ config(...) }} and may carry
    // {# jinja comments #}; config is engine-side metadata here (the Model
    // carries materialization), so both are stripped for near-verbatim runs
    val stripped = CommentRe.replaceAllIn(ConfigRe.replaceAllIn(sql, ""), "")

    var text = IncrRe.replaceAllIn(stripped, m =>
      scala.util.matching.Regex.quoteReplacement(
        if (ctx.isIncremental) m.group(1) else Option(m.group(2)).getOrElse("")))

    text = VarRe.replaceAllIn(text, m =>
      scala.util.matching.Regex.quoteReplacement(
        Option(m.group(2)) match {
          case Some(default) => ctx.vars.getOrElse(m.group(1), default)
          case None => ctx.varOf(m.group(1))
        }))

    for (ref <- RefRe.findAllMatchIn(text).map(_.group(1)).toSeq.distinct) {
      ctx.ref(ref).createOrReplaceTempView(viewName(ref))
    }
    text = RefRe.replaceAllIn(text, m =>
      scala.util.matching.Regex.quoteReplacement(viewName(m.group(1))))

    for (m <- SourceRe.findAllMatchIn(text).toSeq.map(m => (m.group(1), m.group(2))).distinct) {
      ctx.source(m._1, m._2).createOrReplaceTempView(viewName(s"${m._1}__${m._2}"))
    }
    text = SourceRe.replaceAllIn(text, m =>
      scala.util.matching.Regex.quoteReplacement(viewName(s"${m.group(1)}__${m.group(2)}")))

    if (ThisRe.findFirstIn(text).isDefined) {
      val thisView = viewName(s"__this_$modelName")
      if (ctx.warehouse.tableExists(modelName))
        ctx.warehouse.read(modelName).createOrReplaceTempView(thisView)
      text = ThisRe.replaceAllIn(text, thisView)
    }

    ctx.spark.sql(text)
  }

  private def viewName(n: String): String = n.replaceAll("[^A-Za-z0-9_]", "_")

  /** Build a DAG [[Model]] from a dbt-style SQL body; deps auto-extracted. */
  def sqlModel(name: String, sql: String,
               materialization: Materialization = Materialization.Table(),
               tags: Set[String] = Set.empty,
               meta: Map[String, String] = Map.empty): Model =
    Model(name, ctx => runSql(ctx, name, sql), materialization,
      deps = extractRefs(sql), tags = tags, meta = meta)
}
