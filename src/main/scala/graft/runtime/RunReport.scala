package graft.runtime

import java.nio.file.{Files, Path}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Machine-readable run artifacts, shaped after the two files the reference's
  * infra consumes from every dbt run:
  *
  *  - `run_results.json` — per-model status / execution time / message,
  *    parsed by infra/dbtjoom/load.py:10-30 (metadata, results[].status,
  *    results[].execution_time, results[].unique_id, results[].message,
  *    elapsed_time, args);
  *  - a model-level jobs graph for the Airflow DAG generator — deploy.sh:19-22
  *    feeds mk_dbt_model_graph.py → jobs_graph.json, and
  *    infra/dags_schedule.yaml:12-50 slices models into per-domain DAGs by
  *    tag with crontab/SLO/alert-channel params (default crontab `15 0 * * *`,
  *    line 14; a model with several tags lands in the LAST matching DAG —
  *    "If model contain multiply tags, then will be using the last one").
  *
  * Everything is deterministic: timestamps come from `run_ts`/`start_date_ymd`
  * vars (never the wall clock) and the invocation id is a content hash, so a
  * re-run over the same inputs produces byte-identical artifacts.
  */
object RunReport {

  /** One per-domain DAG slice (infra/dags_schedule.yaml entry). */
  final case class DagSchedule(dagName: String, tags: Set[String],
                               crontab: String = "15 0 * * *",
                               sloHour: Int = 18,
                               alertsChannel: String = "#dbt-spark-monitoring")

  private def statusStr(s: RunStatus): (String, Option[Double], Option[String]) = s match {
    case RunStatus.Success(sec) => ("success", Some(sec), None)
    case RunStatus.Failed(err) => ("error", None, Some(err))
    case RunStatus.Skipped => ("skipped", None, None)
  }

  /** run_results.json body for one DagRunner.run invocation. */
  def runResults(results: Seq[(String, RunStatus)], vars: Map[String, String]): JValue = {
    val generatedAt = vars.getOrElse("run_ts",
      vars.getOrElse("start_date_ymd", "1970-01-01") + " 00:00:00")
    val invocationId = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.orderedHash(
        results.map(_._1) ++ vars.toSeq.sorted.map(_.toString())).toLong & 0xffffffffL)
    JObject(
      "metadata" -> JObject(
        "generated_at" -> JString(generatedAt),
        "invocation_id" -> JString(invocationId),
        "graft_version" -> JString("0.1")),
      "results" -> JArray(results.toList.map { case (name, st) =>
        val (status, secs, msg) = statusStr(st)
        JObject(
          "unique_id" -> JString(s"model.graft.$name"),
          "relation_name" -> JString(name),
          "status" -> JString(status),
          "execution_time" -> secs.map(JDouble(_)).getOrElse(JNull),
          "message" -> msg.map(JString(_)).getOrElse(JNull),
          "thread_id" -> JString("main"),
          "timing" -> JArray(Nil),
          "failures" -> JNull)
      }),
      "elapsed_time" -> JDouble(results.collect {
        case (_, RunStatus.Success(s)) => s }.sum),
      "args" -> JObject("vars" -> JObject(
        vars.toList.sorted.map { case (k, v) => k -> (JString(v): JValue) })))
  }

  /** Jobs graph: every model node with deps/tags/meta, plus the tag-sliced
    * per-domain DAG list. Tag matching follows the reference's rule: a model
    * carrying several scheduled tags goes to the LAST schedule entry that
    * matches; models matching none go to the `default` DAG. */
  def jobsGraph(models: Seq[Model], schedules: Seq[DagSchedule]): JValue = {
    def dagOf(m: Model): String =
      schedules.filter(s => s.tags.exists(m.tags.contains))
        .lastOption.map(_.dagName).getOrElse("default")
    JObject(
      "nodes" -> JArray(models.toList.map(m => JObject(
        "name" -> JString(m.name),
        "unique_id" -> JString(s"model.graft.${m.name}"),
        "depends_on" -> JArray(m.deps.toList.map(JString(_))),
        "tags" -> JArray(m.tags.toList.sorted.map(JString(_))),
        "dag" -> JString(dagOf(m)),
        "meta" -> JObject(m.meta.toList.sorted.map { case (k, v) =>
          k -> (JString(v): JValue) })))),
      "dags" -> JArray((schedules :+ DagSchedule("default", Set.empty)).toList.map(s =>
        JObject(
          "dag_name" -> JString(s.dagName),
          "crontab" -> JString(s.crontab),
          "slo_hour" -> JInt(s.sloHour),
          "alerts_channel" -> JString(s.alertsChannel),
          "tags" -> JArray(s.tags.toList.sorted.map(JString(_))),
          "models" -> JArray(models.toList.filter(m => dagOf(m) == s.dagName)
            .map(m => JString(m.name)))))))
  }

  /** Write both artifacts under `targetDir` (dbt convention: `target/`). */
  def write(targetDir: Path, results: Seq[(String, RunStatus)],
            vars: Map[String, String], models: Seq[Model],
            schedules: Seq[DagSchedule] = Nil): Unit = {
    Files.createDirectories(targetDir)
    Files.writeString(targetDir.resolve("run_results.json"),
      JsonMethods.pretty(JsonMethods.render(runResults(results, vars))))
    Files.writeString(targetDir.resolve("jobs_graph.json"),
      JsonMethods.pretty(JsonMethods.render(jobsGraph(models, schedules))))
  }

  /** Round-trip reader (the load.py consumer side): per-model
    * (status, execution_time, message) plus elapsed_time. */
  def readRunResults(json: String): (Map[String, (String, Option[Double], Option[String])], Double) = {
    val v = JsonMethods.parse(json)
    val results = (v \ "results").asInstanceOf[JArray].arr.map { r =>
      val name = (r \ "relation_name").asInstanceOf[JString].s
      val status = (r \ "status").asInstanceOf[JString].s
      val secs = r \ "execution_time" match {
        case JDouble(d) => Some(d); case _ => None
      }
      val msg = r \ "message" match {
        case JString(s) => Some(s); case _ => None
      }
      name -> ((status, secs, msg))
    }.toMap
    val elapsed = v \ "elapsed_time" match {
      case JDouble(d) => d; case _ => 0.0
    }
    (results, elapsed)
  }

  /** Round-trip reader for the jobs graph: dag name → model names. */
  def readDagSlices(json: String): Map[String, Seq[String]] = {
    val v = JsonMethods.parse(json)
    (v \ "dags").asInstanceOf[JArray].arr.map { d =>
      (d \ "dag_name").asInstanceOf[JString].s ->
        (d \ "models").asInstanceOf[JArray].arr.collect { case JString(s) => s }
    }.toMap
  }
}
