package graft

import graft.runtime._

/** models/spark/b2b_mart/tochka.sql executed VERBATIM — the round-11
  * "star-expand loop" gap-class model, now on the roster: a CRM funnel over
  * a deeply-nested Mongo snapshot carrying `col.*` star expansion of an
  * exploded struct right next to a window on the SAME generator output
  * (:105, :124), `explode(pipeline.statuses)` dictionary extraction (:51),
  * the doubly-indexed `col.statuses.name[0]` (array-of-string inside a
  * struct inside an exploded array element, :69), `millis_to_ts_msk` on
  * event millis (:70, :118), a max-of-min contact→lead dedup chain with
  * `USING (contact_id)` (:24-37), a literal contact blocklist (:39) and a
  * `NOT IN` pipeline-exclusion subquery (:40), Cyrillic status dictionaries,
  * and a deal-overrides-amo coalesce cascade in the final select
  * (:138-141 plus the notes1/tasks1-before-notes/tasks coalesces). The
  * planted graph covers: a lead whose deal linkage overrides its
  * validation_status and reject_reason, a validated lead with no deal, a
  * rejected lead whose candidate deal dies on the contact blocklist, a
  * candidate deal killed by the Rocket-pipeline NOT IN, and task rn=1
  * latest-wins dedup. */
class TochkaRealSpec extends SparkSpec {
  import spark.implicits._

  /** millis whose millis_to_ts_msk rendering equals the given MSK wall time */
  private def msOf(mskWall: String): Long =
    (java.time.Instant.parse(mskWall.replace(' ', 'T') + "Z").getEpochSecond - 10800L) * 1000L

  test("REAL tochka.sql: deal override, nested mongo explodes, exclusion filters") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/b2b_mart/tochka.sql"))
    val ctx = freshCtx()

    val t1 = msOf("2024-03-01 09:00:00") // request_retrieval
    val t2 = msOf("2024-03-02 10:00:00") // negotiation
    val t3 = msOf("2024-03-03 11:00:00") // deal task (latest -> rn=1)
    val t3b = t3 - 3600000L              // older deal task, must lose
    val t4 = msOf("2024-03-04 12:00:00") // amo-side task for lead 102

    // mongo snapshot: lead 201 is the DEAL lead (Rocket pipeline, status
    // history, note, two tasks); 101/102 are amo leads on another pipeline
    ctx.sources.register("mongo", "b2b_core_amo_crm_raw_leads_daily_snapshot")(s => s.sql(
      s"""SELECT 201L AS leadId, 'st1' AS status, 'rej201' AS rejectReason,
         |  named_struct('name', 'Продажи Rocket', 'statuses',
         |    array(named_struct('_id', 'st1', 'name', 'Переговоры'))) AS pipeline,
         |  array(named_struct('statuses', named_struct('name', array('Заявка на расчет')), 'createdAt', ${t1}L),
         |        named_struct('statuses', named_struct('name', array('Переговоры')), 'createdAt', ${t2}L)) AS statusChangedEvents,
         |  array(named_struct('text', 'deal201 note')) AS notes,
         |  array(named_struct('createdAt', ${t3}L, 'entityType', 'call', 'text', 'do call'),
         |        named_struct('createdAt', ${t3b}L, 'entityType', 'email', 'text', 'old task')) AS tasks
         |UNION ALL
         |SELECT 101L, 'stX', NULL,
         |  named_struct('name', 'Other', 'statuses',
         |    array(named_struct('_id', 'zz', 'name', 'zz'))),
         |  array(named_struct('statuses', named_struct('name', array('x')), 'createdAt', 0L)),
         |  array(named_struct('text', 'amo101 note')),
         |  NULL
         |UNION ALL
         |SELECT 102L, 'stY', NULL,
         |  named_struct('name', 'Other', 'statuses',
         |    array(named_struct('_id', 'zz', 'name', 'zz'))),
         |  array(named_struct('statuses', named_struct('name', array('x')), 'createdAt', 0L)),
         |  array(named_struct('text', 'note102')),
         |  array(named_struct('createdAt', ${t4}L, 'entityType', 'email', 'text', 'send'))""".stripMargin))

    // interactions: 101/102/103 qualify; 104 wrong source, 105 not validated
    ctx.warehouse.createTable("fact_amo_attribution_interaction", Seq(
      (101L, "tochka", "c1", true), (102L, "tochka", "c2", true),
      (103L, "tochka", "c3", true), (104L, "other", "cX", true),
      (105L, "tochka", "cY", false))
      .toDF("amo_id", "source", "campaign", "validation"))

    // raw leads: 101 in-progress w/ loss reason; 102 validated; 103 closed
    // with a blocklisted status id; 301 exists only to feed the Rocket
    // pipeline NOT IN exclusion
    ctx.warehouse.createTable("fact_amo_crm_raw_leads", Seq(
      (101L, "p101", "2024-01-01 00:00:00", Option.empty[String], Option("2024-01-01 00:00:00"),
        "Переговоры", 777L, Option("lr101"), "Продажи Rocket"),
      (102L, "p102", "2024-01-02 00:00:00", Option("2024-02-01 10:00:00"), Option("2024-01-02 00:00:00"),
        "Closed - won", 888L, Option("lr102"), "Other"),
      (103L, "p103", "2024-01-03 00:00:00", Option.empty[String], Option("2024-01-03 00:00:00"),
        "Closed - lost", 59912675L, Option("lr103"), "Other"),
      (301L, "p301", "2024-01-04 00:00:00", Option.empty[String], Option("2024-01-04 00:00:00"),
        "Переговоры", 999L, Option.empty[String], "Квалификация Rocket"))
      .toDF("lead_id", "phone", "ca", "vts", "cts",
        "current_status", "current_status_id", "loss_reason", "pipeline_name")
      .selectExpr("lead_id", "phone", "CAST(ca AS TIMESTAMP) AS created_at",
        "CAST(vts AS TIMESTAMP) AS validated_ts_msk",
        "CAST(cts AS TIMESTAMP) AS created_ts_msk",
        "current_status", "current_status_id", "loss_reason", "pipeline_name"))

    // contact graph: contact 500 links amo 101 to deal 201 (kept) and 301
    // (killed by the Rocket NOT IN); contact 24268427 links amo 103 to 402
    // but IS the literal blocklist value, so 103 gets no deal
    ctx.warehouse.createTable("fact_amo_crm_contacts_phones", Seq(
      (101L, 500L), (201L, 500L), (301L, 500L),
      (103L, 24268427L), (402L, 24268427L))
      .toDF("lead_id", "contact_id"))

    val model = SqlTemplater.sqlModelAuto("tochka", sql)
    assert(model.materialization == Materialization.Table())
    assert(model.deps.toSet == Set("fact_amo_crm_contacts_phones",
      "fact_amo_attribution_interaction", "fact_amo_crm_raw_leads"))

    for ((n, st) <- new DagRunner(Seq(model)).run(ctx, selectors = Seq("tochka")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val out = ctx.ref("tochka")
    assert(out.count() == 3, out.select("amo_id").collect().mkString(";"))

    val rows = out.selectExpr("amo_id", "phone", "CAST(user_created_time AS STRING)",
      "validation_status", "CAST(validated_date AS STRING)", "reject_reason",
      "campaign", "deal_id", "loss_reason", "status_name",
      "CAST(request_retrieval AS STRING)", "CAST(negotiation AS STRING)",
      "CAST(info_clarification AS STRING)",
      "note_1", "note_5", "CAST(task_created_at AS STRING)", "task_type", "text")
      .as[(Long, String, String, String, Option[String], Option[String], String,
           Option[Long], Option[String], Option[String], Option[String],
           Option[String], Option[String], Option[String], Option[String],
           Option[String], Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap

    // 101: the deal overrides validation_status/reject_reason; validated_date
    // falls back to request_retrieval; deal-side notes1/tasks1 win coalesce
    assert(rows(101L) == ((101L, "p101", "2024-01-01 00:00:00", "Validated",
      Some("2024-03-01 09:00:00"), None, "c1", Some(201L), Some("rej201"),
      Some("Переговоры"), Some("2024-03-01 09:00:00"), Some("2024-03-02 10:00:00"),
      None, None, Some("deal201 note"), Some("2024-03-03 11:00:00"),
      Some("call"), Some("do call"))), rows(101L).toString)
    // 102: validated without a deal; amo-side note/task survive the coalesce
    assert(rows(102L) == ((102L, "p102", "2024-01-02 00:00:00", "Validated",
      Some("2024-02-01 00:00:00"), None, "c2", None, None, None, None, None,
      None, None, Some("note102"), Some("2024-03-04 12:00:00"),
      Some("email"), Some("send"))), rows(102L).toString)
    // 103: closed-lost, blocklisted status id nulls the reject reason, the
    // contact-blocklist kills its only deal candidate
    assert(rows(103L) == ((103L, "p103", "2024-01-03 00:00:00", "Rejected",
      None, None, "c3", None, None, None, None, None,
      None, None, None, None, None, None)), rows(103L).toString)
  }
}
