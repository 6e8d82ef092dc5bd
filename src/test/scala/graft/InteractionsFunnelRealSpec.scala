package graft

import graft.runtime._

/** models/spark/b2b_mart/key/interactions_funnel.sql executed VERBATIM — a
  * 394-line funnel carrying the corpus's only RIGHT JOIN (:303 — operational
  * events RIGHT JOIN interactions, where the subsequent `type` WHERE also
  * silently drops the null-extended survivors: planted i2/i3/i4 must come out
  * of the gmv CTE EMPTY, reaching the final join as NULL gmv), plus:
  * `map_from_entries(utmLabels)["utm_…"]` UTM extraction (:48-50), the
  * from_unixtime(ctms/1000 + 10800) MSK shift (:47), FIRST_VALUE attribution
  * per user (:22-25), inline VALUES-style status/reason dictionaries, a
  * priority-ranked latest-status dedup, `in` used as a table alias, the
  * `cast(x as string)||"_"||y` double-quoted concat (:341), and the
  * (user, successful) order_number window. Every cell hand-computed. */
class InteractionsFunnelRealSpec extends SparkSpec {
  import spark.implicits._

  private def ctmsOf(utcTs: String): Long =
    (java.time.Instant.parse(utcTs).getEpochSecond - 10800L) * 1000L

  test("REAL interactions_funnel.sql: funnel fields, RIGHT JOIN gmv, order numbers") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/b2b_mart/key/interactions_funnel.sql"))
    val ctx = freshCtx()

    // mongo interactions: one row per interaction; u1/u2 carry two rows each
    // (the FIRST source/type/campaign by ctms must win for both)
    val utm1 = Seq(("utm_campaign", "camp1"), ("utm_source", "google"), ("utm_medium", "cpc"))
    val utm3 = Seq(("utm_source", "tg"))
    ctx.sources.register("mongo", "b2b_core_interactions_daily_snapshot")(s => {
      import s.implicits._
      Seq(
        ("i1", "u1", ctmsOf("2024-03-05T12:00:00Z"), "fb", "paid", "c-f", utm1, Option("r1")),
        ("i2", "u1", ctmsOf("2024-03-06T10:00:00Z"), "ig", "organic", "c-i",
          Seq.empty[(String, String)], None),
        ("i3", "u2", ctmsOf("2024-03-07T09:00:00Z"), "vk", "paid", "c-v", utm3, Option("r2")),
        ("i4", "u2", ctmsOf("2024-03-08T09:00:00Z"), "dz", "organic", "c-d",
          Seq.empty[(String, String)], None))
        .toDF("_id", "uid", "ctms", "source", "type", "campaign", "utmLabels", "popupRequestId")
    })
    // operational events: latest admin event for o1 wins; the older o1 event
    // loses to rn=1; the o2 event has the wrong type and must vanish
    ctx.sources.register("b2b_mart", "operational_events")(s => {
      import s.implicits._
      Seq(
        ("orderChangedByAdmin", "2024-03-06 14:00:00", "o1", 100.5, 90.0, 10.0, 12.0),
        ("orderChangedByAdmin", "2024-03-05 14:00:00", "o1", 50.0, 40.0, 5.0, 6.0),
        ("somethingElse", "2024-03-07 11:00:00", "o2", 77.0, 70.0, 7.0, 8.0))
        .toDF("type", "ts", "order_id", "ccg", "fg", "fgp", "igp")
        .selectExpr("type", "CAST(ts AS TIMESTAMP) AS event_ts_msk",
          """named_struct('orderId', order_id, 'gmv', named_struct(
            |  'clientConvertedGMV', ccg, 'finalGMV', fg,
            |  'finalGrossProfit', fgp, 'initialGrossProfit', igp)) AS payload""".stripMargin)
    })

    ctx.warehouse.createTable("fact_user_request", Seq(
      ("u1", Option(false)), ("u2", Option.empty[Boolean]), ("u3", Option(true)))
      .toDF("user_id", "is_joompro_employee"))
    ctx.warehouse.createTable("fact_order", Seq(
      ("o1", "F1", "r1", "u1", Option.empty[String]),
      ("o2", "F2", "r2", "u2", Option.empty[String]),
      ("o1", "F1-old", "r1", "u1", Option("2024-01-01 00:00:00"))) // stale SCD2 row
      .toDF("order_id", "friendly_id", "request_id", "user_id", "ne")
      .selectExpr("order_id", "friendly_id", "request_id", "user_id",
        "CAST(ne AS TIMESTAMP) AS next_effective_ts_msk"))
    ctx.warehouse.createTable("dim_user", Seq(
      ("u1", 30, Option.empty[Int], Option.empty[String]),
      ("u1", 10, Option.empty[Int], Option("2024-01-01 00:00:00")), // stale
      ("u2", 40, Option(1080), Option.empty[String]))
      .toDF("user_id", "validation_status", "reject_reason", "ne")
      .selectExpr("user_id", "validation_status", "reject_reason",
        "CAST(ne AS TIMESTAMP) AS next_effective_ts_msk"))
    ctx.warehouse.createTable("fact_order_change", Seq(
      ("o1", "selling", Option("negotiation"), "2024-03-05 13:00:00"),
      ("o1", "manufacturing", Option.empty[String], "2024-03-06 13:00:00"),
      ("o2", "cancelled", Option.empty[String], "2024-03-07 10:00:00"))
      .toDF("order_id", "status", "sub_status", "ts")
      .selectExpr("order_id", "status", "sub_status", "CAST(ts AS TIMESTAMP) AS event_ts_msk"))

    val model = SqlTemplater.sqlModelAuto("interactions_funnel", sql)
    assert(model.materialization == Materialization.Table())
    assert(model.deps.toSet == Set(
      "fact_user_request", "fact_order", "dim_user", "fact_order_change"))

    for ((n, st) <- new DagRunner(Seq(model)).run(ctx, selectors = Seq("interactions_funnel")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val out = ctx.ref("interactions_funnel")
    assert(out.count() == 4, out.select("interaction_id").collect().mkString(";"))

    // attribution + identity columns
    val attrib = out.selectExpr("interaction_id", "CAST(partition_date_msk AS STRING)",
      "CAST(created_week AS STRING)", "utm_campaign", "utm_source", "utm_medium",
      "source", "type", "campaign", "user_id", "validation_status", "reject_reason",
      "first_interaction")
      .as[(String, String, String, Option[String], Option[String], Option[String],
           String, String, String, String, String, Option[String], Int)].collect().toSet
    assert(attrib == Set(
      ("i1", "2024-03-05", "2024-03-04", Some("camp1"), Some("google"), Some("cpc"),
        "fb", "paid", "c-f", "u1", "validated", None, 1),
      ("i2", "2024-03-06", "2024-03-04", None, None, None,
        "fb", "paid", "c-f", "u1", "validated", None, 0),
      ("i3", "2024-03-07", "2024-03-04", None, Some("tg"), None,
        "vk", "paid", "c-v", "u2", "rejected", Some("deadRequest"), 1),
      ("i4", "2024-03-08", "2024-03-04", None, None, None,
        "vk", "paid", "c-v", "u2", "rejected", Some("deadRequest"), 0)), attrib.toString)

    // order linkage, funnel classification, RIGHT-JOIN-survivor gmv, numbering
    val funnel = out.selectExpr("interaction_id", "request_id", "order_id", "friendly_id",
      "status", "sub_status", "final_gmv", "client_converted_gmv",
      "funnel_field", "int_funnel_field", "sorted_funnel_field",
      "order_successful", "order_number")
      .as[(String, Option[String], Option[String], Option[String], Option[String],
           Option[String], Option[Double], Option[Double], String, Int, String, Int, Int)]
      .collect().toSet
    assert(funnel == Set(
      // latest admin event wins: 90.0, not the older 40.0
      ("i1", Some("r1"), Some("o1"), Some("F1"), Some("manufacturing"), None,
        Some(90.0), Some(100.5), "manufacturing", 8, "8_manufacturing", 1, 1),
      // no order: falls through to the validation tier; gmv NULL because the
      // type filter removed the right-join null-extension, not via the join
      ("i2", None, None, None, None, None, None, None, "validated", 2, "2_validated", 0, 1),
      ("i3", Some("r2"), Some("o2"), Some("F2"), Some("cancelled"), None,
        None, None, "cancelled", 12, "12_cancelled", 0, 1),
      ("i4", None, None, None, None, None, None, None, "rejected", 1, "1_rejected", 0, 2)),
      funnel.toString)
  }
}
