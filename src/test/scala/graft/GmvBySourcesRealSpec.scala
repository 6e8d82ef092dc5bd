package graft

import graft.runtime._

/** models/spark/b2b_mart/gmv_by_sources_wo_filters.sql (505 LoC) executed
  * VERBATIM: GROUP BY ALL, a scalar IN-subquery over the REAL
  * joom_pro_manual_orders seed CSV, ROW_NUMBER latest-change dedup, a
  * calendar cross-join (EXPLODE(SEQUENCE(...CURRENT_DATE))) feeding
  * 6-month rolling add_months client classification via window-over-CASE,
  * attribution/admin enrichment joins, and the model's own
  * first-vs-repeated labeling (which tags the order AFTER the user's first
  * as 'first order' — reproduced faithfully, quirk and all).
  */
class GmvBySourcesRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL gmv_by_sources_wo_filters.sql (505 LoC): GROUP BY ALL, seed IN-subquery, rolling client class") {
    val ctx = freshCtx()

    // the real seed backs the manual-orders IN-subquery
    Seeds.load(ctx, "joom_pro_manual_orders",
      "/root/reference/seeds/joom_pro_manual_orders.csv")

    ctx.warehouse.createTable("dim_user", spark.sql(
      """SELECT 'u1' AS user_id, false AS fake,
        |  CAST(NULL AS TIMESTAMP) AS next_effective_ts_msk,
        |  'adm1' AS owner_id, 'BR' AS country""".stripMargin))

    ctx.warehouse.createTable("dim_user_admin", spark.sql(
      "SELECT 'adm1' AS admin_id, 'ann@x.io' AS email, 'sales' AS role"))

    // o1 = the user's first manufactured order, o2 a later one
    ctx.warehouse.createTable("fact_order", spark.sql(
      """SELECT 'o1' AS order_id, 'u1' AS user_id,
        |  TIMESTAMP'2024-03-01 10:00:00' AS created_ts_msk,
        |  TIMESTAMP'2024-03-02 09:00:00' AS min_manufactured_ts_msk,
        |  CAST(NULL AS TIMESTAMP) AS next_effective_ts_msk,
        |  20 AS last_order_status
        |UNION ALL
        |SELECT 'o2', 'u1', TIMESTAMP'2024-04-01 10:00:00',
        |  TIMESTAMP'2024-04-05 08:00:00', CAST(NULL AS TIMESTAMP), 30""".stripMargin))

    // two change rows for o1: ROW_NUMBER picks the newest (1000, not 900)
    ctx.warehouse.createTable("fact_order_change", spark.sql(
      """SELECT 'o1' AS order_id, CAST(900.0 AS DOUBLE) AS total_confirmed_price,
        |  CAST(90.0 AS DOUBLE) AS final_gross_profit,
        |  CAST(100.0 AS DOUBLE) AS initial_gross_profit,
        |  'adm1' AS owner_moderator_id,
        |  TIMESTAMP'2024-03-01 12:00:00' AS event_ts_msk
        |UNION ALL SELECT 'o1', 1000.0, 120.0, 150.0, 'adm1', TIMESTAMP'2024-03-02 12:00:00'
        |UNION ALL SELECT 'o2', 200.0, 25.0, 30.0, 'adm1', TIMESTAMP'2024-04-01 12:00:00'""".stripMargin))

    ctx.warehouse.createTable("fact_attribution_interaction", spark.sql(
      """SELECT 'u1' AS user_id, 'google' AS source, 'ad' AS type,
        |  'c1' AS campaign, 'camp' AS utm_campaign, 'google' AS utm_source,
        |  'cpc' AS utm_medium, TIMESTAMP'2024-02-01 00:00:00' AS min_date_payed,
        |  true AS last_interaction_type""".stripMargin))

    val model = SqlTemplater.sqlModelAuto("gmv_by_sources_wo_filters",
      java.nio.file.Files.readString(java.nio.file.Paths.get(
        "/root/reference/models/spark/b2b_mart/gmv_by_sources_wo_filters.sql")))
    assert(model.deps.contains("joom_pro_manual_orders"))
    new DagRunner(Seq(model)).run(ctx, selectors = Seq("gmv_by_sources_wo_filters"))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    val rows = ctx.ref("gmv_by_sources_wo_filters").selectExpr(
      "CAST(t AS STRING)", "order_id", "gmv_initial", "initial_gross_profit",
      "final_gross_profit", "source", "utm_medium", "retention", "user_id",
      "country", "owner_email", "owner_role", "first_order", "client",
      "current_client")
      .as[(String, String, Double, Double, Double, String, String, Boolean,
        String, String, String, String, String, String, String)].collect().toSet

    // hand-tally: o1 dedups to the 1000-price change row; t = manufactured
    // date; retention true (paid before creation); o1 IS the user's min
    // manufactured date -> 'repeated order' label, o2 (later) -> 'first
    // order' (the model's own inverted naming, reproduced verbatim); both
    // rolling sums stay under 30k -> 'small client' in 2024 and today
    assert(rows == Set(
      ("2024-03-02", "o1", 1000.0, 150.0, 120.0, "google", "cpc", true,
        "u1", "BR", "ann@x.io", "sales", "repeated order", "small client", "small client"),
      ("2024-04-05", "o2", 200.0, 30.0, 25.0, "google", "cpc", true,
        "u1", "BR", "ann@x.io", "sales", "first order", "small client", "small client")),
      rows.mkString("\n"))
  }
}
