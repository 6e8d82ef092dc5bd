package graft

import graft.runtime._

/** models/spark/b2b_mart/dashboards/marketing_deals_with_orders.sql executed
  * VERBATIM — the marketing head of the fact_deals_with_requests chain.
  * Semantics under test: nearest-preceding-session device attribution with
  * NULL-LAST ranking (`ORDER BY CASE WHEN event_ts IS NULL THEN 1 ELSE 0
  * END, diff_sec, event_ts DESC`, :87-98) over an os-type device-class
  * decode (:57-61), LAG-based previous-deal day grouping (:23-31, :186-195),
  * the first-deal join (number_user_deal=1, :12-21) feeding deals_delta_day,
  * paid-stage detection across FOUR LIKE arms on two status-name columns
  * with MIN date (:33-43), the `achived_payment` triple COALESCE falling
  * back to t_gmv presence (:196-198, where achieved_paid_date coalesces a
  * DATE with the TIMESTAMP t_gmv), hair-space (U+200A) REPEAT prefixes that
  * force dashboard sort order on the first-visit cohort flag (:152-170),
  * the `status:reject` concat (:129-132), and the Test-status filter
  * applied to the main SELECT and both deal-sequence CTEs (:20, :30, :210).
  *
  * Clock note: `is_current_week` compares 2024 fixture dates against
  * DATE_TRUNC('ISOWEEK', CURRENT_DATE) — deterministically 0 here. */
class MarketingDealsRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL marketing_deals_with_orders.sql: device attribution, previous-deal " +
       "groups, paid-stage LIKE arms, hair-space cohort flags") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/b2b_mart/dashboards/marketing_deals_with_orders.sql"))
    val ctx = freshCtx()

    def deal(id: String, n: Int, created: String, status: String, reject: String,
             tGmv: String) =
      s"""SELECT '$id' AS deal_id, 'DL-$id' AS deal_friendly_id, 'u1' AS user_id,
         |  'BR' AS country, 'nm' AS deal_name, 'upfront' AS payment_method,
         |  10.0D AS estimated_gmv, 'VIP' AS deal_type, 0 AS self_service,
         |  0 AS ss_customer, 'InProgress' AS deal_status_group,
         |  '$status' AS deal_status, $reject AS deal_reject_reason,
         |  TIMESTAMP('$created') AS deal_created_ts,
         |  CAST('${created.take(10)}' AS DATE) AS deal_created_date,
         |  'o-$id' AS order_id, 1L AS count_customer_requests,
         |  2L AS count_customer_requests_variants, 50.0D AS ddp, 55.0D AS ddp_usd,
         |  DATE'2024-05-03' AS order_created_date, 'O-1' AS order_friendly_id,
         |  'manufacturing' AS order_current_status, 1.0D AS total_confirmed_price,
         |  2.0D AS final_gross_profit, 3.0D AS initial_gross_profit,
         |  4.0D AS final_gmv, 5.0D AS gmv_initial, 'c' AS utm_campaign,
         |  's' AS utm_source, 'm' AS utm_medium, 'src' AS source, 'ty' AS type,
         |  DATE'2024-04-28' AS first_visit_date, 'fc' AS first_utm_campaign,
         |  'fs' AS first_utm_sourceas, 'fm' AS first_utm_medium,
         |  'fsrc' AS first_source, 'ft' AS first_type, 7L AS count_visits,
         |  $n AS number_user_deal, $tGmv AS t_gmv, 'PC' AS promo_code,
         |  5.0D AS promo_code_discount, 'pct' AS promo_code_type""".stripMargin
    ctx.warehouse.createTable("fact_deals_with_requests", spark.sql(Seq(
      deal("DA", 1, "2024-05-01 10:00:00", "InProgress", "CAST(NULL AS STRING)",
        "CAST(NULL AS TIMESTAMP)"),
      deal("DB", 2, "2024-05-10 10:00:00", "Other", "'Lost'",
        "TIMESTAMP('2024-05-12 00:00:00')"),
      deal("DT", 3, "2024-05-11 10:00:00", "Test", "CAST(NULL AS STRING)",
        "CAST(NULL AS TIMESTAMP)")).mkString("\nUNION ALL\n")))

    // DA matches via BOTH arms (small-deal ProcurementConfirmation earlier,
    // PaymentToMerchant later) — MIN date must win; DB has only a
    // non-matching row → falls to the t_gmv presence fallback
    ctx.warehouse.createTable("fact_deals_status_history", spark.sql(
      """SELECT 'DA' AS deal_id, 'yProcurementConfirmation' AS status_name_small_deal,
        |  'other' AS status_name, TIMESTAMP('2024-05-02 09:00:00') AS event_ts_msk
        |UNION ALL
        |SELECT 'DA', 'other', 'xPaymentToMerchant', TIMESTAMP('2024-05-03 11:00:00')
        |UNION ALL
        |SELECT 'DB', 'nothing', 'nothing', TIMESTAMP('2024-05-04 00:00:00')""".stripMargin))

    ctx.warehouse.createTable("ss_users_table", spark.sql(
      "SELECT 'u1' AS user_id, 'C1' AS cnpj, 'A' AS questionnaire_grade"))

    // s0: pre-2024-04-06 (filtered); s1/s2 straddle DA (nearest-preceding =
    // s2 desktop); s3 is AFTER DA (join-excluded) but nearest for DB (mobile)
    ctx.warehouse.createTable("ss_events_startsession", spark.sql(
      """SELECT 'u1' AS user_id, DATE'2024-04-01' AS event_msk_date,
        |  'android' AS osType, TIMESTAMP('2024-04-01 09:00:00') AS event_ts_msk
        |UNION ALL
        |SELECT 'u1', DATE'2024-04-30', 'android', TIMESTAMP('2024-04-30 09:00:00')
        |UNION ALL
        |SELECT 'u1', DATE'2024-05-01', 'windows', TIMESTAMP('2024-05-01 08:00:00')
        |UNION ALL
        |SELECT 'u1', DATE'2024-05-02', 'ios', TIMESTAMP('2024-05-02 12:00:00')
        |UNION ALL
        |SELECT 'u1', DATE'2024-05-02', CAST(NULL AS STRING), TIMESTAMP('2024-05-02 13:00:00')""".stripMargin))

    val model = SqlTemplater.sqlModelAuto("marketing_deals_with_orders", sql)
    assert(model.fileFormat == "delta")
    assert(model.deps.toSet == Set("fact_deals_with_requests",
      "fact_deals_status_history", "ss_users_table", "ss_events_startsession"))

    for ((n, st) <- new DagRunner(Seq(model)).run(ctx,
        selectors = Seq("marketing_deals_with_orders")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val out = ctx.ref("marketing_deals_with_orders")
    val rows = out.selectExpr("deal_id", "cnpj", "questionnaire_grade",
      "device_type", "full_deal_status", "first_visit_deal_flg",
      "is_current_week", "CAST(first_deal_created_date AS STRING)",
      "CAST(deals_delta_day AS INT)", "first_deal_id",
      "CAST(day_after_previous_deal AS INT)", "previous_deal_days_group",
      "achived_payment", "CAST(achieved_paid_date AS STRING)")
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(rows.keySet == Set("DA", "DB"), s"Test deal must be filtered: ${rows.keySet}")

    val hs = " "
    // DA: desktop via the 05-01 08:00 session (the 05-02 one is after deal
    // creation); first deal; paid via the status history (MIN date 05-02)
    assert(rows("DA") == Seq("DA", "C1", "A", "desktop", "InProgress",
      hs * 2 + "first week", 0, "2024-05-01", 0, "DA",
      null, "a.First_Deal", 1, "2024-05-02 00:00:00"), rows("DA").toString)
    // DB: mobile via the 05-02 ios session; 9 days after DA → c.Two_Week;
    // status:reject concat; paid only through t_gmv presence
    assert(rows("DB") == Seq("DB", "C1", "A", "mobile", "Other:Lost",
      hs * 3 + "first month", 0, "2024-05-01", 9, "DA",
      9, "c.Two_Week", 1, "2024-05-12 00:00:00"), rows("DB").toString)
  }
}
