package graft

import graft.runtime._

/** Grows the verbatim model roster into the three thinnest domains —
  * engagement, customer_routing, pulse (r17; roster 104 → ~113). Every
  * model file is read from /root/reference at test runtime and executed
  * through the full pipeline over hand-planted fixtures with hand-computed
  * expected cells. Headline semantics per file are on the VERBATIM.md rows.
  */
class ThinDomainsRealSpec extends SparkSpec {
  import spark.implicits._

  private def refModel(name: String, rel: String): Model =
    SqlTemplater.sqlModelAuto(name, java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"/root/reference/models/spark/$rel")))

  private def run(ctx: Ctx, models: Seq[Model],
                  vars: Map[String, String] = null): Unit =
    new DagRunner(models).run(if (vars == null) ctx else ctx.copy(vars = vars),
        selectors = models.map(_.name))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

  test("REAL engagement/segments/frequent_buyers.sql + regular_buyers.sql: " +
    "SCD2 range filter, USING join, LEFT SEMI device gate, segment meta") {
    val ctx = freshCtx(vars = Map("start_date_ymd" -> "2024-03-01"))
    val frq = refModel("frequent_buyers", "engagement/segments/frequent_buyers.sql")
    val reg = refModel("regular_buyers", "engagement/segments/regular_buyers.sql")
    // segment-upload meta rides through config verbatim
    assert(frq.meta.get("segment_name").contains("frq_buyers"))
    assert(reg.meta.get("segment_name").contains("reg_buyers"))

    // u1: open Frequent range on 2024-03-01; u2: range EXPIRED by then;
    // u3: Regular buyer (other segment); u4: Frequent but its device is
    // NOT in dim_device_min -> LEFT SEMI drops it
    ctx.warehouse.createTable("user_segments", spark.sql(
      """SELECT 'u1' AS real_user_id, 'Frequent buyers' AS user_segment,
        |  DATE'2024-02-01' AS effective_ts, DATE'2024-04-01' AS next_effective_ts
        |UNION ALL SELECT 'u2', 'Frequent buyers', DATE'2024-01-01', DATE'2024-02-01'
        |UNION ALL SELECT 'u3', 'Regular buyers', DATE'2024-02-01', DATE'2024-04-01'
        |UNION ALL SELECT 'u4', 'Frequent buyers', DATE'2024-02-01', DATE'2024-04-01'
        |""".stripMargin))
    ctx.warehouse.createTable("link_device_real_user", spark.sql(
      """SELECT 'u1' AS real_user_id, 'd1' AS device_id
        |UNION ALL SELECT 'u2', 'd2' UNION ALL SELECT 'u3', 'd3'
        |UNION ALL SELECT 'u4', 'd4'""".stripMargin))
    ctx.sources.register("mart", "dim_device_min")(s =>
      s.sql("SELECT 'd1' AS device_id UNION ALL SELECT 'd2' UNION ALL SELECT 'd3'"))

    run(ctx, Seq(frq, reg))
    assert(ctx.ref("frequent_buyers").as[String].collect().toSet == Set("d1"))
    assert(ctx.ref("regular_buyers").as[String].collect().toSet == Set("d3"))
  }

  test("REAL engagement/device_counter_active_days.sql: backticked `type` " +
    "filter, incremental insert_overwrite window, global ORDER BY sink") {
    val ctx = freshCtx(vars = Map(
      "start_date_ymd" -> "2024-03-02", "end_date_ymd" -> "2024-03-03"))
    val m = refModel("device_counter_active_days",
      "engagement/device_counter_active_days.sql")
    assert(m.materialization == Materialization.IncrementalInsertOverwrite(
      Seq("partition_date_msk")))

    def plant(d1Count: Int): Unit =
      ctx.sources.register("mart", "device_events")(s => s.sql(
        (Seq.fill(d1Count)(
          "SELECT 'dA' AS device_id, DATE'2024-03-01' AS partition_date, 'pushEnabled' AS type") ++
          Seq(
            "SELECT 'dA', DATE'2024-03-02', 'pushEnabled'",
            "SELECT 'dA', DATE'2024-03-02', 'supportChatOpen'",
            "SELECT 'dB', DATE'2024-03-02', 'orderParcelOpen'",
            // filtered type never counts
            "SELECT 'dB', DATE'2024-03-02', 'productOpen'"))
          .mkString("\nUNION ALL\n")))

    plant(d1Count = 2)
    run(ctx, Seq(m))
    def rows() = ctx.ref("device_counter_active_days")
      .selectExpr("device_id", "CAST(partition_date_msk AS STRING)",
        "event_type", "count")
      .as[(String, String, String, Long)].collect().toSet
    assert(rows() == Set(
      ("dA", "2024-03-01", "pushEnabled", 2L),
      ("dA", "2024-03-02", "pushEnabled", 1L),
      ("dA", "2024-03-02", "supportChatOpen", 1L),
      ("dB", "2024-03-02", "orderParcelOpen", 1L)), rows().toString)

    // incremental: the [03-02, 03-03) window recomputes; 03-01 SURVIVES at
    // its old count even though the source now says 5
    plant(d1Count = 5)
    run(ctx, Seq(m))
    assert(rows() == Set(
      ("dA", "2024-03-01", "pushEnabled", 2L),
      ("dA", "2024-03-02", "pushEnabled", 1L),
      ("dA", "2024-03-02", "supportChatOpen", 1L),
      ("dB", "2024-03-02", "orderParcelOpen", 1L)), rows().toString)
  }

  test("REAL customer_routing/web/device_from_ads_landing_pages.sql: " +
    "FIRST() over the MSK day (+3h shift), web-os filter, DISTRIBUTE BY") {
    val ctx = freshCtx()
    val m = refModel("device_from_ads_landing_pages",
      "customer_routing/web/device_from_ads_landing_pages.sql")
    assert(m.meta.get("full_reload_on").contains("6"))

    // d1: 19:00 UTC = 22:00 MSK (day 03-01) and 22:00/23:00 UTC = 01:00/
    // 02:00 MSK (day 03-02) — the +3h shift splits them into two MSK days;
    // within 03-02 the 22:00 UTC event wins FIRST(). The ios row is dropped.
    ctx.sources.register("ads", "web_analytics_pageviews_with_segments")(s =>
      s.sql(
        """SELECT 'd1' AS device_id, 'u1' AS real_user_id,
          |  DATE'2024-03-01' AS partition_date, 'landing' AS page_type,
          |  'google' AS source, 'cpc' AS medium, 'camp1' AS campaign,
          |  'search' AS campaign_type,
          |  TIMESTAMP'2024-03-01 19:00:00' AS event_ts_utc, 'mobileWeb' AS os
          |UNION ALL SELECT 'd1', 'u1', DATE'2024-03-01', 'product', 'fb',
          |  'social', 'camp2', 'feed', TIMESTAMP'2024-03-01 22:00:00', 'desktopWeb'
          |UNION ALL SELECT 'd1', 'u1', DATE'2024-03-01', 'cart', 'tiktok',
          |  'video', 'camp3', 'ads', TIMESTAMP'2024-03-01 23:00:00', 'desktopWeb'
          |UNION ALL SELECT 'd2', 'u2', DATE'2024-03-01', 'landing', 'x', 'y',
          |  'z', 'w', TIMESTAMP'2024-03-01 12:00:00', 'ios'
          |""".stripMargin))

    run(ctx, Seq(m))
    val got = ctx.ref("device_from_ads_landing_pages")
      .selectExpr("device_id", "first_page_type", "first_source")
      .as[(String, String, String)].collect().toSet
    // two MSK days -> two distinct (first_page_type, first_source) rows
    assert(got == Set(("d1", "landing", "google"), ("d1", "product", "fb")),
      got.toString)
  }

  test("REAL pulse/fact_user_activity.sql: RLIKE path gate, response-code " +
    "band, UA blocklist, auth-device inner join, incremental window") {
    val ctx = freshCtx(vars = Map(
      "start_date_ymd" -> "2024-03-02", "end_date_ymd" -> "2024-03-03"))
    val m = refModel("fact_user_activity", "pulse/fact_user_activity.sql")

    def bf(dev: String, path: String, code: Int, ua: String, d: String) =
      s"""SELECT DATE'$d' AS partition_date, 'r-$dev-$code' AS request_id,
         |  TIMESTAMP'$d 10:00:00' AS published_at, '$dev' AS device_id,
         |  'BR' AS country, 'sp' AS city, '$ua' AS user_agent,
         |  '$path' AS request_path, $code AS response_code""".stripMargin
    ctx.sources.register("threat", "bot_factors_joompro")(s => s.sql(Seq(
      bf("d1", "/dashboard/home", 200, "Mozilla", "2024-03-01"),
      bf("d1", "/dashboard/kpi", 204, "Mozilla", "2024-03-01"),
      bf("d1", "/dashboard/x", 404, "Mozilla", "2024-03-01"), // code out of band
      bf("d1", "/settings", 200, "Mozilla", "2024-03-01"),    // path fails RLIKE
      bf("d1", "/dashboard/y", 200,
        "GoogleStackdriverMonitoring-UptimeChecks(https://cloud.google.com/monitoring)",
        "2024-03-01"),                                        // UA blocklisted
      bf("d9", "/dashboard/z", 200, "Mozilla", "2024-03-01")  // no auth user
    ).mkString("\nUNION ALL\n")))
    ctx.sources.register("joompro_mart", "auth_proxy_dim_devices")(s =>
      s.sql("""SELECT 'u1' AS auth_user_id, 'd1' AS device_id
              |UNION ALL SELECT CAST(NULL AS STRING), 'd9'""".stripMargin))

    run(ctx, Seq(m))
    val got = ctx.ref("fact_user_activity")
      .selectExpr("request_id", "user_id").as[(String, String)].collect().toSet
    assert(got == Set(("r-d1-200", "u1"), ("r-d1-204", "u1")), got.toString)
  }

  test("REAL pulse/pulse_pro_devices.sql: three-way identity resolution " +
    "(device / phone / users_collection) with ARRAY_AGG provenance") {
    val ctx = freshCtx()
    val m = refModel("pulse_pro_devices", "pulse/pulse_pro_devices.sql")

    // the ref'd activity fact: pulse users' devices
    ctx.warehouse.createTable("fact_user_activity", spark.sql(
      """SELECT 'p1' AS user_id, 'dev1' AS device_id
        |UNION ALL SELECT 'p2', 'dev2'""".stripMargin))
    // pro-side device events: dev1 maps to PRO1 (pt-br page, no gclid);
    // dev2's only event has a gclid URL -> excluded
    ctx.sources.register("b2b_mart", "device_events")(s => s.sql(
      """SELECT 'dev1' AS device_id, '2024-05-01' AS partition_date,
        |  'sessionStart' AS type,
        |  NAMED_STRUCT('pageUrl', 'https://x.com/pt-br/home') AS payload,
        |  NAMED_STRUCT('userId', 'PRO1') AS user
        |UNION ALL SELECT 'dev2', '2024-05-01', 'sessionStart',
        |  NAMED_STRUCT('pageUrl', 'https://x.com/pt-br/home?gclid=1'),
        |  NAMED_STRUCT('userId', 'PRO2')""".stripMargin))
    // phone credential feeds: p1 shares phone 111 with PRO1 (a SECOND
    // source for the same pair); p3 matches PRO3 by phone only
    ctx.sources.register("mongo", "b2b_core_analytics_phone_credentials_daily_snapshot")(s =>
      s.sql("""SELECT 'p1' AS uid, '111' AS _id
              |UNION ALL SELECT 'p3', '333'""".stripMargin))
    ctx.sources.register("mongo", "b2b_core_phone_credentials_daily_snapshot")(s =>
      s.sql("""SELECT 'PRO1' AS uid, '111' AS _id
              |UNION ALL SELECT 'PRO3', '333'""".stripMargin))
    // explicit users-collection link
    ctx.sources.register("mongo", "b2b_core_analytics_users_extras_daily_snapshot")(s =>
      s.sql("SELECT 'p4' AS _id, 'PRO4' AS joomProID"))

    run(ctx, Seq(m))
    val got = ctx.ref("pulse_pro_devices")
      .selectExpr("pulse_user_id", "pro_user_id", "array_sort(sources)")
      .as[(String, String, Seq[String])].collect().toSet
    assert(got == Set(
      ("p1", "PRO1", Seq("device", "phone")),
      ("p3", "PRO3", Seq("phone")),
      ("p4", "PRO4", Seq("users_collection"))), got.toString)
  }

  test("REAL customer_routing/web/sales_data_daily.sql: promo-title " +
    "SPLIT_PART parsing, calendar range join, CURRENT_DATE source window") {
    val ctx = freshCtx()
    val m = refModel("sales_data_daily", "customer_routing/web/sales_data_daily.sql")
    assert(m.materialization == Materialization.IncrementalInsertOverwrite(
      Seq("partition_date_msk")))

    // all dates relative to CURRENT_DATE (the model's source window is
    // [today-240d, today)); the sale runs [today-7, today-2) = 5 days
    ctx.sources.register("mart", "star_order_2020")(s => s.sql(
      """SELECT CURRENT_DATE() - INTERVAL 5 DAY AS partition_date,
        |  'o1' AS order_id, 'br' AS shipping_country, 'IOS' AS os_type,
        |  CAST(100.1234 AS DOUBLE) AS gmv_initial, CAST(90.0 AS DOUBLE) AS gmv_final
        |UNION ALL SELECT CURRENT_DATE() - INTERVAL 5 DAY, 'o2', 'br', 'IOS', 50.0, 45.0
        |UNION ALL SELECT CURRENT_DATE() - INTERVAL 20 DAY, 'o3', 'br', 'IOS', 70.0, 60.0
        |UNION ALL SELECT CURRENT_DATE() - INTERVAL 300 DAY, 'o4', 'br', 'IOS', 99.0, 80.0
        |""".stripMargin))
    // promo A: "spring: mega sale" [today-7, today-2) -> period 5, parses
    // through the ':' branch; promo B is a Weekly Promotion -> excluded
    ctx.sources.register("mart", "promotions")(s => s.sql(
      """SELECT 'spring: mega sale' AS promo_title,
        |  CAST(CURRENT_DATE() - INTERVAL 7 DAY AS TIMESTAMP) AS promo_start_time_utc,
        |  CAST(CURRENT_DATE() - INTERVAL 2 DAY AS TIMESTAMP) AS promo_end_time_utc
        |UNION ALL SELECT 'Weekly Promotion 12',
        |  CAST(CURRENT_DATE() - INTERVAL 30 DAY AS TIMESTAMP),
        |  CAST(CURRENT_DATE() - INTERVAL 25 DAY AS TIMESTAMP)
        |""".stripMargin))

    run(ctx, Seq(m))
    val got = ctx.ref("sales_data_daily")
      .selectExpr("CAST(partition_date_msk AS STRING)", "platform", "sale_type",
        "sale_period", "gmv_initial")
      .as[(String, String, String, Option[Long], Double)].collect().toSet
    val d5 = java.time.LocalDate.now().minusDays(5).toString
    val d20 = java.time.LocalDate.now().minusDays(20).toString
    val saleStart = java.time.LocalDate.now().minusDays(7)
    val saleType = s"$saleStart-${java.time.LocalDate.now().minusDays(3)}"
    assert(got == Set(
      // inside the promo window: sale_type = "start-(end-1d)", gmv summed
      // over both orders, ROUND(,3) applied upstream of the sum
      (d5, "ios", saleType, Some(5L), 150.123),
      (d20, "ios", "no_sales", None, 70.0)), got.toString)
  }

  test("REAL customer_routing/web/sales_data_overview.sql: 6-stage " +
    "gaps-and-islands window cascade over the daily model (view)") {
    val ctx = freshCtx()
    val m = refModel("sales_data_overview", "customer_routing/web/sales_data_overview.sql")
    assert(m.materialization == Materialization.View)

    // hand-shaped daily rows: constant gmv on every no_sales day before
    // (10.0) and after (6.0) the single 5-day sale, so whichever 7-day /
    // 5-day window the value-partition plumbing lands on, the averages are
    // exactly 10 and 6; sale days carry 50 each
    val rows = new scala.collection.mutable.ArrayBuffer[String]
    for (d <- 1 to 9)   // no_sales run-up: Mar 1..9
      rows += s"SELECT DATE'2024-03-0$d' AS partition_date_msk, 'web' AS platform, 'no_sales' AS sale_type, CAST(NULL AS DATE) AS start_of_sale, CAST(NULL AS DATE) AS end_of_sale, CAST(NULL AS INT) AS sale_period, CAST(10.0 AS DOUBLE) AS gmv_initial"
    for (d <- 10 to 14) // the sale: Mar 10..14 (period 5)
      rows += s"SELECT DATE'2024-03-$d', 'web', '2024-03-10-2024-03-14', DATE'2024-03-10', DATE'2024-03-15', 5, 50.0"
    for (d <- 15 to 25) // no_sales tail: Mar 15..25
      rows += s"SELECT DATE'2024-03-$d', 'web', 'no_sales', CAST(NULL AS DATE), CAST(NULL AS DATE), CAST(NULL AS INT), 6.0"
    ctx.warehouse.createTable("sales_data_daily", spark.sql(rows.mkString("\nUNION ALL\n")))

    run(ctx, Seq(m))
    val got = ctx.ref("sales_data_overview")
      .selectExpr("platform", "sale_type", "CAST(start_of_sale AS STRING)",
        "sale_period", "sale_avg", "avg_gmv_before_sale", "avg_gmv_after_sale",
        "sale_profit", "is_there_hangover")
      .as[(String, String, String, Long, Double, Double, Double, Double, Int)]
      .collect().toSeq
    // one sale row survives the no_sales filter; sale_avg = 5 days x the
    // 50-average = 250; before/after averages are the planted constants;
    // profit = 250 - 10*5 = 200; before(10) > after(6) -> hangover
    assert(got == Seq(("web", "2024-03-10-2024-03-14", "2024-03-10",
      5L, 250.0, 10.0, 6.0, 200.0, 1)), got.toString)
  }

  test("REAL pulse/analytics_subscriptions.sql: POSEXPLODE(ARRAY_REPEAT) " +
    "payment schedule, nested packageSnapshot, currency spine join") {
    val ctx = freshCtx()
    val m = refModel("analytics_subscriptions", "pulse/analytics_subscriptions.sql")

    // one cancelled monthly subscription created 2024-03-01, cancelled
    // 2024-05-01 -> MONTHS_BETWEEN = 2.0, CEIL(2/1)=2 payments at months
    // 0 and 1; price 30 BRL (micros), package price 35; a second row with
    // empty payhubSubsciptionId must be filtered out
    def subRow(id: String, payhub: String) =
      s"""SELECT '$id' AS _id, '$payhub' AS payhubSubsciptionId, 'u1' AS usedId,
         |  CAST(1709251200000 AS BIGINT) AS createdTimeMs, -- 2024-03-01 00:00 UTC
         |  NAMED_STRUCT('_id', 'pkg_diamond_1', 'duration',
         |    NAMED_STRUCT('unit', 'month', 'value', 1),
         |    'price', NAMED_STRUCT('amount', CAST(35000000 AS BIGINT), 'ccy', 'BRL')) AS packageSnapshot,
         |  NAMED_STRUCT('amount', CAST(30000000 AS BIGINT), 'ccy', 'BRL') AS price,
         |  NAMED_STRUCT('_id', 'promo1', 'code', 'SPRING',
         |    'discount', NAMED_STRUCT('fixed', NAMED_STRUCT('amount', CAST(5000000 AS BIGINT)),
         |      'percentage', NAMED_STRUCT('percentage', CAST(NULL AS DOUBLE)))) AS promocodeSnapshot,
         |  'cancelled' AS status,
         |  CAST(1714521600000 AS BIGINT) AS cancellationTime, -- 2024-05-01
         |  CAST(NULL AS BIGINT) AS nextChargeAttemptTime""".stripMargin
    ctx.sources.register("mongo", "b2b_core_analytics_subscriptions_daily_snapshot")(s =>
      s.sql(subRow("s1", "ph1") + "\nUNION ALL\n" + subRow("s2", "")))
    // BRL spine covering 2024-03-01: rate micros-per-unit 5.0 -> 1000000/5.0
    ctx.sources.register("mart", "dim_currency_rate")(s => s.sql(
      """SELECT CAST(5.0 AS DOUBLE) AS rate, DATE'2024-02-01' AS effective_date,
        |  DATE'2024-03-05' AS next_effective_date, 'BRL' AS currency_code
        |UNION ALL SELECT 4.0, DATE'2024-03-05', DATE'2024-06-01', 'USD'
        |""".stripMargin))

    run(ctx, Seq(m))
    val got = ctx.ref("analytics_subscriptions")
      .selectExpr("payment_id", "time_payed", "CAST(payment_created_date AS STRING)",
        "package_type", "package_duration", "package_price", "price",
        "discount_fixed", "subscribtion_months", "rate")
      .as[(String, Int, String, String, Int, Double, Double, Double, Double, Double)]
      .collect().toSet
    assert(got == Set(
      ("s1", 0, "2024-03-01", "Diamond", 1, 35.0, 30.0, 5000000.0, 2.0, 200000.0),
      ("s1", 1, "2024-04-01", "Diamond", 1, 35.0, 30.0, 5000000.0, 2.0, 200000.0)),
      got.toString)
  }

  test("REAL pulse/pro_pulse_funnel.sql: dual first/last-click attribution " +
    "UNION with order-gated utm selection") {
    val ctx = freshCtx()
    val m = refModel("pro_pulse_funnel", "pulse/pro_pulse_funnel.sql")

    // u1's deal created 2024-03-10 and paid; two pre-order utm visits
    // (Feb: google, Mar 5: meta) -> utm_labels_before_order picks the
    // LATEST pre-order visit (meta); utm_labels (last click over utm
    // interactions) picks its own latest pre-order visit (bing)
    ctx.warehouse.createTable("fact_deals_with_requests", spark.sql(
      """SELECT 'u1' AS user_id, DATE'2024-03-10' AS deal_created_date,
        |  'ord1' AS order_id, CAST(500.0 AS DOUBLE) AS final_gmv,
        |  CAST(NULL AS STRING) AS deal_reject_reason, 'deal1' AS deal_id,
        |  1 AS number_user_deal""".stripMargin))
    ctx.warehouse.createTable("fact_marketing_deals_interactions", spark.sql(
      """SELECT 'google' AS utm_source, 'cpc' AS utm_medium, 'g1' AS utm_campaign,
        |  'deal1' AS deal_id, 'u1' AS user_id, DATE'2024-02-20' AS visit_date,
        |  TIMESTAMP'2024-02-20 10:00:00' AS visit_ts_msk
        |UNION ALL SELECT 'meta', 'social', 'm1', 'deal1', 'u1',
        |  DATE'2024-03-05', TIMESTAMP'2024-03-05 10:00:00'""".stripMargin))
    ctx.warehouse.createTable("fact_marketing_utm_interactions", spark.sql(
      """SELECT 'bing' AS utm_source, 'cpc' AS utm_medium, 'b1' AS utm_campaign,
        |  'u1' AS user_id, DATE'2024-03-01' AS visit_date""".stripMargin))
    ctx.warehouse.createTable("fact_issues_statuses", spark.sql(
      """SELECT 'deal1' AS entity_id, 'PaymentToMerchant' AS status,
        |  TIMESTAMP'2024-03-12 09:00:00' AS event_ts_msk""".stripMargin))
    ctx.warehouse.createTable("ss_users_table", spark.sql(
      """SELECT 'u1' AS user_id, '111' AS phone_number,
        |  TIMESTAMP'2024-02-01 00:00:00' AS registration_start,
        |  'direct' AS utm_source, 'none' AS utm_medium, 'none' AS utm_campaign,
        |  1 AS deals, CAST(500.0 AS DOUBLE) AS gmv, 1 AS user_MQL, 1 AS user_SQL,
        |  'inbound' AS Marketing_Lead_Type, DATE'2024-02-02' AS mql_msk_date,
        |  DATE'2024-02-03' AS sql_msk_date""".stripMargin))

    run(ctx, Seq(m))
    val got = ctx.ref("pro_pulse_funnel")
      .selectExpr("user_id", "attribution", "utm_source", "CAST(segment AS STRING)",
        "gmv_total", "orders", "paid")
      .as[(String, String, String, String, Double, Long, Boolean)].collect().toSet
    assert(got == Set(
      // first-click leg: the USER row's own utm + registration segment
      ("u1", "first click", "direct", "2024-02-01", 500.0, 1L, true),
      // last-click leg: COALESCE(pre-order deals-utm, utm-interactions) ->
      // the deals-interaction one (meta) wins; segment = utm visit date
      ("u1", "last click", "meta", "2024-03-01", 500.0, 1L, true)), got.toString)
  }
}
