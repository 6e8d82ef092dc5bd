package graft

import graft.runtime._

/** Three more reference models executed VERBATIM, each the sole (or
  * canonical) instance of an archetype not yet run from its file:
  *
  *  - models/spark/mart/fact_table_update.sql — the corpus's ONLY
  *    incremental_strategy='append' model: per-run bookkeeping row with
  *    NOW(), two vars, and two-level partitioning ['table_name','partition_date'];
  *  - models/spark/points/points_redemptions.sql — ObjectId→timestamp
  *    extraction (CONV(SUBSTR(_id,1,8),16,10) seconds hex), Moscow-time
  *    date derivation, LATERAL VIEW EXPLODE(MAP_VALUES(...)) over a
  *    map-of-struct, and a ref() to a SEED — the engine's seed loader and
  *    the SQL-file pipeline composed end-to-end on the reference's own
  *    seed_points_groups_mapping.csv;
  *  - models/spark/b2b_mart/ss/ss_events_by_session.sql — TO_JSON(MAP_FILTER(
  *    MAP(...), lambda)), FROM_JSON landing extraction inside COLLECT_LIST
  *    of structs, COLLECT_SET of structs, alias-in-HAVING fake-user filter,
  *    backticked `user` column, a raw `threat.bot_devices_joompro` catalog
  *    name, and 30-min gap sessionization with asc/desc ROW_NUMBER
  *    first/last extraction.
  */
class MoreArchetypesRealSpec extends SparkSpec {
  import spark.implicits._

  private def s(v: String): String = if (v == null) "CAST(NULL AS STRING)" else s"'$v'"

  private def refModel(name: String, rel: String): Model =
    SqlTemplater.sqlModelAuto(name, java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"/root/reference/models/spark/$rel")))

  test("REAL fact_table_update.sql: append-strategy bookkeeping rows accumulate per run") {
    val ctx = freshCtx(vars = Map(
      "table_name" -> "gold_orders", "start_date_ymd" -> "2026-08-01"))
    val model = refModel("fact_table_update", "mart/fact_table_update.sql")
    assert(model.materialization == Materialization.IncrementalAppend(
      Seq("table_name", "partition_date")))
    assert(model.tags.contains("manual"))

    def run(vars: Map[String, String]): Unit =
      new DagRunner(Seq(model)).run(ctx.copy(vars = vars),
        selectors = Seq("fact_table_update"))
        .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    run(ctx.vars)
    run(Map("table_name" -> "gold_regions", "start_date_ymd" -> "2026-08-02"))

    val rows = ctx.ref("fact_table_update")
      .selectExpr("table_name", "CAST(partition_date AS STRING)",
        "update_ts IS NOT NULL")
      .as[(String, String, Boolean)].collect().toSet
    // append strategy: the first run's row SURVIVES the second run
    assert(rows == Set(
      ("gold_orders", "2026-08-01", true),
      ("gold_regions", "2026-08-02", true)), rows.toString)
  }

  test("REAL points_redemptions.sql: ObjectId epoch, MAP_VALUES explode, seed ref") {
    val ctx = freshCtx(vars = Map("end_date_ymd" -> "2024-07-01"))
    // the reference's own seed CSV through the engine's seed loader
    Seeds.load(ctx, "seed_points_groups_mapping",
      "/root/reference/seeds/seed_points_groups_mapping.csv")

    // ObjectId prefix: 1717243200 = 2024-06-01 12:00:00 UTC -> 15:00 MSK
    val oid = java.lang.Long.toHexString(1717243200L) + "a" * 16
    ctx.sources.register("mongo", "points_points_transactions_daily_snapshot")(sp => sp.sql(
      s"""SELECT '$oid' AS _id, 'u1' AS userId, 'PURCHASE' AS type,
         |  named_struct('isDistributed', true, 'byTx', map(
         |    'tx1', named_struct('txType', 'cashback', 'amountUSD', 2500000L),
         |    'tx2', named_struct('txType', 'adminCompensation', 'amountUSD', 1000000L))) AS distribution
         |UNION ALL
         |SELECT '$oid', 'u2', 'cashout',
         |  named_struct('isDistributed', true, 'byTx', map(
         |    'tx3', named_struct('txType', 'mysteryBonus', 'amountUSD', 4000000L)))
         |UNION ALL -- wrong type: filtered
         |SELECT '$oid', 'u3', 'earn',
         |  named_struct('isDistributed', true, 'byTx', map(
         |    'tx4', named_struct('txType', 'cashback', 'amountUSD', 9000000L)))
         |UNION ALL -- not distributed: filtered
         |SELECT '$oid', 'u4', 'purchase',
         |  named_struct('isDistributed', false, 'byTx', map(
         |    'tx5', named_struct('txType', 'cashback', 'amountUSD', 9000000L)))""".stripMargin))

    val model = refModel("points_redemptions", "points/points_redemptions.sql")
    assert(model.deps.contains("seed_points_groups_mapping"))
    new DagRunner(Seq(model)).run(ctx, selectors = Seq("points_redemptions"))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    val rows = ctx.ref("points_redemptions")
      .selectExpr("CAST(date_msk AS STRING)", "user_id", "points_type",
        "points_redemption_type", "points_group", "points_redeemed_usd")
      .as[(String, String, String, String, String, Double)].collect().toSet
    // hand-tally: amounts are micro-USD; LOWER() maps 'PURCHASE'->'purchase';
    // mysteryBonus is absent from the seed -> 'Other'
    assert(rows == Set(
      ("2024-06-01", "u1", "cashback", "purchase", "Marketing", 2.5),
      ("2024-06-01", "u1", "adminCompensation", "purchase", "Compensation", 1.0),
      ("2024-06-01", "u2", "mysteryBonus", "cashout", "Other", 4.0)), rows.toString)
  }

  test("REAL onfy_unique_querying_devices.sql: CUBE + APPROX_COUNT_DISTINCT + grouping HAVING") {
    val ctx = freshCtx(vars = Map(
      "start_date_ymd" -> "2024-05-01", "end_date_ymd" -> "2024-05-02"))
    ctx.sources.register("onfy_mart", "auth_proxy_devices_without_bots")(sp => sp.sql(
      """SELECT 'd1' AS device_id, false AS is_bot
        |UNION ALL SELECT 'd2', false
        |UNION ALL SELECT 'db', true""".stripMargin))
    ctx.sources.register("threat", "bot_factors_onfy")(sp => sp.sql(
      """SELECT 'd1' AS device_id, TIMESTAMP'2024-05-01 10:00:30' AS published_at,
        |  'att' AS isp, 'ff' AS user_agent
        |UNION ALL SELECT 'd2', TIMESTAMP'2024-05-01 10:01:00', 'att', 'chrome'
        |UNION ALL SELECT 'd1', TIMESTAMP'2024-05-01 10:07:00', 'att', 'ff'
        |UNION ALL SELECT 'db', TIMESTAMP'2024-05-01 10:00:00', 'att', 'ff'""".stripMargin))

    val model = refModel("onfy_unique_querying_devices",
      "onfy/onfy_unique_querying_devices.sql")
    new DagRunner(Seq(model)).run(ctx, selectors = Seq("onfy_unique_querying_devices"))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    val rows = ctx.ref("onfy_unique_querying_devices")
      .selectExpr("frequency", "CAST(ts AS STRING)", "isp", "user_agent",
        "unique_querying_devices")
      .as[(String, String, Option[String], Option[String], Long)].collect().toSet
    // hand-tally: CUBE(frequency, ts, isp, user_agent) emits 16 grouping
    // sets; HAVING keeps the 4 where frequency AND ts are grouped. The bot
    // device db is excluded by the USING join. Bucketing floors to 5 min:
    // 10:00:30 and 10:01:00 share the 10:00 bucket, 10:07 -> 10:05.
    val t0 = "2024-05-01 10:00:00"; val t5 = "2024-05-01 10:05:00"
    assert(rows == Set(
      ("5m", t0, Some("att"), Some("ff"), 1L),
      ("5m", t0, Some("att"), Some("chrome"), 1L),
      ("5m", t0, Some("att"), None, 2L),
      ("5m", t0, None, Some("ff"), 1L),
      ("5m", t0, None, Some("chrome"), 1L),
      ("5m", t0, None, None, 2L),
      ("5m", t5, Some("att"), Some("ff"), 1L),
      ("5m", t5, Some("att"), None, 1L),
      ("5m", t5, None, Some("ff"), 1L),
      ("5m", t5, None, None, 1L)), rows.toSeq.sortBy(_.toString).mkString("\n"))
  }

  test("REAL banners_stats.sql: named WINDOW clause, interval joins, banner attribution") {
    val ctx = freshCtx()
    val day = java.time.LocalDate.now().minusDays(10).toString
    def bev(id: String, time: String, typ: String, pzn: String, block: String): String =
      s"""SELECT 'd1' AS device_id, named_struct('osType', 'desktop') AS device,
         |  '$id' AS event_id, TIMESTAMP'$day $time' AS event_ts_cet,
         |  DATE'$day' AS partition_date_cet, '$typ' AS type,
         |  named_struct('sourceScreen', 'home', 'pzn', ${s(pzn)},
         |    'blockName', 'b1') AS payload""".stripMargin
    ctx.sources.register("onfy_mart", "device_events")(sp => sp.sql(Seq(
      bev("e1", "10:00:00", "producerBannerShown", null, "b1"),   // promo 'banner'
      bev("e2", "10:01:00", "producerBannerClicked", "Z1", "b1"), // promo = pzn
      bev("e3", "10:05:00", "productOpen", "Z1", "b1")            // the click-through
    ).mkString("\nUNION ALL\n")))
    ctx.warehouse.createTable("orders_info", spark.sql(
      s"""SELECT 'o1' AS order_id, 'd1' AS device_id,
         |  TIMESTAMP'$day 11:00:00' AS order_created_time_cet, 'Z1' AS pzn,
         |  CAST(30.0 AS DOUBLE) AS products_price, 3 AS quantity""".stripMargin))

    val model = refModel("banners_stats", "onfy/banners_stats.sql")
    new DagRunner(Seq(model)).run(ctx, selectors = Seq("banners_stats"))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    val rows = ctx.ref("banners_stats")
      .selectExpr("CAST(partition_date_cet AS STRING)", "sourceScreen",
        "promo_type", "blockName", "impressions", "clicks", "orders", "gmv",
        "packs_sold")
      .as[(String, String, String, String, Long, Long, Long, Double, Long)]
      .collect().toSet
    // hand-tally: the shown event (NULL pzn) rolls up under promo 'banner'
    // with 1 impression and no order; the clicked event attributes the
    // product open within 30 min, then order o1 within 5h on the same pzn —
    // FIRST_VALUE/MAX over the named WINDOW dedup the order to one row.
    assert(rows == Set(
      (day, "home", "banner", "b1", 1L, 0L, 0L, 0.0, 0L),
      (day, "home", "Z1", "b1", 0L, 1L, 1L, 30.0, 3L)), rows.toString)
  }

  test("REAL key_amo_status.sql (1,371 LoC): 272-branch literal UNION ALL lookup table") {
    // the corpus's second-largest file is a pure-literal CRM status
    // dictionary — no refs/sources, Cyrillic status names, one SELECT per
    // row chained by 271 UNION ALLs
    val ctx = freshCtx()
    val model = refModel("key_amo_status", "b2b_mart/key/key_amo_status.sql")
    assert(model.deps.isEmpty)
    assert(model.materialization == Materialization.Table())
    new DagRunner(Seq(model)).run(ctx, selectors = Seq("key_amo_status"))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }
    val out = ctx.ref("key_amo_status")
    assert(out.count() == 272)
    assert(out.filter($"status_id" === 57209866).selectExpr("pipeline_name", "status_name")
      .as[(String, String)].head() == (("SDR", "Неразобранное")))
    assert(out.select($"pipeline_id").distinct().count() >= 5)
  }

  test("REAL cancel_rates.sql: half-month periods via LAST_DAY arithmetic, metric-note gating") {
    val ctx = freshCtx()
    ctx.sources.register("mongo", "merchant_order")(sp => sp.sql(
      """SELECT 'MO1' AS order_id, 'M1' AS merchant_id, 'P1' AS product_id,
        |  'cancelledByMerchant' AS status,
        |  TIMESTAMP'2025-03-11 10:00:00' AS cancelled_by_merchant_time_utc,
        |  TIMESTAMP'2025-03-10 09:00:00' AS created_time_utc,
        |  named_struct('kind', 'joom') AS source
        |UNION ALL
        |SELECT 'MO2', 'M1', 'P1', 'completed', CAST(NULL AS TIMESTAMP),
        |  TIMESTAMP'2025-03-12 09:00:00', named_struct('kind', 'joom')""".stripMargin))
    ctx.sources.register("mongo", "merchant_order_order_metric_notes_daily_snapshot")(sp => sp.sql(
      """SELECT 'MO1' AS _id, named_struct('cancelRate', named_struct(
        |  'ignored', named_struct('value', false),
        |  'decision', named_struct('value', 1))) AS metrics""".stripMargin))

    // gold.merchants / gold.products / gold.merchant_categories are RAW
    // catalog reads (SURVEY data-model: the metrics map shape comes from
    // gold_orders.sql:70 metrics['cancelRate']['ignored']['value'])
    val dbLoc = TempDirs.create("graft_golddb")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS gold LOCATION '$dbLoc'")
    try {
      spark.sql("SELECT 'M1' AS merchant_id, 'CN' AS origin_name")
        .write.mode("overwrite").option("path", s"$dbLoc/merchants").saveAsTable("gold.merchants")
      spark.sql("SELECT 'P1' AS product_id, 'MC1' AS merchant_category_id")
        .write.mode("overwrite").option("path", s"$dbLoc/products").saveAsTable("gold.products")
      spark.sql(
        """SELECT 'MC1' AS merchant_category_id, 'Goods' AS business_line,
          |  'L1' AS l1_merchant_category_name, 'L2' AS l2_merchant_category_name,
          |  'L3' AS l3_merchant_category_name, 'L4' AS l4_merchant_category_name,
          |  'L5' AS l5_merchant_category_name""".stripMargin)
        .write.mode("overwrite").option("path", s"$dbLoc/merchant_categories")
        .saveAsTable("gold.merchant_categories")

      val model = refModel("cancel_rates", "merchant/cancel_rates.sql")
      new DagRunner(Seq(model)).run(ctx, selectors = Seq("cancel_rates"))
        .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

      val rows = ctx.ref("cancel_rates").selectExpr(
        "merchant_id", "CAST(period_start_date AS STRING)",
        "CAST(period_end_date AS STRING)", "origin_name", "business_line",
        "l1_merchant_category_name", "orders_count", "cancelled_count",
        "last_cancelled_order_id", "CAST(last_cancelled_time_utc AS STRING)")
        .as[(String, String, String, String, String, String, Long, Long,
          String, String)].collect().toSet
      // hand-tally: March 2025 has 31 days -> INT(31/2)=15 -> first half-month
      // period is 03-01..03-15; both orders land in it; MO1 cancelled with
      // decision 1 counts, MO2 completed does not
      assert(rows == Set(
        ("M1", "2025-03-01", "2025-03-15", "CN", "Goods", "L1", 2L, 1L,
          "MO1", "2025-03-11 10:00:00")), rows.toString)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS gold CASCADE")
    }
  }

  test("REAL analytics_payments.sql: MILLIS_TO_TS, per-day rate spine, package typing") {
    val ctx = freshCtx()
    // 2025-07-02 00:00 UTC in epoch millis; paid one hour later
    val created = 1751414400000L
    ctx.sources.register("mart", "dim_currency_rate")(sp => sp.sql(
      """SELECT 'BRL' AS currency_code, CAST(200000.0 AS DOUBLE) AS rate,
        |  DATE'2025-07-01' AS effective_date, DATE'2025-07-03' AS next_effective_date""".stripMargin))
    ctx.sources.register("mongo", "b2b_core_analytics_payments_daily_snapshot")(sp => sp.sql(
      s"""SELECT 'PAY1' AS _id, 'INT1' AS payhubPaymentIntentId, 'U1' AS usedId,
         |  ${created}L AS createdTimeMs, ${created + 3600000L}L AS paidTimeMs,
         |  named_struct('_id', 'pkg_diamond_1',
         |    'duration', named_struct('unit', 'year', 'value', 1),
         |    'price', named_struct('amount', 120000000L, 'ccy', 'BRL')) AS packageSnapshot,
         |  named_struct('amount', 100000000L, 'ccy', 'BRL') AS price,
         |  named_struct('_id', 'PC1', 'code', 'WELCOME',
         |    'discount', named_struct(
         |      'fixed', named_struct('amount', 0L),
         |      'percentage', named_struct('percentage', 10))) AS promocodeSnapshot,
         |  CAST(NULL AS STRING) AS coupon, 'paid' AS status,
         |  CAST(NULL AS STRING) AS refundPayhubId, CAST(NULL AS STRING) AS refundStatus,
         |  CAST(NULL AS BIGINT) AS refundTimeMs, 'SUB1' AS subscriptionId""".stripMargin))

    val model = refModel("analytics_payments", "pulse/analytics_payments.sql")
    new DagRunner(Seq(model)).run(ctx, selectors = Seq("analytics_payments"))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    val r = ctx.ref("analytics_payments").selectExpr(
      "payment_id", "user_id", "package_type", "package_duration",
      "CAST(package_price AS DOUBLE)", "CAST(price AS DOUBLE)", "promocode",
      "discount_percentage", "CAST(rate AS DOUBLE)",
      "CAST(paid_time AS STRING)", "CAST(paid_date AS STRING)", "payment_valid")
      .as[(String, String, String, Int, Double, Double, String, Int, Double,
        String, String, Int)].collect().toSeq
    // hand-tally: diamond package id -> 'Diamond'; 1 year -> 12 months;
    // micro-amounts /1e6; 1000000/200000 = 5.0 BRL rate on the exploded
    // per-day spine; paid within the July window and <=1 day after created
    // -> paid_time is the paid timestamp (UTC +1h)
    assert(r == Seq(("PAY1", "U1", "Diamond", 12, 120.0, 100.0, "WELCOME",
      10, 5.0, "2025-07-02 01:00:00", "2025-07-02", 1)), r.toString)
  }

  test("REAL fact_referral_purchase.sql: millis_to_ts AND millis_to_ts_msk side by side") {
    val ctx = freshCtx()
    ctx.sources.register("mart", "device_events")(sp => sp.sql(
      """SELECT DATE'2024-06-01' AS partition_date, 'd1' AS device_id,
        |  'u1' AS user_id, 1717243200000L AS event_ts,
        |  'referralPurchase' AS type,
        |  named_struct('referrerId', 'R1', 'effectiveUSD', CAST(12.5 AS DOUBLE),
        |    'orderId', 'O1', 'revenueShareType', 'standard',
        |    'productCollectionId', 'PC1', 'socialPostId', 'SP1') AS payload
        |UNION ALL
        |SELECT DATE'2024-06-01', 'd2', 'u2', 1717243200000L, 'productOpen',
        |  named_struct('referrerId', CAST(NULL AS STRING), 'effectiveUSD', CAST(NULL AS DOUBLE),
        |    'orderId', CAST(NULL AS STRING), 'revenueShareType', CAST(NULL AS STRING),
        |    'productCollectionId', CAST(NULL AS STRING), 'socialPostId', CAST(NULL AS STRING))""".stripMargin))

    val model = refModel("fact_referral_purchase", "engagement/fact_referral_purchase.sql")
    new DagRunner(Seq(model)).run(ctx, selectors = Seq("fact_referral_purchase"))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    val r = ctx.ref("fact_referral_purchase").selectExpr(
      "CAST(partition_date_msk AS STRING)", "device_id", "user_id",
      "CAST(event_ts AS STRING)", "CAST(event_ts_msk AS STRING)",
      "referrer_id", "effective_usd", "order_id")
      .as[(String, String, String, String, String, String, Double, String)]
      .collect().toSeq
    // the same epoch millis through BOTH server UDFs: UTC 12:00, MSK 15:00
    assert(r == Seq(("2024-06-01", "d1", "u1",
      "2024-06-01 12:00:00", "2024-06-01 15:00:00", "R1", 12.5, "O1")), r.toString)
  }

  test("REAL fixed_price_promotions.sql: struct-typed _id fields, 1e6 scaling") {
    val ctx = freshCtx()
    ctx.sources.register("mongo", "product_fixed_price_variant_items_v2_daily_snapshot")(sp => sp.sql(
      """SELECT named_struct('g', 'G1', 'v', 'V1') AS _id, 'P1' AS p,
        |  named_struct('amount', 2500000L, 'ccy', 'EUR') AS tP""".stripMargin))
    ctx.sources.register("mart", "promotions")(sp => sp.sql(
      """SELECT 'PR1' AS promo_id, 'Summer' AS promo_title, 'G1' AS product_group_id,
        |  'P1' AS product_id, TIMESTAMP'2024-06-01 00:00:00' AS promo_start_time_utc,
        |  TIMESTAMP'2024-06-10 00:00:00' AS promo_end_time_utc,
        |  CAST(NULL AS INT) AS discount
        |UNION ALL  -- discounted promo: excluded (fixed-price only)
        |SELECT 'PR2', 'Sale', 'G1', 'P1', TIMESTAMP'2024-06-01 00:00:00',
        |  TIMESTAMP'2024-06-10 00:00:00', 15""".stripMargin))

    val model = refModel("fixed_price_promotions",
      "category_management/fixed_promo/fixed_price_promotions.sql")
    new DagRunner(Seq(model)).run(ctx, selectors = Seq("fixed_price_promotions"))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }
    val rows = ctx.ref("fixed_price_promotions").selectExpr(
      "promo_id", "promo_title", "CAST(promo_start_date AS STRING)",
      "product_group_id", "product_id", "product_variant_id",
      "CAST(promo_price AS DOUBLE)", "currency")
      .as[(String, String, String, String, String, String, Double, String)]
      .collect().toSet
    assert(rows == Set(("PR1", "Summer", "2024-06-01", "G1", "P1", "V1", 2.5, "EUR")),
      rows.toString)
  }

  test("REAL merchant_fulfillment_time.sql: exact PERCENTILE aggregate + outlier null gate") {
    val ctx = freshCtx()
    ctx.sources.register("merchant", "order_data")(sp => sp.sql(
      """SELECT 'F1' AS friendly_id, 86400000L AS aft
        |UNION ALL SELECT 'F2', 172800000L
        |UNION ALL SELECT 'F3', 259200000L""".stripMargin))
    ctx.warehouse.createTable("gold_orders", spark.sql(
      """SELECT DATE'2024-07-01' AS order_date_msk, 'F1' AS friendly_order_id,
        |  false AS is_fbj, 'Chinese' AS origin_name, CAST(NULL AS STRING) AS refund_reason
        |UNION ALL SELECT DATE'2024-07-01', 'F2', false, 'Chinese', NULL
        |UNION ALL SELECT DATE'2024-07-01', 'F3', false, 'Chinese', NULL
        |UNION ALL SELECT DATE'2024-07-01', 'F4', false, 'Chinese', NULL -- no aft -> 9999
        |UNION ALL SELECT DATE'2024-07-01', 'F5', true, 'Chinese', NULL  -- fbj: excluded""".stripMargin))

    val model = refModel("merchant_fulfillment_time", "merchant/merchant_fulfillment_time.sql")
    new DagRunner(Seq(model)).run(ctx, selectors = Seq("merchant_fulfillment_time"))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }
    val r = ctx.ref("merchant_fulfillment_time").selectExpr(
      "CAST(order_date_msk AS STRING)", "merchant_fulfillment_time_p50",
      "merchant_fulfillment_time_p80", "merchant_fulfillment_time_p95")
      .as[(String, Option[Double], Option[Double], Option[Double])].collect().toSeq
    // hand-tally: aft days [1, 2, 3, 9999] -> exact interpolated p50 = 2.5;
    // p80 = 3 + 0.4*(9999-3) and p95 exceed the 100-day gate -> NULL
    assert(r == Seq(("2024-07-01", Some(2.5), None, None)), r.toString)
  }

  test("REAL uzum_available_products.sql: ARRAYS_OVERLAP, seed-built stopword regex, IN-subquery seeds") {
    val ctx = freshCtx()
    // both gate dictionaries are the REAL reference seeds
    Seeds.load(ctx, "uzum_stopwords", "/root/reference/seeds/uzum_stopwords.csv")
    Seeds.load(ctx, "uzum_restricted_categories",
      "/root/reference/seeds/uzum_restricted_categories.csv")

    ctx.warehouse.createTable("gold_merchants", spark.sql(
      "SELECT 'M1' AS merchant_id, 'Chinese' AS origin_name"))
    ctx.warehouse.createTable("gold_merchant_categories", spark.sql(
      """SELECT 'MC1' AS merchant_category_id, 'L1x' AS l1_merchant_category_id,
        |  'L2x' AS l2_merchant_category_id, 'L3x' AS l3_merchant_category_id,
        |  CAST(NULL AS STRING) AS l4_merchant_category_id,
        |  CAST(NULL AS STRING) AS l5_merchant_category_id""".stripMargin))
    ctx.sources.register("mart", "published_products_current")(sp => sp.sql(
      """SELECT 'P1' AS product_id, 'MC1' AS category_id, CAST(4.0 AS DOUBLE) AS rating,
        |  array(named_struct('key', 'harmless')) AS labels
        |UNION ALL -- P3 carries a banned label -> ARRAYS_OVERLAP excludes it
        |SELECT 'P3', 'MC1', 4.0, array(named_struct('key', 'labubu'))
        |UNION ALL
        |SELECT 'P2', 'MC1', 4.0, array(named_struct('key', 'harmless'))""".stripMargin))
    ctx.sources.register("mongo", "product_products_daily_snapshot")(sp => sp.sql(
      """SELECT 'P1' AS _id, 'M1' AS merchantId, true AS public, true AS hasActive,
        |  true AS enabledByMerchant, 'Nice Lamp' AS origName, 'A lamp' AS origDescription
        |UNION ALL -- P2's name hits a real stopword from the seed
        |SELECT 'P2', 'M1', true, true, true, 'Sex toy deluxe', 'toy'
        |UNION ALL
        |SELECT 'P3', 'M1', true, true, true, 'Plush', 'plush'""".stripMargin))
    ctx.sources.register("mongo", "core_entity_labels_entries_daily_snapshot")(sp => sp.sql(
      """SELECT 'refurbishedWhiteList' AS k, named_struct('id', 'OTHER_M') AS e"""))

    val model = refModel("uzum_available_products", "uzum/uzum_available_products.sql")
    new DagRunner(Seq(model)).run(ctx, selectors = Seq("uzum_available_products"))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }
    // P2 dies on the seed-built stopword regex, P3 on ARRAYS_OVERLAP with
    // the banned label list; P1 survives every gate
    val rows = ctx.ref("uzum_available_products").as[String].collect().toSeq
    assert(rows == Seq("P1"), rows.toString)
  }

  test("REAL s3_file_usage_v2.sql: hierarchical prefix rollup via sequence+slice") {
    val ctx = freshCtx()
    ctx.sources.register("platform", "s3_inventory_with_tables")(sp => sp.sql(
      """SELECT array('a', 'b', 'c.parquet') AS parts, 'STANDARD' AS storage_class,
        |  100L AS size, DATE'2024-06-01' AS `date`, 'bkt' AS bucket,
        |  named_struct('db', 'gold', 'table_name', 'orders') AS `table`
        |UNION ALL
        |SELECT array('a', 'b', 'd.parquet'), 'STANDARD', 50L, DATE'2024-06-01',
        |  'bkt', named_struct('db', 'gold', 'table_name', 'orders')""".stripMargin))

    val model = refModel("s3_file_usage_v2", "platform/s3_file_usage_v2.sql")
    assert(model.materialization == Materialization.View)
    new DagRunner(Seq(model)).run(ctx, selectors = Seq("s3_file_usage_v2"))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }
    val rows = ctx.ref("s3_file_usage_v2").selectExpr(
      "prefix", "path_length", "is_file", "size", "file_count")
      .as[(String, Int, Boolean, Long, Long)].collect().toSet
    // every path explodes into all its prefixes (sequence 1..len sliced and
    // re-joined); directories aggregate both files, leaves stay individual
    assert(rows == Set(
      ("a", 1, false, 150L, 2L),
      ("a/b", 2, false, 150L, 2L),
      ("a/b/c.parquet", 3, true, 100L, 1L),
      ("a/b/d.parquet", 3, true, 50L, 1L)), rows.toString)
  }

  test("REAL js2_product_clusters.sql: ARRAY_SORT comparator lambda, status decode") {
    val ctx = freshCtx()
    ctx.sources.register("mongo", "product_product_cluster_links_daily_snapshot")(sp => sp.sql(
      """SELECT 'CL1' AS _id, 'C1' AS cid, 'P1' AS pId,
        |  array(named_struct('vid', 'V1', 'cvid', 'CV1')) AS vLinks,
        |  2 AS clt,
        |  array(named_struct('ut', 200L, 'cs', 1),
        |        named_struct('ut', 100L, 'cs', 0)) AS sh""".stripMargin))
    ctx.sources.register("mongo", "product_product_clusters_daily_snapshot")(sp => sp.sql(
      """SELECT 'C1' AS _id, 'P0' AS initProdId, 'Cluster A' AS n,
        |  TIMESTAMP'2024-05-01 00:00:00' AS ct, 3 AS ver, 0 AS st,
        |  array(named_struct('_id', 'CV1')) AS vars""".stripMargin))

    val model = refModel("js2_product_clusters",
      "category_management/joom_select_v2/js2_product_clusters.sql")
    new DagRunner(Seq(model)).run(ctx, selectors = Seq("js2_product_clusters"))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }
    val rows = ctx.ref("js2_product_clusters").selectExpr(
      "cluster_id", "initial_product_id", "cluster_name", "version",
      "cluster_state", "cluster_link_id", "product_id", "variant_id",
      "cluster_variant_id", "store_link_type", "current_link_status")
      .as[(String, String, String, Int, String, String, String, String,
        String, String, String)].collect().toSet
    // the 0/1-only comparator (no -1) relies on TimSort's comparison
    // direction: with latest-ut planted first, [0].cs stays the LATEST
    // history entry — the author's 'current status' intent: cs 1 ->
    // 'Approved'; clt 2 -> 'AutoLink'; st 0 -> 'Enabled'
    assert(rows == Set(("C1", "P0", "Cluster A", 3, "Enabled", "CL1", "P1",
      "V1", "CV1", "AutoLink", "Approved")), rows.toString)
  }

  test("REAL aws_costs.sql: Prophet predictor meta passthrough (nested list-of-dicts config)") {
    // the anomaly-detection contract is pure metadata: external infra reads
    // the predictor_*/anomalies_* keys (SURVEY data-model row 'Time series /
    // forecasting — delegated'). The meta block is the corpus's deepest —
    // lists of dicts of lists with trailing commas — so executing this file
    // is primarily a config-parser proof.
    val ctx = freshCtx()
    ctx.sources.register("platform", "aws_service_costs")(sp => sp.sql(
      """SELECT DATE'2024-05-01' AS day, 'AmazonRDS' AS service,
        |  CAST(120.5 AS DOUBLE) AS cost
        |UNION ALL SELECT DATE'2024-05-01', 'AWSELB', 30.25""".stripMargin))

    val model = refModel("aws_costs", "anomaly_detection/aws_costs.sql")
    assert(model.tags.contains("platform"))
    assert(model.meta("model_owner") == "@vladimir")
    assert(model.meta("predictor_enabled") == "true")
    assert(model.meta("predictor_model") == "prophet_generic")
    assert(model.meta("predictor_value_column") == "cost")
    assert(model.meta("anomalies_significance_threshold") == "0.2")
    assert(model.meta("anomalies_main_owners").contains("@aleksandrov"))
    // the nested list-of-dicts survives parsing and renders both groups
    val nested = model.meta("anomalies_dimensions_owners")
    assert(nested.contains("AmazonVPC") && nested.contains("AWSELB")
      && nested.contains("AmazonRDS"), nested)

    new DagRunner(Seq(model)).run(ctx, selectors = Seq("aws_costs"))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }
    val rows = ctx.ref("aws_costs").selectExpr("CAST(day AS STRING)", "service", "cost")
      .as[(String, String, Double)].collect().toSet
    assert(rows == Set(("2024-05-01", "AmazonRDS", 120.5),
      ("2024-05-01", "AWSELB", 30.25)), rows.toString)
  }

  test("REAL fbj_parcel_speed.sql: DATE_DIFF(HOUR,...), per-parcel rollup, fbj parcel classes") {
    val ctx = freshCtx()
    // parcel A (RU): one fbj + one non-fbj order -> 'not only fbj' class;
    // parcel B (DE->nonRU): pure fbj; parcel C: origin TR -> filtered
    ctx.sources.register("logistics_mart", "fact_order")(sp => sp.sql(
      """SELECT 'A' AS parcel_id, 'RU' AS country, 'CN' AS origin_country,
        |  'o1' AS order_id, true AS is_fbj_order, 2L AS quantity,
        |  TIMESTAMP'2025-02-01 00:00:00' AS order_created_time_utc,
        |  TIMESTAMP'2025-02-02 00:00:00' AS outbound_time_utc
        |UNION ALL SELECT 'A', 'RU', 'CN', 'o2', false, 1L,
        |  TIMESTAMP'2025-02-01 06:00:00', TIMESTAMP'2025-02-02 00:00:00'
        |UNION ALL SELECT 'B', 'DE', 'CN', 'o3', true, 4L,
        |  TIMESTAMP'2025-02-01 12:00:00', TIMESTAMP'2025-02-02 00:00:00'
        |UNION ALL SELECT 'C', 'RU', 'TR', 'o4', true, 9L,
        |  TIMESTAMP'2025-02-01 00:00:00', TIMESTAMP'2025-02-02 00:00:00'""".stripMargin))

    val model = refModel("fbj_parcel_speed", "category_management/fbj/fbj_parcel_speed.sql")
    new DagRunner(Seq(model)).run(ctx, selectors = Seq("fbj_parcel_speed"))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    val rows = ctx.ref("fbj_parcel_speed")
      .selectExpr("CAST(dt AS STRING)", "country_type", "parcel_cnt",
        "CAST(avg_dif_days AS DOUBLE)", "fbj_parcel_cnt",
        "CAST(avg_fbj_dif_days AS DOUBLE)", "not_only_fbj_parcel_cnt",
        "CAST(avg_fbj_quantity_share_in_not_only_fbj_parcel AS DOUBLE)",
        "not_fbj_parcel_cnt")
      .as[(String, String, Long, Option[Double], Long, Option[Double], Long,
        Option[Double], Long)].collect().toSet
    // hand-tally: A spans 24h (dif 1.0), B 12h (0.5); the UNION ALL re-agg
    // adds the 'total' slice; fbj share in A = 2/3 rounded to 0.667
    assert(rows == Set(
      ("2025-02-02", "RU", 1L, Some(1.0), 0L, None, 1L, Some(0.667), 0L),
      ("2025-02-02", "nonRU", 1L, Some(0.5), 1L, Some(0.5), 0L, None, 0L),
      ("2025-02-02", "total", 2L, Some(0.75), 1L, Some(0.5), 1L, Some(0.667), 0L)),
      rows.toString)
  }

  test("REAL pzns_not_connected_into_one_medical_group.sql: TRANSFORM, struct-equality joins, array clustering") {
    val ctx = freshCtx()
    ctx.warehouse.createTable("orders_info", spark.sql(
      """SELECT 'Z1' AS pzn, CAST(10.0 AS DOUBLE) AS products_price
        |UNION ALL SELECT 'Z2', 20.0
        |UNION ALL SELECT 'Z3', 5.0""".stripMargin))
    // P1/P2: identical ingredient lists, same dosage form + manufacturer,
    // DIFFERENT medicine groups -> analogs of each other; P3: different
    // active ingredient and no extras -> no analogs (HAVING drops it)
    ctx.sources.register("pharmacy_landing", "medicine_ingredient")(sp => sp.sql(
      """SELECT 'P1' AS medicine_id, 'I1' AS ingredient_id, 1 AS index,
        |  CAST(400.0 AS DOUBLE) AS quantity, 'mg' AS unit, true AS active
        |UNION ALL SELECT 'P1', 'I2', 2, 50.0, 'mg', false
        |UNION ALL SELECT 'P2', 'I1', 1, 400.0, 'mg', true
        |UNION ALL SELECT 'P2', 'I2', 2, 50.0, 'mg', false
        |UNION ALL SELECT 'P3', 'I3', 1, 500.0, 'mg', true""".stripMargin))
    ctx.sources.register("pharmacy_landing", "ingredient")(sp => sp.sql(
      """SELECT 'I1' AS id, 'ibuprofen' AS name
        |UNION ALL SELECT 'I2', 'lactose'
        |UNION ALL SELECT 'I3', 'paracetamol'""".stripMargin))
    ctx.sources.register("pharmacy_landing", "medicine")(sp => sp.sql(
      """SELECT 'P1' AS id, 'Z1' AS country_local_id, 'g1' AS medicine_group_id,
        |  'DF1' AS dosage_form_id
        |UNION ALL SELECT 'P2', 'Z2', 'g2', 'DF1'
        |UNION ALL SELECT 'P3', 'Z3', 'g3', 'DF1'""".stripMargin))
    ctx.sources.register("pharmacy_landing", "dosage_form")(sp => sp.sql(
      "SELECT 'DF1' AS id, 'TAB' AS short_name, 'tablet' AS long_name"))
    ctx.sources.register("pharmacy_landing", "product")(sp => sp.sql(
      """SELECT 'P1' AS id, 'M1' AS manufacturer_id, 'Bayer' AS name
        |UNION ALL SELECT 'P2', 'M1', 'Bayer'
        |UNION ALL SELECT 'P3', 'M1', 'Bayer'""".stripMargin))

    val model = refModel("pzns_not_connected_into_one_medical_group",
      "onfy/pzns_not_connected_into_one_medical_group.sql")
    new DagRunner(Seq(model)).run(ctx,
      selectors = Seq("pzns_not_connected_into_one_medical_group"))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    val rows = ctx.ref("pzns_not_connected_into_one_medical_group")
      .selectExpr("new_cluster_id", "medicine_group_id", "pzn", "product_id",
        "product_name", "manufacturer_id", "dosage_form_short_name", "gmv",
        "cluster_gmv")
      .as[(Int, String, String, String, String, String, String, Double, Double)]
      .collect().toSet
    // hand-tally: P1's analog set (incl. self) is [Z1, Z2] -> one DENSE_RANK
    // cluster; cluster_gmv = 10 + 20; P3 never appears
    assert(rows == Set(
      (1, "g1", "Z1", "P1", "Bayer", "M1", "TAB", 10.0, 30.0),
      (1, "g2", "Z2", "P2", "Bayer", "M1", "TAB", 20.0, 30.0)), rows.toString)
  }

  test("REAL ss_events_startsession.sql: URL param inline, gclid slicing, auth-gated bot flag") {
    val ctx = freshCtx()
    def sev(uid: String, dev: String, id: String, ts: String, typ: String,
            url: String): String =
      s"""SELECT '$id' AS id, named_struct('userId', '$uid') AS `user`,
         |  named_struct('id', '$dev', 'osType', 'windows', 'osVersion', '11',
         |    'browserName', 'ff') AS device,
         |  '$typ' AS type,
         |  TIMESTAMP'$ts' AS event_ts_utc, TIMESTAMP'$ts' AS event_ts_msk,
         |  CAST(DATE(TIMESTAMP'$ts') AS STRING) AS partition_date,
         |  named_struct('pageUrl', ${s(url)}) AS payload""".stripMargin
    ctx.sources.register("b2b_mart", "device_events")(sp => sp.sql(Seq(
      // U1: full utm + gclid URL; has a prior "active" event -> active_user 1
      sev("U1", "d1", "e1", "2024-05-02 10:00:00", "sessionStart",
        "https://joom.pro/de/home?utm_source=google&utm_medium=cpc&utm_campaign=x&gclid=ABC123&foo=1"),
      sev("U1", "d1", "e0", "2024-05-01 09:00:00", "productPreview",
        "https://joom.pro/de/p"),
      // U2: bounceCheck on a bot device, no params -> bot_flag 1
      sev("U2", "db", "e2", "2024-05-02 11:00:00", "bounceCheck",
        "https://joom.pro/ru/x"),
      // U3: authenticated on a bot device -> auth overrides the bot flag;
      // gad_source without utm_source -> 'unrecognized_google_advertising'
      sev("U3", "db2", "e3", "2024-05-02 12:00:00", "sessionStart",
        "https://joom.pro/en/y?gad_source=1")
    ).mkString("\nUNION ALL\n")))
    ctx.warehouse.createTable("ss_events_authentication",
      Seq("U3").toDF("user_id"))

    val dbLoc = TempDirs.create("graft_threatdb2")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS threat LOCATION '$dbLoc'")
    try {
      spark.sql(
        """SELECT 'db' AS device_id, true AS is_device_marked_as_bot,
          |  false AS is_retrospectively_detected_bot
          |UNION ALL SELECT 'db2', false, true""".stripMargin)
        .write.mode("overwrite").option("path", s"$dbLoc/bot_devices_joompro")
        .saveAsTable("threat.bot_devices_joompro")

      val model = refModel("ss_events_startsession", "b2b_mart/ss/ss_events_startsession.sql")
      new DagRunner(Seq(model)).run(ctx, selectors = Seq("ss_events_startsession"))
        .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

      val rows = ctx.ref("ss_events_startsession")
        .selectExpr("user_id", "device_id", "type", "active_user", "landing",
          "utm_source", "utm_medium", "utm_campaign", "gclid", "bot_flag")
        .as[(String, String, String, Int, String, Option[String], Option[String],
          Option[String], Option[String], Int)].collect().toSet
      // hand-tally: U1's query string survives split_part/inline/collect_set
      // merging; gclid is sliced out by POSITION/SUBSTRING up to the next &;
      // U2 keeps the bot flag; U3's auth zeroes it and gad_source-without-
      // utm_source becomes 'unrecognized_google_advertising'
      assert(rows == Set(
        ("U1", "d1", "sessionStart", 1, "de", Some("google"), Some("cpc"),
          Some("x"), Some("ABC123"), 0),
        ("U2", "db", "bounceCheck", 0, "ru", None, None, None, None, 1),
        ("U3", "db2", "sessionStart", 0, "en",
          Some("unrecognized_google_advertising"), None, None, None, 0)),
        rows.toString)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS threat CASCADE")
    }
  }

  /** One device_events document for ss_events_by_session. */
  private def ssEv(uid: String, dev: String, os: String, typ: String, ts: String,
                   pageUrl: String = null, query: String = null,
                   productId: String = null): String =
    s"""SELECT named_struct('userId', ${s(uid)}) AS `user`,
       |  named_struct('id', '$dev', 'osType', '$os') AS device,
       |  '$typ' AS type,
       |  TIMESTAMP'$ts' AS event_ts_msk,
       |  '2024-05-01' AS partition_date,
       |  named_struct('pageUrl', ${s(pageUrl)}, 'page', CAST(NULL AS STRING),
       |    'pageName', CAST(NULL AS STRING), 'source', CAST(NULL AS STRING),
       |    'productId', ${s(productId)}, 'timeBeforeClick', CAST(NULL AS STRING),
       |    'productsNumber', CAST(NULL AS STRING), 'query', ${s(query)},
       |    'topProductsNumber', CAST(NULL AS STRING), 'hasNextPage', CAST(NULL AS STRING),
       |    'searchResultsUniqId', CAST(NULL AS STRING), 'isSearchByImage', CAST(NULL AS STRING),
       |    'index', CAST(NULL AS STRING), 'position', CAST(NULL AS STRING),
       |    'promotionId', CAST(NULL AS STRING)) AS payload""".stripMargin

  test("REAL ss_events_by_session.sql: MAP_FILTER params, landing JSON, session collapse") {
    val ctx = freshCtx()
    ctx.sources.register("b2b_mart", "device_events")(sp => sp.sql(Seq(
      // U1: two sessions on device da (31-min gap splits them)
      ssEv("U1", "da", "android", "search", "2024-05-01 10:00:00",
        pageUrl = "https://x/pt-br/s", query = "shoes"),
      ssEv("U1", "da", "android", "productOpen", "2024-05-01 10:10:00",
        productId = "p1"),
      ssEv("U1", "da", "android", "cartOpen", "2024-05-01 11:00:00"),
      ssEv("U1", "da", "android", "deviceCreate", "2024-05-01 09:59:00"), // type-excluded
      // U2: search-only -> fake_search HAVING filter drops the user
      ssEv("U2", "db", "windows", "search", "2024-05-01 10:00:00", query = "q"),
      ssEv("U2", "db", "windows", "search", "2024-05-01 10:05:00", query = "q2"),
      // U3: on a bot device -> bots join drops every event
      ssEv("U3", "dbot", "ios", "productOpen", "2024-05-01 10:00:00"),
      // anonymous event -> userId IS NULL filter
      ssEv(null, "da", "android", "productOpen", "2024-05-01 10:01:00")
    ).mkString("\nUNION ALL\n")))

    // the model names threat.bot_devices_joompro as a bare catalog table
    val dbLoc = TempDirs.create("graft_threatdb")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS threat LOCATION '$dbLoc'")
    try {
      spark.sql(
        """SELECT 'dbot' AS device_id, true AS is_device_marked_as_bot,
          |  false AS is_retrospectively_detected_bot
          |UNION ALL
          |SELECT 'da', false, false""".stripMargin)
        .write.mode("overwrite").option("path", s"$dbLoc/bot_devices_joompro")
        .saveAsTable("threat.bot_devices_joompro")

      val model = refModel("ss_events_by_session", "b2b_mart/ss/ss_events_by_session.sql")
      new DagRunner(Seq(model)).run(ctx, selectors = Seq("ss_events_by_session"))
        .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

      val out = ctx.ref("ss_events_by_session")
      val sessions = out.selectExpr("user_id", "session_id", "session_num",
        "CAST(session_start AS STRING)", "CAST(session_end AS STRING)",
        "session_duration_seconds", "first_event_name", "last_event_name",
        "events_in_session_count", "events_in_session_unique_count",
        "size(events_in_session)", "size(unique_devices_in_session)")
        .as[(String, String, Long, String, String, Long, String, String,
          Long, Long, Int, Int)].collect().toSet
      assert(sessions == Set(
        ("U1", "U1s1", 1L, "2024-05-01 10:00:00", "2024-05-01 10:10:00", 600L,
          "search", "productOpen", 2L, 2L, 2, 1),
        ("U1", "U1s2", 2L, "2024-05-01 11:00:00", "2024-05-01 11:00:00", 0L,
          "cartOpen", "cartOpen", 1L, 1L, 1, 1)), sessions.toString)

      // nested event structs: MAP_FILTER kept only non-null params
      // (TO_JSON), and the pt-br pageUrl maps to the BR landing
      val nested = out.filter($"session_id" === "U1s1")
        .selectExpr("explode(events_in_session) AS e")
        .selectExpr("e.event_type", "e.event_params", "e.event_landing",
          "e.device_platform")
        .as[(String, String, Option[String], String)].collect().toSet
      assert(nested == Set(
        ("search", """{"pageUrl":"https://x/pt-br/s","query":"shoes"}""",
          Some("BR"), "mobile"),
        ("productOpen", """{"product_id":"p1"}""", None, "mobile")), nested.toString)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS threat CASCADE")
    }
  }
}
