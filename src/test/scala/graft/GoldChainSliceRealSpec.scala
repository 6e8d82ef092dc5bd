package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import graft.runtime._

/** The DATA-BEARING multi-model domain slice: the gold chain — 21 verbatim
  * reference nodes (2 seeds + 19 models, every file read from
  * /root/reference at test runtime) composed into ONE DagRunner DAG and run
  * twice (full + incremental) over hand-planted NON-EMPTY fixtures, with
  * row-count / key-aggregate assertions at every node and hand-pinned cells
  * on the tail. Corpus EXECUTE proves this DAG at 0-row negotiated-schema
  * level; this spec proves the same wiring carries real data end-to-end:
  *
  *   seeds: gold_regions_source, countries_properties_seed
  *   geo:   gold_regions → gold_countries ← countries_properties
  *   base:  active_devices_funnel → active_devices; active_users
  *   points: fact_user_points_transactions → user_points_transactions
  *           (raw-catalog ads.referral_bloggers join) → bloggers
  *   dims:  gold_merchant_categories, gold_merchants, user_segments,
  *          joom_babylone_tickets, gold_logistics_orders
  *   facts: gold_orders (695-LoC flagship); base/orders (350-LoC core
  *          base fact: fraud filter, double-keyed ticket attach, refund
  *          dictionary, rating roll-up, is_new_user via active_devices)
  *   tail:  gold_active_devices_with_ephemeral (the 405-line macro) →
  *          gold_active_devices → gold_active_real_users
  *
  * Cast: users 7/8/9 on devices d7/d8/d9 (d10 is an all-ephemeral device the
  * ephemeral filter must drop), ten orders across 2024-06/07 chosen by the
  * orderkey-residue coding GoldOrdersRealSpec documents (%13 fraud, %7
  * customer refund, %11 merchant refund, %8 special price, %5 delivered,
  * %9 reviewed). Dates sit after the macro's 2018-04-15 device floor and
  * far enough in the past that every CURRENT_DATE retention gate is open.
  */
class GoldChainSliceRealSpec extends SparkSpec {
  import spark.implicits._

  private val ref = "/root/reference"
  private def readSql(p: String): String = Files.readString(Paths.get(s"$ref/$p"))

  // ---- the order fixture: (orderkey, custkey, date, price) --------------
  private val orderRows = Seq(
    (1L, 7L, "2024-06-01", 100.0),
    (2L, 7L, "2024-06-02", 50.0),
    (9L, 7L, "2024-06-10", 30.0),  // %9: reviewed
    (8L, 7L, "2024-07-01", 60.0),  // %8: special price; second month partition
    (3L, 8L, "2024-06-01", 80.0),
    (5L, 8L, "2024-06-08", 40.0),  // %5: delivered
    (11L, 8L, "2024-06-15", 90.0), // %11: merchant refund, MO11 note -> pickup fault
    (7L, 9L, "2024-06-01", 70.0),  // %7: customer refund badQuality
    (13L, 9L, "2024-06-03", 10.0), // %13: FRAUD -> filtered out of gold_orders
    (22L, 9L, "2024-06-20", 20.0)) // %11 via 22: merchant refund notShippedOnTime

  /** star_order_2020 with every column gold_orders + user_segments read —
    * the same residue coding as GoldOrdersRealSpec, over the literal cast. */
  private def starOrders: DataFrame =
    orderRows.toDF("o_orderkey", "o_custkey", "o_date", "o_totalprice").selectExpr(
      "CAST(o_orderkey AS STRING) AS order_id",
      "concat('F', o_orderkey) AS friendly_order_id",
      "concat('G', o_orderkey % 100) AS order_group_id",
      "concat('d', o_custkey) AS device_id",
      "o_custkey AS real_user_id",
      "o_custkey AS user_id",
      "CAST(o_date AS DATE) AS partition_date",
      "TIMESTAMP'2024-06-01 00:00:00' AS real_user_join_ts_msk",
      "CAST(o_date AS TIMESTAMP) + make_interval(0, 0, 0, 0, 0, 0, o_orderkey % 86400) AS created_time_utc",
      "IF(o_orderkey % 2 = 0, 'jmt', 'sia') AS legal_entity",
      "'joom' AS app_entity_group",
      "'joom' AS app_entity",
      "CAST(NULL AS STRING) AS custom_domain",
      "o_custkey % 20 AS merchant_id",
      "o_custkey % 30 AS store_id",
      "o_orderkey % 200 AS product_id",
      "o_orderkey % 400 AS product_variant_id",
      "o_orderkey % 10 AS category_id",
      "IF(o_orderkey % 3 = 0, 'de', 'fr') AS shipping_country",
      "'EUR' AS currency",
      "'IOS' AS os_type",
      "named_struct('name', 'search') AS last_context",
      "array(named_struct('name', 'search'), named_struct('name', 'feed')) AS normalized_contexts",
      "CASE WHEN o_orderkey % 13 = 0 THEN CAST(NULL AS INT) WHEN o_orderkey % 7 = 0 THEN 4 END AS customer_refund_reason",
      "CASE WHEN o_orderkey % 13 = 0 THEN 'fraud' WHEN o_orderkey % 7 = 0 OR o_orderkey % 11 = 0 THEN 'refunded' END AS refund_reason",
      "CASE WHEN o_orderkey % 13 != 0 AND o_orderkey % 7 != 0 AND o_orderkey % 11 = 0 THEN 4 END AS merchant_refund_reason",
      "CASE WHEN o_orderkey % 5 = 0 THEN CAST(o_date AS TIMESTAMP) + INTERVAL 20 DAYS END AS delivered_time_utc",
      "30 AS warranty_duration_max_days",
      "CAST(1 + o_orderkey % 3 AS INT) AS product_quantity",
      "o_totalprice AS gmv_initial",
      "o_totalprice * 0.9 AS gmv_final",
      "o_totalprice * 0.1 AS refund",
      "o_totalprice * 1.1 AS amount_currency",
      "'adyen' AS psp",
      "o_totalprice * 0.02 AS psp_initial",
      "o_totalprice * 0.018 AS psp_final",
      "o_totalprice * 0.001 AS psp_refund_fee",
      "0D AS psp_chargeback_fee",
      "o_totalprice * 0.04 AS extra_charge",
      "o_totalprice * 0.05 AS jl_cost_final_estimated",
      "o_totalprice * 0.2 AS order_gross_profit_final",
      "o_totalprice * 0.21 AS order_gross_profit_final_estimated",
      "o_totalprice * 0.15 AS ecgp_initial",
      "o_totalprice * 0.14 AS ecgp_final",
      "o_totalprice * 0.6 AS merchant_revenue_initial",
      "o_totalprice * 0.55 AS merchant_revenue_final",
      "o_totalprice * 0.7 AS merchant_sale_price",
      "o_totalprice * 0.8 AS merchant_list_price",
      "o_totalprice * 0.1 AS logistics_price_initial",
      "o_totalprice * 0.01 AS vat_markup",
      "o_totalprice * 0.03 AS logistics_extra_charge",
      "IF(o_orderkey % 4 = 0, 'C123', CAST(NULL AS STRING)) AS used_coupon_id",
      "IF(o_orderkey % 4 = 0, 2.5D, 0D) AS coupon",
      "IF(o_orderkey % 6 = 0, 120D, 0D) AS points_initial",
      "0D AS points_final",
      "IF(o_orderkey % 8 = 0, " +
        "array(named_struct('type', 'specialPriceFinal', 'amount', 3e-6), " +
        "      named_struct('type', 'specialPrice', 'amount', 5e-6)), " +
        "array(named_struct('type', 'other', 'amount', 1e-6))) AS discounts",
      "false AS is_1688_product",
      "CASE WHEN o_orderkey % 7 = 0 OR o_orderkey % 11 = 0 THEN CAST(o_date AS TIMESTAMP) + INTERVAL 10 DAYS END AS refund_time_utc",
      "IF(o_orderkey % 2 = 0, 'online', CAST(NULL AS STRING)) AS jl_shipping_type_initial",
      "5 AS estimated_delivery_min_days",
      "15 AS estimated_delivery_max_days",
      "CASE WHEN o_orderkey % 9 = 0 THEN CAST(o_date AS TIMESTAMP) + INTERVAL 30 DAYS END AS review_time_utc",
      "CASE WHEN o_orderkey % 9 = 0 THEN CAST(1 + o_orderkey % 5 AS INT) END AS review_stars",
      "o_orderkey % 9 = 0 AS review_has_text",
      "CAST(IF(o_orderkey % 9 = 0, 1, 0) AS INT) AS review_media_count",
      "CAST(IF(o_orderkey % 9 = 0, 1, 0) AS INT) AS review_image_count",
      "named_struct('count_1_star', 1L, 'count_2_star', 2L, 'count_3_star', 3L, 'count_4_star', 4L, 'count_5_star', 5L) AS rating_counts",
      "0D AS shopy_partner_payout_final",
      "0D AS wl_commission_initial")

  /** star_active_device: the device/user-day activity feed (both
    * active_devices and active_users read it). Covers every order day of
    * its device; d10 is ALL-ephemeral. */
  private def starActiveDevice: DataFrame = Seq(
    ("d7", "u7", "2024-06-01", "2024-06-01 08:00:00", "de", false, 7L, "jmt"),
    ("d7", "u7", "2024-06-02", "2024-06-01 08:00:00", "de", false, 7L, "jmt"),
    ("d7", "u7", "2024-06-10", "2024-06-01 08:00:00", "de", false, 7L, "jmt"),
    ("d7", "u7", "2024-07-01", "2024-06-01 08:00:00", "de", false, 7L, "jmt"),
    ("d8", "u8", "2024-06-01", "2024-05-20 09:00:00", "fr", false, 8L, "sia"),
    ("d8", "u8", "2024-06-08", "2024-05-20 09:00:00", "fr", false, 8L, "sia"),
    ("d8", "u8", "2024-06-15", "2024-05-20 09:00:00", "fr", false, 8L, "sia"),
    ("d9", "u9", "2024-06-01", "2024-06-01 07:00:00", "zz", false, 9L, "sia"),
    ("d9", "u9", "2024-06-20", "2024-06-01 07:00:00", "zz", false, 9L, "sia"),
    ("d10", "u10", "2024-06-05", "2024-06-05 10:00:00", "de", true, 10L, "jmt"))
    .toDF("device_id", "user_id", "d", "jts", "country", "ephemeral", "ruid", "legal")
    .selectExpr("device_id", "user_id", "CAST(d AS DATE) AS date_msk",
      "CAST(jts AS TIMESTAMP) AS join_ts_msk", "country", "'IOS' AS os_type",
      "'17' AS os_version", "'3.1' AS app_version", "ephemeral",
      "ruid AS real_user_id", "legal AS legal_entity", "'joom' AS app_entity",
      "'joom' AS app_entity_group", "CAST(NULL AS STRING) AS custom_domain",
      "'DE' AS language")

  /** Mongo points docs: _id's first 8 hex chars = creation epoch seconds
    * (fact_user_points_transactions derives date_msk from them). */
  private def pointsDoc(epochDay: String, suffix: String, userid: String,
                        typ: String, usd: Long, refid: String, pending: String): String = {
    val epoch = java.time.LocalDate.parse(epochDay)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val id = f"$epoch%08x$suffix"
    val r = if (refid == null) "CAST(NULL AS STRING)" else s"'$refid'"
    val p = if (pending == null) "CAST(NULL AS STRING)" else s"'$pending'"
    s"""SELECT '$id' AS _id, '$userid' AS userid, 'points' AS kind, '$typ' AS type,
       |  CAST($usd AS BIGINT) AS effectiveusd, false AS hidden, $r AS refid,
       |  named_struct('value', CAST($usd AS DOUBLE) / 1000000, 'ccy', 'USD', 'mult', 1) AS amount,
       |  0 AS index, $p AS pending""".stripMargin
  }

  test("REAL gold chain: 21 verbatim nodes run data-bearing, full + incremental") {
    val macros = CorpusSweep.loadMacros(Paths.get(s"$ref/macros"))
    val ctx0 = freshCtx(vars = Map("start_date_ymd" -> "2024-07-02"))
    val ctx = ctx0.copy(macros = macros)

    // ---- source mocks ----------------------------------------------------
    val star = starOrders.cache()
    ctx.sources.register("mart", "star_order_2020")(_ => star)
    ctx.sources.register("mart", "star_active_device")(_ => starActiveDevice)
    ctx.sources.register("recom", "context_device_counters_v6")(s => {
      import s.implicits._
      Seq(("d7", "2024-06-01", "productOpen", 2L),
        ("d7", "2024-06-01", "productToCart", 1L),
        ("d8", "2024-06-08", "productPurchase", 1L),
        ("d9", "2024-06-01", "productOpen", 1L))
        .toDF("device_id", "pd", "type", "count")
        .selectExpr("device_id", "CAST(pd AS DATE) AS partition_date", "type", "count")
    })
    ctx.sources.register("payments", "checkout_data")(s => {
      import s.implicits._
      Seq(("d7", "2024-06-01", "2024-06-01 10:00:00", null),
        ("d8", "2024-06-08", null, "2024-06-08 11:00:00"))
        .toDF("device_id", "dt", "cart", "chk")
        .selectExpr("device_id", "CAST(dt AS DATE) AS date",
          "CAST(cart AS TIMESTAMP) AS cart_open_ts",
          "CAST(chk AS TIMESTAMP) AS checkout_start_ts",
          "CAST(NULL AS TIMESTAMP) AS is_checkout_pmt_method_select",
          "CAST(NULL AS TIMESTAMP) AS is_checkout_delivery_select")
    })
    ctx.sources.register("mongo", "points_points_transactions_daily_snapshot")(s => s.sql(Seq(
      // u7: a pending cashback x1 finalized by f1 at 5 USD (pending rows
      // take the FINALIZED amount, 5.0, not their own 2.0)
      pointsDoc("2024-06-02", "aaaaaaaaaaaaaaa1", "u7", "cashback", 2000000L, null, "p"),
      pointsDoc("2024-06-02", "aaaaaaaaaaaaaaa2", "u7", "finalize", 5000000L,
        f"${java.time.LocalDate.parse("2024-06-02").atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond}%08x" + "aaaaaaaaaaaaaaa1", null),
      // u8: one admin transaction (referral_bloggers member -> admin_bloggers)
      pointsDoc("2024-06-08", "bbbbbbbbbbbbbbb1", "u8", "admin", 3000000L, null, null),
      // u9: a pending row with NO finalize -> filtered out of points
      pointsDoc("2024-06-20", "ccccccccccccccc1", "u9", "cashback", 1000000L, null, "p"))
      .mkString("\nUNION ALL\n")))
    ctx.sources.register("ads", "referral_payout_stats")(s => {
      import s.implicits._
      Seq(7L).toDF("blogger_id")
    })
    ctx.sources.register("mart", "category_levels")(s =>
      s.range(0, 10).selectExpr("id AS category_id", "concat('cat', id) AS name",
        // category 2 gets the Electronics&HA magic l1 id; others miss every arm
        "named_struct('name', concat('L1-', id), 'id', " +
          "IF(id = 2, '1473502935479416415-109-2-118-770440083', concat('l1-', id))) AS level_1_category",
        "named_struct('name', concat('L2-', id), 'id', concat('l2-', id)) AS level_2_category",
        "named_struct('name', concat('L3-', id), 'id', concat('l3-', id)) AS level_3_category",
        "named_struct('name', concat('L4-', id), 'id', concat('l4-', id)) AS level_4_category",
        "named_struct('name', concat('L5-', id), 'id', concat('l5-', id)) AS level_5_category"))
    ctx.sources.register("mart", "dim_merchant")(s => {
      import s.implicits._
      Seq((7L, "m-seven", "cn"), (8L, "m-eight", "cn"), (9L, "m-nine", "kr"))
        .toDF("merchant_id", "name", "origin_name")
        .selectExpr("merchant_id", "name", "origin_name",
          "1717200000000L AS created_time", "1717200000000L AS updated_time",
          "true AS enabled")
    })
    ctx.sources.register("mart", "babylone_events")(s => s.sql(
      """SELECT 'ev1' AS id, DATE'2024-06-02' AS partition_date,
        |  TIMESTAMP'2024-06-02 12:00:00' AS event_ts_utc, 'ticketCreateJoom' AS type,
        |  named_struct('customerexternalid', 'u7', 'ticketid', 500L, 'lang', 'en',
        |    'messagesource', 'app', 'orderids', array('5')) AS payload
        |UNION ALL
        |SELECT 'ev2', DATE'2024-06-08', TIMESTAMP'2024-06-08 12:00:00', 'ticketCreateJoom',
        |  named_struct('customerexternalid', 'u8', 'ticketid', 300L, 'lang', 'de',
        |    'messagesource', 'web', 'orderids', array('F3'))""".stripMargin))
    ctx.sources.register("logistics_mart", "fact_order")(s => s.sql(
      // order '5': delivered by JL, FBJ-qualifying; order '11': refunded, not delivered
      """SELECT '5' AS order_id, 'SO5' AS order_number, 'G5' AS order_group_id,
        |  'P5' AS parcel_id, 'TRK5' AS tracking_number, 8L AS user_id, 'd8' AS device_id,
        |  'FR' AS country, 'cn' AS origin_name, true AS is_online_shipping,
        |  true AS is_fbj_order, 'CN' AS warehouse_country,
        |  DATE'2024-06-08' AS order_created_date_utc, 'post' AS delivery_method_name,
        |  'hecny' AS linehaul_shipper, 'online' AS initial_shipping_type,
        |  'online' AS shipping_type, 'ch1' AS initial_channel_id, 'ch1' AS channel_id,
        |  5L AS category_id, false AS is_consolidated,
        |  CAST(NULL AS STRING) AS consolidation_group_id, false AS is_consolidated_by_merchant,
        |  false AS is_refunded, CAST(NULL AS STRING) AS refund_type,
        |  1.2D AS order_weight, 1.5D AS parcel_weight, 2 AS quantity,
        |  40.0D AS gmv_initial, 0.0D AS gmv_refund, 6.0D AS final_revenue_usd,
        |  1.0D AS final_consolidation_revenue, 2.0D AS final_gross_profit_usd,
        |  1.5D AS final_consolidation_profit_usd, 4.0D AS final_total_cost_usd,
        |  10 AS warranty_duration, 45 AS warranty_duration_max,
        |  DATE'2024-06-18' AS warranty_start_dt, DATE'2024-07-23' AS warranty_end_dt,
        |  5 AS delivery_estimate_min_days, 15 AS delivery_estimate_max_days,
        |  14.0D AS delivery_duration_user, 12.0D AS delivery_duration_tracking,
        |  TIMESTAMP'2024-06-09 00:00:00' AS check_in_time_utc,
        |  DATE'2024-06-08' AS order_created_date_msk,
        |  TIMESTAMP'2024-06-08 00:10:00' AS order_created_time_utc,
        |  TIMESTAMP'2024-06-08 20:00:00' AS order_fulfilled_online_time_utc,
        |  CAST(NULL AS TIMESTAMP) AS consolidation_in_checkpoint_time_utc,
        |  CAST(NULL AS TIMESTAMP) AS consolidation_out_checkpoint_time_utc,
        |  TIMESTAMP'2024-06-10 00:00:00' AS check_out_time_utc,
        |  TIMESTAMP'2024-06-11 00:00:00' AS outbound_time_utc,
        |  TIMESTAMP'2024-06-12 00:00:00' AS tracking_origin_country_time_utc,
        |  TIMESTAMP'2024-06-13 00:00:00' AS tracking_in_transit_time_utc,
        |  TIMESTAMP'2024-06-14 00:00:00' AS tracking_international_time_utc,
        |  TIMESTAMP'2024-06-18 00:00:00' AS tracking_destination_country_time_utc,
        |  TIMESTAMP'2024-06-19 00:00:00' AS tracking_issuing_point_time_utc,
        |  TIMESTAMP'2024-06-21 00:00:00' AS tracking_delivered_time_utc,
        |  CAST(NULL AS TIMESTAMP) AS tracking_returned_time_utc,
        |  'delivered' AS tracking_status, 8L AS merchant_id
        |UNION ALL
        |SELECT '11', 'SO11', 'G11', 'P11', 'TRK11', 8L, 'd8',
        |  'FR', 'cn', false, false, 'CN', DATE'2024-06-15', 'post',
        |  'hecny', 'offline', 'offline', 'ch2', 'ch2', 1L, false, NULL, false,
        |  true, 'notShippedOnTime', 0.8D, 1.0D, 1, 90.0D, 90.0D, 0.0D, 0.0D,
        |  0.0D, 0.0D, 1.0D, 10, 45, DATE'2024-06-25', DATE'2024-07-30', 5, 15,
        |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  CAST(NULL AS TIMESTAMP), DATE'2024-06-15', TIMESTAMP'2024-06-15 00:10:00',
        |  CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
        |  CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
        |  CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
        |  CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
        |  'created', 8L""".stripMargin))
    ctx.sources.register("mongo", "merchant_order_order_metric_notes_daily_snapshot")(s =>
      s.sql("SELECT 'MO11' AS _id, map('cancelRate', map('ignored', named_struct('value', true))) AS metrics"))
    ctx.sources.register("mongo", "merchant_order")(s => s.sql(
      """SELECT 'MO11' AS order_id, 'cancelledByMerchant' AS status,
        |  named_struct('merchant_reason', 'notShippedOnTime') AS refund,
        |  named_struct('id', '11', 'kind', 'joom') AS source, 'F11' AS friendly_id,
        |  3.0D AS cft, TIMESTAMP'2024-06-15 00:00:00' AS created_time_utc
        |UNION ALL
        |SELECT 'MO22', 'cancelledByMerchant',
        |  named_struct('merchant_reason', 'notShippedOnTime'),
        |  named_struct('id', '22', 'kind', 'joom'), 'F22',
        |  3.0D, TIMESTAMP'2024-06-20 00:00:00'""".stripMargin))
    ctx.sources.register("merchant", "order_data")(s => {
      import s.implicits._
      Seq(("F11", 172800000L)).toDF("friendly_id", "aft")
    })
    // raw catalog table (user_points_transactions joins ads.referral_bloggers
    // without source()): u8 is a registered blogger -> admin_bloggers arm
    val adsLoc = TempDirs.create("graft_slice_ads")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ads LOCATION '$adsLoc'")
    try {
      Seq("u8").toDF("user_id").write.mode("overwrite")
        .option("path", s"$adsLoc/referral_bloggers").saveAsTable("ads.referral_bloggers")

      // ---- the 20 verbatim nodes ----------------------------------------
      def auto(name: String, path: String): Model =
        SqlTemplater.sqlModelAuto(name, readSql(path), macros, ctx.vars)
      val ephemeralExpanded = SqlTemplater.expandMacros(
        readSql("models/spark/gold/gold_active_devices_with_ephemeral.sql"), macros)
      val nodes = Seq(
        Model("gold_regions_source", c => c.spark.read.option("header", "true")
          .option("inferSchema", "true").csv(s"$ref/seeds/gold_regions_source.csv")),
        Model("countries_properties_seed", c => c.spark.read.option("header", "true")
          .option("inferSchema", "true").csv(s"$ref/seeds/countries_properties_seed.csv")),
        auto("gold_regions", "models/spark/gold/gold_regions.sql"),
        auto("countries_properties", "models/spark/seeds_to_bq/countries_properties.sql"),
        auto("gold_countries", "models/spark/gold/gold_countries.sql"),
        auto("active_devices_funnel", "models/spark/base/active_devices_funnel.sql"),
        auto("active_devices", "models/spark/base/active_devices.sql"),
        auto("active_users", "models/spark/base/active_users.sql"),
        auto("fact_user_points_transactions", "models/spark/mart/fact_user_points_transactions.sql"),
        auto("user_points_transactions", "models/spark/dashboards/user_points_transactions.sql"),
        auto("bloggers", "models/spark/core/bloggers/bloggers.sql"),
        auto("gold_merchant_categories", "models/spark/gold/gold_merchant_categories.sql"),
        auto("gold_merchants", "models/spark/gold/gold_merchants.sql"),
        auto("user_segments", "models/spark/engagement/user_segments.sql"),
        auto("joom_babylone_tickets", "models/spark/core/support/joom_babylone_tickets.sql"),
        auto("gold_logistics_orders", "models/spark/gold/gold_logistics_orders.sql"),
        auto("gold_orders", "models/spark/gold/gold_orders.sql"),
        auto("orders", "models/spark/base/orders.sql"),
        SqlTemplater.sqlModelAuto("gold_active_devices_with_ephemeral",
          ephemeralExpanded, macros, ctx.vars),
        auto("gold_active_devices", "models/spark/gold/gold_active_devices.sql"),
        auto("gold_active_real_users", "models/spark/gold/gold_active_real_users.sql"))
      assert(nodes.size == 21)

      // the reference ran on a non-ANSI Spark 3 Thrift Server (see
      // GoldOrdersRealSpec): FILTER(...)[0] on empty arrays must yield NULL
      val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
      spark.conf.set("spark.sql.ansi.enabled", "false")
      try {
        val dag = new DagRunner(nodes)
        def runAll(): Unit =
          for ((n, st) <- dag.run(ctx))
            assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")
        runAll() // FULL

        // ---- per-node assertions (counts + key aggregates) ---------------
        def n(name: String): Long = ctx.ref(name).count()
        val regionRows = n("gold_regions_source")
        assert(regionRows > 200, s"seed rows: $regionRows")
        assert(n("gold_regions") == regionRows)
        val cpRows = n("countries_properties_seed")
        assert(cpRows > 10 && n("countries_properties") == cpRows)
        // gold_countries is DISTINCT over country_code
        assert(n("gold_countries") ==
          ctx.ref("gold_regions_source").select("country_code").distinct().count())
        assert(ctx.ref("gold_countries").where($"country_code" === "DE")
          .selectExpr("region_name", "top_country_code").as[(String, String)]
          .head() == ("Europe", "DE"))

        // funnel: 3 distinct (device, day) across both funnel sources
        assert(n("active_devices_funnel") == 3)
        // device/user-day grain: 10 planted days each
        assert(n("active_devices") == 10 && n("active_users") == 10)
        assert(ctx.ref("active_devices")
          .where($"device_id" === "d7" && $"day" === "2024-06-01")
          .selectExpr("is_product_opened", "is_cart_opened", "is_new_user")
          .as[(Boolean, Boolean, Boolean)].head() == ((true, true, true)))

        // points: 4 docs in, finalize row excluded, orphan-pending excluded
        assert(n("fact_user_points_transactions") == 4)
        val upt = ctx.ref("user_points_transactions")
        assert(upt.count() == 2, upt.collect().mkString(";"))
        val uptRows = upt.selectExpr("user_id", "point_transaction_type",
          "technical_point_transaction_type", "point_transaction_group",
          "CAST(point_usd AS DOUBLE)")
          .as[(String, String, String, String, Double)].collect().toSet
        assert(uptRows == Set(
          // pending cashback takes the FINALIZED 5.0, not its own 2.0
          ("u7", "cashback", "cashback", "Marketing", 5.0),
          // admin + referral_bloggers member -> admin_bloggers -> Marketing
          ("u8", "admin", "admin_bloggers", "Marketing", 3.0)), uptRows.toString)
        // bloggers: referral 7 (payout stats) + brand u8 (admin upt row)
        assert(ctx.ref("bloggers").as[(String, String)].collect().toSet ==
          Set(("7", "referral"), ("u8", "brand")))

        assert(n("gold_merchant_categories") == 10)
        assert(ctx.ref("gold_merchant_categories")
          .where($"merchant_category_id" === 2).select("business_line")
          .as[String].head() == "Electronics & HA")
        assert(ctx.ref("gold_merchant_categories")
          .where($"merchant_category_id" === 5).select("business_line")
          .as[String].head() == "Other")
        assert(n("gold_merchants") == 3)

        // tickets: one per exploded (event, order_id); active_users join fills
        // platform/country for the u7/u8 activity days
        val tix = ctx.ref("joom_babylone_tickets")
          .selectExpr("user_id", "order_id", "ticket_id", "platform", "country")
          .as[(String, String, Long, String, String)].collect().toSet
        assert(tix == Set(("u7", "5", 500L, "ios", "DE"),
          ("u8", "F3", 300L, "ios", "FR")), tix.toString)

        // logistics: '5' keeps JL delivery + FBJ flags, FR geo resolves
        val lg = ctx.ref("gold_logistics_orders")
          .selectExpr("order_id", "is_delivered_by_jl", "is_fbj", "region_name",
            "business_line", "CAST(fulfilling_duration AS DOUBLE)")
          .as[(String, Boolean, Boolean, String, String, Option[Double])].collect().toSet
        assert(lg == Set(
          ("5", true, true, "Europe", "Other", Some(1.0)),
          ("11", false, false, "Europe", "Other", None)), lg.toString)

        // gold_orders: the fraud order is gone, everything else exactly once
        val go = ctx.ref("gold_orders").cache()
        assert(go.count() == 9)
        def goCell(id: String, c: String): Any =
          go.where($"order_id" === id).select(c).head().get(0)
        assert(goCell("11", "detailed_refund_reason") == "pickupProviderFault")
        assert(goCell("22", "detailed_refund_reason") == "notShippedOnTime")
        assert(goCell("7", "detailed_refund_reason") == "badQuality")
        assert(goCell("8", "is_with_special_price") == true)
        assert(goCell("5", "is_delivered") == true && goCell("5", "support_ticket_id") == 500L)
        assert(goCell("3", "support_ticket_id") == 300L)
        // user 7 is a referral blogger via the REAL bloggers chain
        assert(goCell("1", "blogger_type") == "referral")
        assert(go.agg(org.apache.spark.sql.functions.sum($"gmv_initial"))
          .head().getDouble(0) == 540.0) // 550 planted - 10 fraud

        // base/orders (350 LoC, the CORE base fact): fraud filtered, ticket
        // attach via BOTH key shapes, dictionary decode, rating roll-up,
        // is_new_user from the REAL active_devices chain
        val bo = ctx.ref("orders").cache()
        assert(bo.count() == 9) // fraud order 13 is gone
        def boCell(id: String, c: String): Any =
          bo.where($"order_id" === id).select(c).head().get(0)
        // support_ticket_id: order '5' matches by order_id, order '3' only
        // via friendly_order_id ('F3') — the COALESCE(b, c) double join
        assert(boCell("5", "support_ticket_id") == 500L)
        assert(boCell("3", "support_ticket_id") == 300L)
        // customer reason 4 -> badQuality; a MERCHANT refund has no customer
        // reason -> 'none' (unlike gold_orders' merchant-note decode)
        assert(boCell("7", "detailed_refund_reason") == "badQuality")
        assert(boCell("11", "detailed_refund_reason") == "none")
        assert(boCell("7", "is_quality_refund") == true)
        assert(boCell("11", "is_quality_refund") == false)
        // rating_counts struct roll-up: 15 reviews, mean 55/15 -> 3.7
        assert(boCell("1", "number_of_reviews") == 15L)
        assert(boCell("1", "product_rating") == 3.7)
        assert(boCell("1", "is_product_with_stable_rating") == true)
        // join-month flag: June orders yes, the July order no
        assert(boCell("1", "is_join_month_order") == true)
        assert(boCell("8", "is_join_month_order") == false)
        // is_new_user comes from the REAL active_devices output: d7 joined
        // 2024-06-01, so its 06-01 order is new and its 06-02 order is not
        assert(boCell("1", "is_new_user") == true)
        assert(boCell("2", "is_new_user") == false)
        // per-item money + shipping-type coalesce (k odd -> null -> offline)
        assert(boCell("1", "item_gmv") == 50.0) // gmv 100 / qty 2
        assert(boCell("1", "shipping_type") == "offline")
        assert(boCell("2", "shipping_type") == "online")
        assert(boCell("1", "ecgp_in_gmv") == 0.15)
        // delivered order finalized via the logistics tracking override
        assert(boCell("5", "is_finalized") == true)
        // refund_date_msk: created 06-01 + 10d, +3h MSK -> 2024-06-11
        assert(String.valueOf(boCell("7", "refund_date_msk")) == "2024-06-11")
        // every product_id is distinct in the cast -> first purchase each
        assert(bo.selectExpr("max(product_order_number)").head().getInt(0) == 1)
        bo.unpersist()

        // segments exist for each user with the canonical labels only
        val segs = ctx.ref("user_segments")
        assert(segs.select("real_user_id").distinct().count() == 3)
        assert(segs.select("user_segment").distinct().as[String].collect().toSet
          .subsetOf(Set("Frequent buyers", "Regular buyers", "Occasional buyers", "Non-buyers")))

        // ephemeral macro output keeps all 10 device-days (incl. d10's one
        // ephemeral day); the view drops the ephemeral device
        assert(n("gold_active_devices_with_ephemeral") == 10)
        assert(n("gold_active_devices") == 9)
        assert(ctx.ref("gold_active_devices_with_ephemeral")
          .where($"device_id" === "d10").select("is_ephemeral_device")
          .as[Boolean].head() == true)

        // ---- tail: gold_active_real_users, hand-pinned -------------------
        val tail = ctx.ref("gold_active_real_users").cache()
        assert(tail.count() == 9) // u7:4 days, u8:3, u9:2
        val u7 = tail.where($"real_user_id" === 7)
          .selectExpr("CAST(date_msk AS STRING)", "is_new_real_user",
            "previous_activity_real_user_group", "gmv_per_day_initial",
            "number_of_orders", "is_payer", "is_rd1", "is_rw1", "is_rw2",
            "is_churned_14", "country_code", "region_name")
          .as[(String, Boolean, String, Double, Long, Boolean, Boolean, Boolean,
               Boolean, Boolean, String, String)].collect().toSet
        // country = the gmv-weighted vote: on order days the ORDER's
        // shipping country (fr for k1/k2/k8, de for k9 via %3) outvotes the
        // device's activity country — the macro's adjusted_slices semantics
        assert(u7 == Set(
          // 06-01: join day, k1 (100, fr); next day active -> rd1; 06-02 in rw1
          ("2024-06-01", true, "new", 100.0, 1L, true, true, true, true, false, "FR", "Europe"),
          // 06-02: k2 (50, fr); next activity 06-10 = +8 days -> rw2 only
          ("2024-06-02", false, "regular", 50.0, 1L, true, false, false, true, false, "FR", "Europe"),
          // 06-10: k9 (30; 9%3=0 -> de); next activity 07-01 = +21 days -> churned_14
          ("2024-06-10", false, "regular", 30.0, 1L, true, false, false, false, true, "DE", "Europe"),
          // 07-01: k8 (60, fr); tail day -> churned
          ("2024-07-01", false, "regular", 60.0, 1L, true, false, false, false, true, "FR", "Europe")),
          u7.toSeq.sortBy(_._1).mkString("\n"))
        // u9: the k7 order (fr) outvotes the device's unknown 'zz' country
        assert(tail.where($"real_user_id" === 9 && $"date_msk" === "2024-06-01")
          .selectExpr("country_code", "region_name", "gmv_per_day_initial")
          .as[(String, String, Double)].head() == (("FR", "Europe", 70.0)))

        // dup singular tests on the two grain-critical nodes
        val dups = SingularTests.run(ctx, Seq(
          TestArchetypes.dupKeyCheck("gold_orders", Seq("order_id")),
          TestArchetypes.dupKeyCheck("gold_active_real_users",
            Seq("real_user_id", "date_msk"))))
        assert(dups.forall(_.passed), dups.filterNot(_.passed).toString)

        // ---- INCREMENTAL second run: insert_overwrite lookbacks replay ----
        runAll()
        assert(ctx.ref("gold_orders").count() == 9)
        assert(ctx.ref("orders").count() == 9)
        assert(ctx.ref("gold_active_real_users").count() == 9)
        assert(ctx.ref("gold_active_real_users").where($"real_user_id" === 7)
          .agg(org.apache.spark.sql.functions.sum($"gmv_per_day_initial"))
          .head().getDouble(0) == 240.0)
        assert(ctx.ref("active_devices").count() == 10)
        go.unpersist(); tail.unpersist()
      } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS ads CASCADE")
      star.unpersist()
    }
  }
}
