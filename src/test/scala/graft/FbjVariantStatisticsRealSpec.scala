package graft

import graft.runtime._

/** models/spark/category_management/fbj/fbj_variant_statistics.sql (677 LoC)
  * executed VERBATIM — the widest dependency fan-in executed so far (4 refs
  * + 11 sources + a raw `models.*` catalog table): a calendar-driven base
  * (stock ⟗ demand ⟗ replenishments triple FULL JOIN), 1/7/14/30-day
  * conditional order windows with days-of-stock ratios, a replenishment
  * status machine using LATERAL COLUMN ALIASES (`qty_created` referenced in
  * a sibling CASE) and LEADING-DIGIT identifiers (`vrs.2_qty_in_pending_inbound`),
  * FIFO paid-storage bucketing via LEAST/GREATEST chains, triple-nested
  * Mongo EXPLODE (statusHistory → boxes → stocks), micro-price currency
  * conversion through a raw catalog rate table, and an 11-branch
  * stock-status decision CASE.
  *
  * One variant is observed on two calendar days: day 1 exists only through
  * a replenishment (no stock), day 2 has stock, demand, an order, promo,
  * label, tier, counters, and rating — every asserted cell hand-computed.
  */
class FbjVariantStatisticsRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL fbj_variant_statistics.sql (677 LoC): 16-input variant panel, hand-tallied") {
    val ctx = freshCtx(vars = Map(
      "start_date_ymd" -> "2024-07-02", "end_date_ymd" -> "2024-07-03"))

    // ---- refs --------------------------------------------------------
    ctx.warehouse.createTable("fbj_product_stocks", spark.sql(
      """SELECT DATE'2024-07-03' AS partition_date, 'V1' AS product_variant_id,
        |  'P1' AS product_id, 'LP1' AS logistics_product_id,
        |  named_struct('h', 10, 'l', 20, 'w', 30) AS product_dimensions,
        |  5L AS number_of_products_in_stock,
        |  2L AS number_of_products_in_pending_stock""".stripMargin))

    ctx.warehouse.createTable("fbj_merchant_replenishments", spark.sql(
      """SELECT DATE'2024-07-01' AS partition_date, 'V1' AS variant_id,
        |  'P1' AS product_id, '2. Pending Inbound' AS current_status,
        |  CAST(NULL AS TIMESTAMP) AS completed_dt,
        |  TIMESTAMP'2024-07-01 12:00:00' AS last_updated_at,
        |  TIMESTAMP'2024-07-01 09:00:00' AS created_at,
        |  TIMESTAMP'2024-07-01 12:00:00' AS `2_pending_inbound_dt`,
        |  CAST(NULL AS TIMESTAMP) AS `3_pending_shipping_dt`,
        |  CAST(NULL AS TIMESTAMP) AS `4_shipped_dt`,
        |  CAST(NULL AS TIMESTAMP) AS `5_action_required_dt`,
        |  CAST(NULL AS TIMESTAMP) AS `6_on_review_dt`,
        |  10L AS requested_count, 8L AS accepted_count,
        |  'R1' AS replenishment_id, 'M1' AS merchant_id,
        |  CAST(3.0 AS DOUBLE) AS create_to_complete_days""".stripMargin))

    ctx.warehouse.createTable("gold_orders", spark.sql(
      """SELECT TIMESTAMP'2024-07-02 10:00:00' AS order_datetime_utc,
        |  'V1' AS product_variant_id, true AS is_fbj, 2L AS product_quantity,
        |  'g1' AS order_id""".stripMargin))

    ctx.warehouse.createTable("gold_products", spark.sql(
      """SELECT 'P1' AS product_id, 'M1' AS merchant_id, 'Widget' AS product_name,
        |  'Health' AS business_line, 1L AS l1_merchant_category_id,
        |  'Cat1' AS l1_merchant_category_name, 2L AS l2_merchant_category_id,
        |  'Cat2' AS l2_merchant_category_name""".stripMargin))

    // ---- sources -----------------------------------------------------
    ctx.sources.register("mart", "product_events")(sp => sp.sql(
      """SELECT DATE'2024-07-02' AS partition_date, 'fbjProcessingResult' AS type,
        |  'P1' AS product_id,
        |  named_struct('skuId', 'V1', 'productId', 'P1', 'result', 'enabled') AS payload""".stripMargin))

    ctx.sources.register("category_management", "merchant_kam_materialized")(sp => sp.sql(
      """SELECT TIMESTAMP'2024-07-01 00:00:00' AS quarter, 'M1' AS merchant_id,
        |  'Acme' AS merchant_name, 'AcmeGroup' AS main_merchant_name,
        |  'kam@x.io' AS kam_email""".stripMargin))

    ctx.sources.register("mongo", "logistics_replenishments_stock_daily_snapshot")(sp => sp.sql(
      """SELECT 'LP1' AS pid, TIMESTAMP'2024-06-25 08:00:00' AS ct, 4L AS s,
        |  'RV1' AS rid""".stripMargin))

    ctx.sources.register("mongo", "logistics_replenishments_v3_daily_snapshot")(sp => sp.sql(
      """SELECT 'RV1' AS _id, 1 AS source,
        |  array(named_struct('status', 10, 'uTm', TIMESTAMP'2024-06-18 00:00:00'),
        |        named_struct('status', 30, 'uTm', TIMESTAMP'2024-06-20 00:00:00')) AS statusHistory,
        |  array(named_struct('stocks', array(named_struct('extid', 'V1')))) AS boxes""".stripMargin))

    ctx.sources.register("mart", "promotions")(sp => sp.sql(
      """SELECT 'P1' AS product_id, TIMESTAMP'2024-07-01 00:00:00' AS promo_start_time_utc,
        |  TIMESTAMP'2024-07-10 00:00:00' AS promo_end_time_utc,
        |  15 AS discount, 'pr1' AS promo_id""".stripMargin))

    ctx.sources.register("goods", "product_labels")(sp => sp.sql(
      "SELECT 'P1' AS product_id, DATE'2024-07-02' AS partition_date, 'joom_select' AS label"))

    ctx.sources.register("mart", "dim_published_variant_with_merchant")(sp => sp.sql(
      """SELECT 'V1' AS variant_id, true AS public, 2500000L AS price, 'EUR' AS currency,
        |  TIMESTAMP'2024-06-01 00:00:00' AS effective_ts,
        |  TIMESTAMP'2025-01-01 00:00:00' AS next_effective_ts""".stripMargin))

    ctx.sources.register("mart", "dim_published_product_min")(sp => sp.sql(
      """SELECT 'P1' AS product_id, true AS public,
        |  TIMESTAMP'2024-06-01 00:00:00' AS effective_ts,
        |  TIMESTAMP'2025-01-01 00:00:00' AS next_effective_ts""".stripMargin))

    ctx.sources.register("platform", "context_product_counters_v5")(sp => sp.sql(
      """SELECT 'P1' AS product_id, DATE'2024-07-02' AS partition_date,
        |  'search' AS context_name, 7L AS open_count, 20L AS preview_count""".stripMargin))

    ctx.sources.register("goods", "product_tiers")(sp => sp.sql(
      "SELECT 'P1' AS product_id, DATE'2024-07-02' AS partition_date, 'A' AS tier"))

    ctx.sources.register("logistics_mart", "fact_order")(sp => sp.sql(
      """SELECT 'V1' AS product_variant_id,
        |  TIMESTAMP'2024-07-02 09:00:00' AS order_fulfilled_online_time_utc,
        |  true AS is_fbj_order, 'CN' AS warehouse_country, 'N1' AS order_number,
        |  CAST(NULL AS TIMESTAMP) AS order_cancellation_time_utc, 3L AS quantity""".stripMargin))

    ctx.sources.register("mart", "product_rating_counters")(sp => sp.sql(
      """SELECT 'P1' AS product_id,
        |  named_struct('count_1_star', 0L, 'count_2_star', 0L, 'count_3_star', 1L,
        |    'count_4_star', 1L, 'count_5_star', 2L) AS rating_counts,
        |  TIMESTAMP'2024-06-01 00:00:00' AS effective_ts,
        |  TIMESTAMP'2025-01-01 00:00:00' AS next_effective_ts""".stripMargin))

    // the raw models.dim_pair_currency_rate catalog table
    val dbLoc = TempDirs.create("graft_modelsdb")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS models LOCATION '$dbLoc'")
    try {
      spark.sql(
        """SELECT 'EUR' AS currency_code, 'USD' AS currency_code_to,
          |  CAST(1.1 AS DOUBLE) AS rate, DATE'2024-07-01' AS effective_date
          |UNION ALL SELECT 'EUR', 'USD', 1.1, DATE'2024-07-02'""".stripMargin)
        .write.mode("overwrite").option("path", s"$dbLoc/dim_pair_currency_rate")
        .saveAsTable("models.dim_pair_currency_rate")

      val model = SqlTemplater.sqlModelAuto("fbj_variant_statistics",
        java.nio.file.Files.readString(java.nio.file.Paths.get(
          "/root/reference/models/spark/category_management/fbj/fbj_variant_statistics.sql")))
      new DagRunner(Seq(model)).run(ctx, selectors = Seq("fbj_variant_statistics"))
        .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

      val out = ctx.ref("fbj_variant_statistics")
      assert(out.count() == 2) // day 1 via replenishment only, day 2 full

      val d2 = out.filter($"partition_date" === "2024-07-02").selectExpr(
        "variant_id", "product_id", "merchant_id", "number_in_stock",
        "enabled_flg", "last_demand_status", "orders_cnt", "quantity_cnt",
        "CAST(to_7 AS DOUBLE)", "CAST(to_30 AS DOUBLE)", "qty_created",
        "`2_qty_in_pending_inbound`", "last_replenishment_status",
        "CAST(variant_cancel_rate AS DOUBLE)", "relp_amount_30d", "ps_lt30",
        "paid_status", "discount", "is_product_in_promo", "is_product_joom_select",
        "CAST(first_time_in_stock AS STRING)", "stock_status",
        "is_variant_public", "CAST(variant_merchant_price_usd AS DOUBLE)",
        "opens", "search_previews", "tier", "product_name", "merchant_name",
        "kam", "fulfilled_amount", "CAST(product_rating AS DOUBLE)")
        .collect().head
      // hand-tally for 2024-07-02: stock 5, one fbj order of 2 units ->
      // to_7 = 5/2*7 = 17.5, to_30 = 75 -> deadstock; the pending-inbound
      // replenishment (10 units, created the day before) -> 'In Progress';
      // 4 units arrived within 30d -> ps_lt30 = 4, the LEAST/GREATEST
      // chains leave nothing in the paid buckets -> 'free'; price 2.5 EUR
      // micro * 1.1 = 2.75 USD; rating (3+4+10)/4 = 4.25
      assert(d2.getString(0) == "V1" && d2.getString(1) == "P1" && d2.getString(2) == "M1")
      assert(d2.getLong(3) == 5L && d2.getInt(4) == 1 && d2.getString(5) == "enabled")
      assert(d2.getLong(6) == 1L && d2.getLong(7) == 2L)
      assert(d2.getDouble(8) == 17.5 && d2.getDouble(9) == 75.0)
      assert(d2.getLong(10) == 0L && d2.getLong(11) == 10L)
      assert(d2.getString(12) == "In Progress" && d2.getDouble(13) == 0.0)
      assert(d2.getLong(14) == 4L && d2.getLong(15) == 4L && d2.getString(16) == "free")
      assert(d2.getInt(17) == 15 && d2.getInt(18) == 1 && d2.getInt(19) == 1)
      assert(d2.getString(20) == "2024-06-20 00:00:00")
      assert(d2.getString(21) == "In stock, deadstock")
      assert(d2.getBoolean(22) && d2.getDouble(23) == 2.75)
      assert(d2.getLong(24) == 7L && d2.getLong(25) == 20L && d2.getString(26) == "A")
      assert(d2.getString(27) == "Widget" && d2.getString(28) == "Acme"
        && d2.getString(29) == "kam@x.io")
      assert(d2.getLong(30) == 3L && d2.getDouble(31) == 4.25)

      val d1 = out.filter($"partition_date" === "2024-07-01").selectExpr(
        "variant_id", "number_in_stock", "enabled_flg", "orders_cnt",
        "qty_created", "last_replenishment_status", "stock_status",
        "is_product_joom_select", "merchant_name")
        .collect().head
      // day 1 exists only through the replenishment: no stock, disabled,
      // created-today quantity 10 -> 'Has new replenishment'; the variant
      // HAS been in stock before (2024-06-20) -> 'No stock, OLD, disabled'
      assert(d1.getString(0) == "V1" && d1.getLong(1) == 0L && d1.getInt(2) == 0)
      assert(d1.getLong(3) == 0L && d1.getLong(4) == 10L)
      assert(d1.getString(5) == "Has new replenishment")
      assert(d1.getString(6) == "No stock, OLD, disabled")
      assert(d1.getInt(7) == 0 && d1.getString(8) == "Acme")
    } finally {
      spark.sql("DROP DATABASE IF EXISTS models CASCADE")
    }
  }
}
