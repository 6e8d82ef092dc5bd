package graft

import graft.runtime._

/** models/spark/onfy/onfy_search_conversion.sql (427 LoC) executed VERBATIM:
  * the search-side conversion funnel — robot flag from nested
  * `device_stats.preview.total_num`, serp-item position roll-up
  * (MIN v_pos/h_pos), per-(device, product, event-type) sessionization,
  * search→open / search→add / add→order interval joins, last-365-day
  * lookbacks, MIN_BY marketing-source attribution over validity windows,
  * and the final non-additive per-search grouping. One device walks
  * search → open → add → order, hand-tallied. */
class OnfySearchConversionRealSpec extends SparkSpec {
  import spark.implicits._

  private val day = java.time.LocalDate.now().minusDays(1).toString

  test("REAL onfy_search_conversion.sql (427 LoC): search funnel hand-tallied") {
    val ctx = freshCtx()

    ctx.warehouse.createTable("sources", spark.sql(
      s"""SELECT 'd1' AS device_id, 'google' AS source_corrected,
         |  TIMESTAMP'$day 00:00:00' - INTERVAL 1 DAY AS source_dt,
         |  TIMESTAMP'$day 00:00:00' + INTERVAL 1 DAY AS next_source_dt""".stripMargin))

    ctx.warehouse.createTable("orders_info", spark.sql(
      s"""SELECT 'o1' AS order_id, 'd1' AS device_id, 'p1' AS product_id,
         |  'Aspirin' AS product_name, 'Z1' AS pzn,
         |  TIMESTAMP'$day 11:00:00' AS order_created_time_cet,
         |  CAST(10.0 AS DOUBLE) AS before_products_price,
         |  CAST(8.0 AS DOUBLE) AS products_price""".stripMargin))

    ctx.sources.register("onfy", "search_serp_requests_i")(sp => sp.sql(
      s"""SELECT 'd1' AS device_id, named_struct('osType', 'desktop') AS device,
         |  named_struct('preview', named_struct('total_num', 3L)) AS device_stats,
         |  's1' AS serp_id, CAST(NULL AS BIGINT) AS category_id,
         |  DATE'$day' AS partition_date_cet,
         |  TO_UTC_TIMESTAMP(TIMESTAMP'$day 10:00:00', 'Europe/Berlin') AS event_ts_utc,
         |  'aspirin' AS query, true AS has_product_results, false AS is_suggest""".stripMargin))

    ctx.sources.register("onfy", "search_serp_items_i")(sp => sp.sql(
      s"""SELECT 's1' AS serp_id, 'p1' AS product_id, true AS has_preview,
         |  'spk' AS sponsored_key, 1 AS v_pos, 2 AS h_pos,
         |  DATE'$day' AS partition_date_cet""".stripMargin))

    ctx.sources.register("onfy_mart", "device_events")(sp => sp.sql(
      s"""SELECT 'd1' AS device_id, 'e_op' AS event_id,
         |  TIMESTAMP'$day 10:05:00' AS event_ts_cet, DATE'$day' AS partition_date_cet,
         |  'productOpen' AS type,
         |  named_struct('productId', 'p1', 'productName', 'Aspirin', 'pzn', 'Z1') AS payload
         |UNION ALL
         |SELECT 'd1', 'e_ad', TIMESTAMP'$day 10:10:00', DATE'$day', 'addToCart',
         |  named_struct('productId', 'p1', 'productName', 'Aspirin', 'pzn', 'Z1')""".stripMargin))

    val model = SqlTemplater.sqlModelAuto("onfy_search_conversion",
      java.nio.file.Files.readString(java.nio.file.Paths.get(
        "/root/reference/models/spark/onfy/onfy_search_conversion.sql")))
    new DagRunner(Seq(model)).run(ctx, selectors = Seq("onfy_search_conversion"))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    val rows = ctx.ref("onfy_search_conversion").selectExpr(
      "CAST(search_event_date AS STRING)", "search_event_id", "search_query",
      "is_category_search", "has_product_results", "search_or_catalog_flg",
      "platform", "is_not_robot_flg", "marketing_source", "product_id",
      "product_name", "pzn", "is_sponsored", "opening_event_id",
      "adding_event_id", "order_id", "order_before_products_price",
      "order_products_price")
      .as[(String, String, String, Boolean, Boolean, String, String, Boolean,
        String, String, String, String, Boolean, String, String, String,
        Double, Double)].collect().toSet
    // hand-tally: one serp with one previewed product; the open (10:05) and
    // add (10:10) land inside the 30-min window, the order (11:00) inside
    // 36h; marketing source attributed from the surrounding validity window;
    // device_stats.preview.total_num = 3 -> not a robot
    assert(rows == Set(
      (day, "s1", "aspirin", false, true, "search", "desktop", true, "google",
        "p1", "Aspirin", "Z1", true, "e_op", "e_ad", "o1", 10.0, 8.0)),
      rows.mkString("\n"))
  }
}
