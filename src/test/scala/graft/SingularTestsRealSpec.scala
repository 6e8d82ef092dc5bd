package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.runtime._

/** ALL 25 reference singular test files executed VERBATIM through the
  * engine's test runner against one clean planted fixture. 24 pass
  * (zero offending rows); the one inherent volume floor
  * (products_number_mobile_scrapper_check requires ≥100M distinct ids in
  * the last 3 days) correctly flags the tiny fixture — the engine executes
  * the threshold faithfully rather than vacuously passing it. Covers the
  * corpus's real test shapes: HAVING over COUNT("*"), fractional null
  * thresholds, volume drift bands with dayofmonth gating, LEFT ANTI sat
  * checks, window MAX() OVER () freshness, and cube/category count
  * reconciliation.
  */
class SingularTestsRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL: all 25 singular test files execute verbatim; 24 pass, 1 volume floor flags") {
    val ctx = freshCtx()

    ctx.warehouse.createTable("procurement_orders",
      Seq("PO1", "PO2").toDF("procurement_order_id"))

    ctx.sources.register("joompro_analytics_mart", "mercadolibre_products_snapshot")(sp => sp.sql(
      """SELECT 'MLB1' AS id, 'P9' AS product_id, 'BrandX' AS brand_name,
        |  'active' AS activity_status, 'C1' AS category_id,
        |  DATE'2024-01-05' AS listing_creation_date,
        |  TIMESTAMP'2024-01-05 00:00:00' AS effective_ts,
        |  5L AS shop_id, 'Shop' AS shop_name, 'http://s' AS shop_url""".stripMargin))

    ctx.sources.register("joompro_analytics_mart", "cube_mlb_products")(sp => sp.sql(
      "SELECT 'MLB1' AS id"))
    ctx.sources.register("joompro_analytics_mart", "cube_mlb_connected_stores_listings")(sp => sp.sql(
      "SELECT 'MLB1' AS id, 3L AS competing_products_count"))
    ctx.sources.register("joompro_analytics_mart", "items_parsed_number")(sp => sp.sql(
      "SELECT DATE'2024-07-02' AS partition_date, 90L AS products_parsed, 100L AS products_in_api"))

    ctx.sources.register("joompro_analytics", "mercadolibre_categories_cube_js_monthly")(sp => sp.sql(
      """SELECT 'C1' AS category_id, true AS is_current,
        |  CAST(1000.0 AS DOUBLE) AS gmv_1m, 'L2' AS l2_id,
        |  DATE'2024-07-02' AS partition_date""".stripMargin))
    ctx.sources.register("joompro_analytics", "mercadolibre_categories_reviews_cube_js_weekly")(sp => sp.sql(
      """SELECT true AS is_current, CAST(900.0 AS DOUBLE) AS gmv_1w,
        |  'L2' AS l2_id, DATE'2024-07-02' AS partition_date""".stripMargin))
    ctx.sources.register("joompro_analytics", "product_tracker_items")(sp => sp.sql(
      "SELECT 'MLB1' AS id"))
    ctx.sources.register("joompro_analytics", "ods_mlb_mobile_api_product_previews")(sp => sp.sql(
      "SELECT 'MLB1' AS id, CURRENT_DATE() AS partition_date"))
    ctx.sources.register("joompro_analytics", "dim_product_creation_date")(sp => sp.sql(
      "SELECT 'P9' AS product_id"))

    ctx.sources.register("joompro_mart", "mercadolibre_categories_view")(sp => sp.sql(
      "SELECT 'C1' AS category_id, TIMESTAMP'2024-01-01 00:00:00' AS date_created"))
    ctx.sources.register("joompro_mart", "mercadolibre_categories")(sp => sp.sql(
      "SELECT 1 AS level, 1L AS total_items"))

    val files = {
      val walk = Files.walk(Paths.get("/root/reference/tests"))
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".sql")).toList.sortBy(_.toString)
      finally walk.close()
    }
    assert(files.size == 25, s"expected 25 test files, found ${files.size}")

    val tests = files.map(p => SingularTests.sqlTest(
      p.getFileName.toString.stripSuffix(".sql"), Files.readString(p)))
    val results = SingularTests.run(ctx, tests)

    assert(results.forall(_.error.isEmpty),
      results.filter(_.error.isDefined).mkString("\n"))
    val (volumeFloor, rest) = results.partition(
      _.name == "products_number_mobile_scrapper_check")
    // 24 clean passes
    assert(rest.size == 24 && rest.forall(_.passed),
      rest.filterNot(_.passed).mkString("\n"))
    // the 100M-distinct-ids floor flags the fixture: exactly one offending
    // row (the scalar count), proving the threshold executes for real
    assert(volumeFloor.head.offendingRows == 1, volumeFloor.toString)
  }
}
