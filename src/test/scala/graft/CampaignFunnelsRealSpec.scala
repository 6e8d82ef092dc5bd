package graft

import graft.runtime._

/** The corpus's LARGEST model —
  * models/spark/onfy/onfy_source_campaign_funnels.sql (1,407 LoC) — executed
  * VERBATIM. Exercises, in one file: per-(device, product, event_type)
  * sessionization (LAG + 30-min gap + running SUM), MIN_BY/MAX_BY session
  * collapse, six funnel families (search/catalog, recommendation, banner,
  * email, popup, alternatives table) built from interval-bounded joins
  * (`ts >= start AND ts < COALESCE(next, start + INTERVAL 30 MINUTE)`),
  * MODE() + boolean MAX in the serp-items roll-up, FROM_UTC_TIMESTAMP
  * Berlin-time conversion, medicine-group self-joins, EXPLODE of an
  * alternatives array, a five-branch UNION ALL flat table, last-touch
  * MAX_BY attribution, and an incremental insert_overwrite sink partitioned
  * by event_date with DISTRIBUTE BY.
  *
  * One device walks the search funnel end-to-end (preview -> open -> add ->
  * order, hand-tallied below); a second preview exercises the
  * recommendation branch with no downstream steps; an orphan preview with
  * no serp match must be dropped by the final `source IS NOT NULL` filter.
  * The model's 120-day CURRENT_DATE() lookback makes the planted dates
  * relative to the test run; Berlin-offset-sensitive timestamps are planted
  * through TO_UTC_TIMESTAMP so assertions hold across DST.
  */
class CampaignFunnelsRealSpec extends SparkSpec {
  import spark.implicits._

  private val day = java.time.LocalDate.now().minusDays(1).toString

  private def s(v: String): String = if (v == null) "CAST(NULL AS STRING)" else s"'$v'"

  /** One device_events document (full payload shape the model reads). */
  private def ev(dev: String, id: String, time: String, typ: String,
                 pid: String = null, pname: String = null, pzn: String = null,
                 screen: String = null, widget: String = null, rec: String = null,
                 promo: String = null, utmCampaign: String = null,
                 utmMedium: String = null): String =
    s"""SELECT ${s(dev)} AS device_id,
       |  named_struct('osType', 'desktop') AS device,
       |  ${s(id)} AS event_id,
       |  TIMESTAMP'$day $time' AS event_ts_cet,
       |  DATE'$day' AS partition_date_cet,
       |  ${s(typ)} AS type,
       |  named_struct(
       |    'productId', ${s(pid)}, 'productName', ${s(pname)}, 'pzn', ${s(pzn)},
       |    'sourceScreen', ${s(screen)}, 'widgetType', ${s(widget)},
       |    'recommendationType', ${s(rec)}, 'recommendationSlotName', CAST(NULL AS STRING),
       |    'promoKey', ${s(promo)}, 'blockName', CAST(NULL AS STRING),
       |    'isSponsored', CAST(NULL AS BOOLEAN),
       |    'params', named_struct('utm_campaign', ${s(utmCampaign)},
       |      'utm_medium', ${s(utmMedium)}, 'utm_source', CAST(NULL AS STRING)),
       |    'alternativeProductId', CAST(NULL AS STRING),
       |    'alternativeProductIdList', CAST(NULL AS ARRAY<STRING>)
       |  ) AS payload""".stripMargin

  test("REAL onfy_source_campaign_funnels.sql (1,407 LoC) executes verbatim; search + recommendation funnels hand-tallied") {
    val ctx = freshCtx()

    ctx.sources.register("onfy_mart", "device_events")(sp => sp.sql(Seq(
      // search funnel walk on d1 / product p1
      ev("d1", "e_pv", "10:05:00", "productPreview", pid = "p1", pname = "Aspirin",
        pzn = "Z1", screen = "search", widget = "searchProduct"),
      ev("d1", "e_op", "10:10:00", "productOpen", pid = "p1", pname = "Aspirin",
        pzn = "Z1", screen = "search"),
      ev("d1", "e_ad", "10:15:00", "addToCart", pid = "p1", pname = "Aspirin",
        pzn = "Z1", screen = "search"),
      // recommendation preview on d1 / product p2, no downstream steps
      ev("d1", "e_rv", "10:20:00", "productPreview", pid = "p2", pname = "Ibuprofen",
        pzn = "Z2", screen = "product", widget = "recommendations",
        rec = "similar", promo = "pk1"),
      // orphan preview on d2: no serp request -> source NULL -> dropped
      ev("d2", "e_x", "10:40:00", "productPreview", pid = "p1", pname = "Aspirin",
        pzn = "Z1", screen = "search", widget = "searchProduct")
    ).mkString("\nUNION ALL\n")))

    ctx.sources.register("onfy", "search_serp_requests_i")(sp => sp.sql(
      s"""SELECT 'd1' AS device_id, 's1' AS serp_id, CAST(NULL AS BIGINT) AS category_id,
         |  DATE'$day' AS partition_date_cet,
         |  TO_UTC_TIMESTAMP(TIMESTAMP'$day 10:00:00', 'Europe/Berlin') AS event_ts_utc,
         |  'aspirin' AS query""".stripMargin))

    ctx.sources.register("onfy", "search_serp_items_i")(sp => sp.sql(
      s"""SELECT 's1' AS serp_id, 'p1' AS product_id, true AS has_preview,
         |  'sp1' AS sponsored_key, DATE'$day' AS partition_date_cet""".stripMargin))

    ctx.sources.register("pharmacy_landing", "category")(sp => sp.sql(
      "SELECT CAST(1 AS BIGINT) AS id, 'OTC' AS name"))

    ctx.sources.register("onfy_mart", "dim_product")(sp => sp.sql(
      """SELECT 'p1' AS product_id, 'g1' AS medicine_group_id, 'Z1' AS pzn,
        |  'Aspirin' AS product_name, 'Bayer' AS manufacturer_short_name,
        |  20 AS quantity, 'tab' AS unit
        |UNION ALL
        |SELECT 'p2', 'g2', 'Z2', 'Ibuprofen', 'M2', 10, 'tab'""".stripMargin))

    // ref('orders_info') resolves to a pre-materialized warehouse table
    ctx.warehouse.createTable("orders_info", spark.sql(
      s"""SELECT 'o1' AS order_id, 'd1' AS device_id,
         |  TIMESTAMP'$day 11:00:00' AS order_created_time_cet,
         |  'p1' AS product_id, 'Aspirin' AS product_name, 'Z1' AS pzn,
         |  2 AS quantity, CAST(10.0 AS DOUBLE) AS before_products_price,
         |  CAST(8.0 AS DOUBLE) AS products_price""".stripMargin))

    val model = SqlTemplater.sqlModelAuto("onfy_source_campaign_funnels",
      java.nio.file.Files.readString(java.nio.file.Paths.get(
        "/root/reference/models/spark/onfy/onfy_source_campaign_funnels.sql")))
    assert(model.deps.contains("orders_info"))

    def run(): Unit =
      new DagRunner(Seq(model))
        .run(ctx, selectors = Seq("onfy_source_campaign_funnels"))
        .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    run()
    val out = ctx.ref("onfy_source_campaign_funnels")
    val rows = out.selectExpr(
      "CAST(event_dt AS STRING)", "CAST(event_date AS STRING)", "platform",
      "source", "first_page", "placement", "placement_pzn", "campaign_name",
      "product_id", "product_name", "pzn", "manufacturer",
      "previews", "openings", "addings",
      "order_id", "order_before_products_price", "order_products_price",
      "order_quantity")
      .as[(String, String, String, String, String, String, Option[String], String,
        String, Option[String], String, String, Long, Long, Long,
        Option[String], Option[Double], Option[Double], Option[Long])]
      .collect().toSet

    // hand-tally:
    //  search row — preview e_pv attributed to serp s1 ('aspirin', sponsored
    //  'sp1'); open e_op (NULL widget -> '' passes), add e_ad (via the
    //  medicine-group self-pair), order o1 within 36h; product fields come
    //  from the order side of the coalesce chain; manufacturer joins on Z1.
    //  recommendation row — preview e_rv alone: placement = rec type,
    //  campaign = promo key, product_name coalesce has no preview leg -> NULL.
    //  d2's orphan preview: source NULL -> filtered out.
    assert(rows == Set(
      (day, day, "desktop", "search", "search", "aspirin", None, "sp1",
        "p1", Some("Aspirin"), "Z1", "Bayer", 1L, 1L, 1L,
        Some("o1"), Some(10.0), Some(8.0), Some(2L)),
      (day, day, "desktop", "recommendation", "product", "similar", None, "pk1",
        "p2", None, "Z2", "M2", 1L, 0L, 0L,
        None, None, None, None)), rows.mkString("\n"))

    // incremental insert_overwrite idempotency: a second run overwrites the
    // same event_date partition with identical content
    run()
    val out2 = ctx.ref("onfy_source_campaign_funnels") // fresh plan: files were overwritten
    val again = out2.selectExpr("source", "previews", "openings", "addings")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out2.count() == 2)
    assert(again == Set(("search", 1L, 1L, 1L), ("recommendation", 1L, 0L, 0L)))
  }
}
