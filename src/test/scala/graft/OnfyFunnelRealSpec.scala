package graft

import org.apache.spark.sql.DataFrame
import graft.runtime._

/** models/spark/onfy/conversion_funnel.sql (762 LoC, the second-largest
  * logic model) executed VERBATIM: the funnel chain is built THREE times
  * over 30d / 7d / 24h windows — interval-bounded joins (`between x and
  * least(next, window_end)`), max_by source attribution, RANK minimal-
  * involvement typing, a payment-gated session counter, six chained
  * ROW_NUMBER step joins per window, UNION ALL of the three windows, and a
  * bot-filtered devices join. Bulk events come from the test events table;
  * one planted device walks every funnel step at known timestamps and its
  * three window rows are asserted field by field. */
class OnfyFunnelRealSpec extends SparkSpec {
  import spark.implicits._

  private val td = "/root/testdata/sf0.001"
  private val funnelTypes = Seq("sessionConfigured", "homeOpen", "search",
    "searchServer", "productOpen", "catalogOpen", "productPreview", "addToCart",
    "cartOpen", "checkoutConfirmOpen", "paymentStart", "paymentCompleteServer")

  private def deviceEvents: DataFrame = {
    val bulk = Tables(spark, td, "events").selectExpr(
      "concat('d', user_id) AS device_id",
      "ts AS event_ts_cet",
      s"element_at(array(${funnelTypes.map("'" + _ + "'").mkString(",")}), CAST(event_id % 12 + 1 AS INT)) AS type",
      "named_struct('sourceScreen', IF(event_id % 2 = 0, 'productPageLanding', 'other'), " +
        "'productIds', IF(event_id % 3 = 0, array('p1'), CAST(NULL AS ARRAY<STRING>))) AS payload")
    // planted device zz1: one clean walk through every funnel step,
    // minutes apart, inside every window size
    val steps = Seq(
      ("homeOpen", "2024-02-10 10:00:00", "other", false),
      ("productOpen", "2024-02-10 10:05:00", "other", false),
      ("addToCart", "2024-02-10 10:10:00", "other", false),
      ("cartOpen", "2024-02-10 10:15:00", "other", true),
      ("checkoutConfirmOpen", "2024-02-10 10:20:00", "other", false),
      ("paymentStart", "2024-02-10 10:25:00", "other", false),
      ("paymentCompleteServer", "2024-02-10 10:30:00", "other", false))
    val planted = steps.toDF("type", "ts", "screen", "hasIds").selectExpr(
      "'zz1' AS device_id",
      "CAST(ts AS TIMESTAMP) AS event_ts_cet",
      "type",
      "named_struct('sourceScreen', screen, " +
        "'productIds', IF(hasIds, array('px'), CAST(NULL AS ARRAY<STRING>))) AS payload")
    bulk.unionByName(planted)
  }

  test("REAL conversion_funnel.sql (762 LoC) executes verbatim; planted walk asserted") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/onfy/conversion_funnel.sql"))
    val ctx = freshCtx()
    val events = deviceEvents.cache()
    ctx.sources.register("onfy_mart", "device_events")(_ => events)
    ctx.sources.register("onfy_mart", "devices_mart")(s => {
      import s.implicits._
      // bulk devices: d0..d14 (d13/d14 marked bots -> excluded); planted zz1
      // bought before the walk -> is_buyer
      val bulk = (0 to 14).map(i => (s"d$i", "android", "2024-01-05", i >= 13))
      (bulk :+ (("zz1", "ios", "2024-02-01", false)))
        .toDF("device_id", "app_device_type", "mpd", "is_bot")
        .selectExpr("device_id", "app_device_type",
          "CAST(mpd AS DATE) AS min_purchase_date", "is_bot")
    })
    ctx.warehouse.createTable("sources", Seq(
      ("zz1", "2024-02-10 09:30:00", null, "google", "c1", "partner1"),
      ("d1", "2024-01-01 00:00:00", null, "organic", "none", "p0"))
      .toDF("device_id", "sdt", "nsdt", "source_corrected", "campaign_corrected", "partner")
      .selectExpr("device_id", "CAST(sdt AS TIMESTAMP) AS source_dt",
        "CAST(nsdt AS TIMESTAMP) AS next_source_dt",
        "source_corrected", "campaign_corrected", "partner"))

    val model = SqlTemplater.sqlModelAuto("conversion_funnel", sql)
    assert(model.materialization == Materialization.IncrementalInsertOverwrite(
      Nil, OnSchemaChange.Ignore)) // insert_overwrite with no partition_by
    assert(model.deps == Seq("sources"))

    // the reference's Thrift server ran non-ANSI Spark 3 SQL
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      for ((n, st) <- new DagRunner(Seq(model)).run(ctx, selectors = Seq("conversion_funnel")))
        assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)

    val out = ctx.ref("conversion_funnel").cache()
    assert(out.count() > 0)
    // bots never appear; every row's window size is one of the three
    assert(out.filter($"device_id".isin("d13", "d14")).count() == 0)
    assert(out.select($"window_size").distinct().as[String].collect().toSet ==
      Set("30 days", "7 days", "24 hours"))
    // the planted walk: one row per window, every step dt filled, source
    // attribution from the zz1 source row, screen = main_page (homeOpen is
    // the first minimal-involvement event of the session)
    val zz = out.filter($"device_id" === "zz1")
      .selectExpr("window_size", "CAST(session_minenv_dt AS STRING)",
        "CAST(add_to_cart_dt AS STRING)", "CAST(cart_open_dt AS STRING)",
        "CAST(checkout_dt AS STRING)", "CAST(payment_start_dt AS STRING)",
        "CAST(payment_dt AS STRING)", "source", "campaign", "partner",
        "session_start_screen", "CAST(is_buyer AS STRING)", "app_device_type")
      .as[(String, String, String, String, String, String, String, String,
           String, String, String, String, String)].collect()
    assert(zz.length == 3, zz.mkString("\n"))
    for (w <- Seq("30 days", "7 days", "24 hours")) {
      val r = zz.find(_._1 == w).get
      assert(r == ((w, "2024-02-10 10:00:00", "2024-02-10 10:10:00",
        "2024-02-10 10:15:00", "2024-02-10 10:20:00", "2024-02-10 10:25:00",
        "2024-02-10 10:30:00", "google", "c1", "partner1", "main_page",
        "true", "ios")), r.toString)
    }
    out.unpersist(); events.unpersist()
  }
}
