package graft

import graft.runtime._

/** models/spark/base/active_devices.sql executed VERBATIM — the second
  * priority-1000 model (q63 re-expresses its FIRST_VALUE block for the
  * oracle gate): FIRST_VALUE-as-aggregate device-day roll-up, funnel-flag
  * COALESCE join, the join-day backdating rule (earliest activity can
  * precede the recorded join), a lateral-alias is_new_user derivation, and
  * the month partition + hash-spread DISTRIBUTE BY sink — full and
  * incremental runs, every planted row hand-computed. */
class ActiveDevicesRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL active_devices.sql rolls up planted device-days, full + incremental") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/base/active_devices.sql"))
    val ctx = freshCtx(vars = Map("start_date_ymd" -> "2024-02-10"))
    ctx.sources.register("mart", "star_active_device")(s => {
      import s.implicits._
      Seq(
        // a1's first activity (01-03) PRECEDES its recorded join (01-05)
        ("a1", "2024-01-03", "2024-01-05 10:00:00", "de", "IOS", "17", "3.1",
          false, 7L, "jmt", "joom", "joom", null),
        ("a1", "2024-01-04", "2024-01-05 10:00:00", "de", "IOS", "17", "3.1",
          false, 7L, "jmt", "joom", "joom", null),
        ("b2", "2024-02-02", "2024-02-01 09:00:00", "fr", "Android", "14", "3.2",
          true, 8L, "sia", "joom", "joom", null))
        .toDF("device_id", "d", "jts", "country", "os_type", "os_version",
          "app_version", "ephemeral", "real_user_id", "legal_entity",
          "app_entity", "app_entity_group", "custom_domain")
        .selectExpr("device_id", "CAST(d AS DATE) AS date_msk",
          "CAST(jts AS TIMESTAMP) AS join_ts_msk", "country", "os_type",
          "os_version", "app_version", "ephemeral", "real_user_id",
          "legal_entity", "app_entity", "app_entity_group", "custom_domain",
          "'DE' AS language")
    })
    ctx.warehouse.createTable("active_devices_funnel", Seq(
      ("a1", "2024-01-03", 2L, 1L, 0L, 0L, 1L, 0L, 0L, 0L))
      .toDF("device_id", "d", "productOpens", "productAddToCarts",
        "productPurchases", "productToFavourites", "cartOpens",
        "checkoutStarts", "checkoutPaymentMethodSelects", "checkoutDeliverySelects")
      .selectExpr("device_id", "CAST(d AS DATE) AS date_msk", "productOpens",
        "productAddToCarts", "productPurchases", "productToFavourites",
        "cartOpens", "checkoutStarts", "checkoutPaymentMethodSelects",
        "checkoutDeliverySelects"))

    val model = SqlTemplater.sqlModelAuto("active_devices", sql)
    assert(model.materialization == Materialization.IncrementalInsertOverwrite(
      Seq("month_msk"), OnSchemaChange.Ignore))
    assert(model.meta("priority_weight") == "1000")

    val dag = new DagRunner(Seq(model))
    for (r <- Seq(dag.run(ctx, selectors = Seq("active_devices")),
                  dag.run(ctx, selectors = Seq("active_devices"))); (n, st) <- r)
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val out = ctx.ref("active_devices")
    assert(out.count() == 3)
    val rows = out.selectExpr("device_id", "CAST(day AS STRING)",
      "CAST(join_day AS STRING)", "is_new_user", "is_product_opened",
      "is_cart_opened", "is_product_purchased", "country", "platform",
      "CAST(month_msk AS STRING)")
      .as[(String, String, String, Boolean, Boolean, Boolean, Boolean,
           String, String, String)].collect().toSet
    assert(rows == Set(
      // join_day backdated to the earliest activity; that day is new-user
      ("a1", "2024-01-03", "2024-01-03", true, true, true, false, "DE", "ios", "2024-01-01"),
      ("a1", "2024-01-04", "2024-01-03", false, false, false, false, "DE", "ios", "2024-01-01"),
      // b2 joined before first activity: join_day = recorded join, not new
      ("b2", "2024-02-02", "2024-02-01", false, false, false, false, "FR", "android", "2024-02-01")),
      rows.toString)
  }
}
