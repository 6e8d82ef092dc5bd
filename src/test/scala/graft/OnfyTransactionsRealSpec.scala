package graft

import graft.runtime._

/** models/spark/onfy/onfy_transactions_new.sql (420 LoC) executed VERBATIM —
  * the model whose FULLY-QUALIFIED column references
  * (`pharmacy_landing.order.id`, `onfy.lndc_user_attribution.source_corrected`)
  * motivated the templater's qualified-reference resolution; it also MIXES
  * `{{ source('pharmacy_landing','order_parcel') }}` with RAW
  * `pharmacy_landing.order_parcel` catalog reads of the same table in
  * different CTEs. Covers the PSP-fee split by parcel GMV share, the
  * payment-method commission matrix, pre/post-cutoff fee branches, and the
  * EUR→USD rate-ratio duplication with a final UNION DISTINCT.
  */
class OnfyTransactionsRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL onfy_transactions_new.sql (420 LoC): qualified refs, parcel fee split, EUR/USD union") {
    val ctx = freshCtx()

    ctx.sources.register("pharmacy_landing", "order")(sp => sp.sql(
      """SELECT 'O1' AS id, TIMESTAMP'2024-05-01 08:00:00' AS created,
        |  'E1' AS user_email_hash, 'DV1' AS device_id, 'CARD' AS payment_method""".stripMargin))

    ctx.sources.register("onfy_mart", "transactions")(sp => sp.sql(
      """SELECT 'PAYMENT' AS type, 'O1' AS order_id, 'P1' AS order_parcel_id,
        |  TIMESTAMP'2024-05-01 08:05:00' AS date, CAST(50.0 AS DOUBLE) AS price,
        |  'EUR' AS currency, 'E1' AS user_email_hash
        |UNION ALL SELECT 'ORDER_SHIPMENT', 'O1', 'P1',
        |  TIMESTAMP'2024-05-01 08:05:00', 5.0, 'EUR', 'E1'
        |UNION ALL SELECT 'charge_fee', 'O1', CAST(NULL AS STRING),
        |  TIMESTAMP'2024-05-01 08:06:00', 2.0, 'EUR', 'E1'""".stripMargin))

    ctx.sources.register("pharmacy_landing", "device")(sp => sp.sql(
      "SELECT 'DV1' AS id, 'WEB' AS app_type, 'DESKTOP' AS device_type"))

    val parcelDf = "SELECT 'P1' AS id, 'S1' AS store_id"
    val storeDf = "SELECT 'S1' AS id, 'Berlin Hub' AS name"
    ctx.sources.register("pharmacy_landing", "order_parcel")(sp => sp.sql(parcelDf))
    ctx.sources.register("pharmacy_landing", "store")(sp => sp.sql(storeDf))

    ctx.sources.register("mart", "dim_currency_rate")(sp => sp.sql(
      """SELECT DATE'2024-05-01' AS effective_date, 'EUR' AS currency_code,
        |  CAST(1.5 AS DOUBLE) AS rate
        |UNION ALL SELECT DATE'2024-05-01', 'USD', 1.0""".stripMargin))

    ctx.warehouse.createTable("lndc_user_attribution", spark.sql(
      """SELECT 'E1' AS user_email_hash, 'google' AS source_corrected,
        |  'brand' AS campaign_corrected""".stripMargin))

    // two CTEs read pharmacy_landing.order_parcel / .store as RAW catalog
    // names (no source() wrapper) — the same logical tables, via the catalog
    val dbLoc = TempDirs.create("graft_pharmadb")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS pharmacy_landing LOCATION '$dbLoc'")
    try {
      spark.sql(parcelDf).write.mode("overwrite")
        .option("path", s"$dbLoc/order_parcel").saveAsTable("pharmacy_landing.order_parcel")
      spark.sql(storeDf).write.mode("overwrite")
        .option("path", s"$dbLoc/store").saveAsTable("pharmacy_landing.store")

      val model = SqlTemplater.sqlModelAuto("onfy_transactions_new",
        java.nio.file.Files.readString(java.nio.file.Paths.get(
          "/root/reference/models/spark/onfy/onfy_transactions_new.sql")))
      new DagRunner(Seq(model)).run(ctx, selectors = Seq("onfy_transactions_new"))
        .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

      val rows = ctx.ref("onfy_transactions_new").selectExpr(
        "type", "currency", "CAST(price AS DOUBLE)", "CAST(gmv_initial AS DOUBLE)",
        "CAST(gross_profit_initial AS DOUBLE)", "store_name", "source",
        "purchase_num", "app_device_type", "CAST(partition_date AS STRING)")
        .as[(String, String, Double, Double, Double, String, String, Int,
          String, String)].collect().toSet

      // hand-tally: parcel P1 carries the whole order's GMV (share 1.0), so
      // the post-cutoff charge_fee splits onto P1 at full price and picks up
      // the store through the parcel; EUR rows duplicate to USD at the
      // 1.5/1.0 rate ratio (chosen binary-exact); WEB+DESKTOP -> WEB_DESKTOP
      val d = "2024-05-01"
      assert(rows == Set(
        ("PAYMENT", "EUR", 50.0, 50.0, 0.0, "Berlin Hub", "google", 1, "WEB_DESKTOP", d),
        ("ORDER_SHIPMENT", "EUR", 5.0, 5.0, 0.0, "Berlin Hub", "google", 1, "WEB_DESKTOP", d),
        ("CHARGE_FEE", "EUR", 2.0, 0.0, -2.0, "Berlin Hub", "google", 1, "WEB_DESKTOP", d),
        ("PAYMENT", "USD", 75.0, 75.0, 0.0, "Berlin Hub", "google", 1, "WEB_DESKTOP", d),
        ("ORDER_SHIPMENT", "USD", 7.5, 7.5, 0.0, "Berlin Hub", "google", 1, "WEB_DESKTOP", d),
        ("CHARGE_FEE", "USD", 3.0, 0.0, -3.0, "Berlin Hub", "google", 1, "WEB_DESKTOP", d)),
        rows.toSeq.sortBy(r => (r._1, r._2)).mkString("\n"))
    } finally {
      spark.sql("DROP DATABASE IF EXISTS pharmacy_landing CASCADE")
    }
  }
}
