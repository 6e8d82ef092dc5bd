package graft

import graft.runtime._

/** models/spark/b2b_mart/dashboards/purchasing_and_production_report/
  * procurement_orders_boxes.sql executed VERBATIM — the middle of the
  * round-11-starved chain, and the SECOND corpus reader of the
  * `packaging.phases` map-of-array-of-struct occurrence (the double
  * `explode(packaging.phases) AS phase_key, phase_array` →
  * `explode(phase_array) AS list_entry` with SCALAR `list_entry.l` reads,
  * :93-96 — the same physical shape ForecastWarehousingRealSpec reads
  * through vectorized extraction). Also covered: the deeply nested
  * `v_value.box.box.l` variant-box struct (:60-63), zero-divisor
  * `IF(x = 0, NULL, x)` box counts (:29, :68), the self-service deal gate
  * on the request side (:31-37), qty>0 confirmed-variant filter (:73-74),
  * FULL OUTER product/pickup warehouse merge with COALESCE priority
  * (:124-132), the `models.dim_pair_currency_rate` RAW catalog read with
  * MAX-rate dedup (:135-143), and the comparison-eligibility flags +
  * diff percentages (:176-207).
  *
  * Fixture: po1 exercises every populated path (product-phase boxes win
  * the COALESCE over pickup boxes; USD rate 1.2 lands total_price_usd
  * 300); po2 exercises the null paths (zero qty_per_box → NULL box count,
  * l-NULL phase rows filtered → warehouse falls back to PICKUP boxes, no
  * rate match, its request filtered by self_service=0 → both comparison
  * flags 0). */
class ProcurementBoxesRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL procurement_orders_boxes.sql: nested variant boxes, phase/pickup " +
       "warehouse merge, self-service request gate, raw currency rates") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/b2b_mart/dashboards/purchasing_and_production_report/procurement_orders_boxes.sql"))
    val ctx = freshCtx()

    ctx.warehouse.createTable("fact_deals_with_requests", Seq(
      ("D1", 1), ("D1", 1), ("D2", 0)).toDF("deal_id", "self_service"))

    // two rows on cr1 (one with box_quantity=0 → NULL box count); cr2 sits
    // behind the non-self-service deal D2 and must vanish from `request`
    ctx.warehouse.createTable("fact_customer_requests_variants", spark.sql(
      """SELECT 'cr1' AS customer_request_id, 'D1' AS deal_id,
        |  '100' AS expectedQuantity, 2000000L AS merchant_price_per_item,
        |  40.0D AS box_length, 30.0D AS box_width, 20.0D AS box_height,
        |  7.0D AS box_weight, 20 AS box_quantity
        |UNION ALL
        |SELECT 'cr1', 'D1', '100', 3000000L, 10.0D, 10.0D, 10.0D, 1.0D, 0
        |UNION ALL
        |SELECT 'cr2', 'D2', '100', 9000000L, 10.0D, 10.0D, 10.0D, 1.0D, 10""".stripMargin))

    def variant(id: String, sWeight: Double, qty: Int, origQty: Int,
                priceMicros: Long, perBox: Int,
                l: String, w: String, h: String, weight: String) =
      s"""named_struct('_id', '$id', 'sWeight', ${sWeight}D, 'qty', $qty,
         |  'originalQty', $origQty, 'priceAmountPerItem', ${priceMicros}L,
         |  'box', named_struct('itemQuantityPerBox', $perBox,
         |    'box', named_struct('l', $l, 'w', $w, 'h', $h, 'weight', $weight)))""".stripMargin
    def phase(l: String, w: String, h: String, weight: String, qty: Int, perBox: Int) =
      s"named_struct('l', $l, 'w', $w, 'h', $h, 'weight', $weight, 'qty', $qty, 'qtyPerBox', $perBox)"
    def pickupBox(l: String, w: String, h: String, weight: String, qty: Int, perBox: Int) =
      s"named_struct('l', $l, 'w', $w, 'h', $h, 'weight', $weight, 'qty', $qty, 'qtyPerBox', $perBox)"

    ctx.warehouse.createTable("procurement_orders", spark.sql(
      s"""SELECT 'po1' AS procurement_order_id, 'cr1' AS customer_request_id,
         |  TIMESTAMP('2024-03-01 10:00:00') AS created_ts, 'EUR' AS currency,
         |  1 AS is_for_purchasing_and_production_report,
         |  map('v1', ${variant("v1", 0.5, 100, 120, 2500000L, 10, "40.0D", "30.0D", "20.0D", "8.0D")},
         |      'v0', ${variant("v0", 0.1, 0, 10, 9900000L, 5, "1.0D", "1.0D", "1.0D", "1.0D")}) AS variants,
         |  named_struct('phases', map('ph1', array(
         |    ${phase("50.0D", "30.0D", "20.0D", "9.0D", 10, 10)},
         |    ${phase("CAST(NULL AS DOUBLE)", "1.0D", "1.0D", "1.0D", 99, 1)}))) AS packaging,
         |  array(${pickupBox("45.0D", "30.0D", "20.0D", "8.5D", 10, 10)}) AS pickup_order_box
         |UNION ALL
         |SELECT 'po2', 'cr2', TIMESTAMP('2024-03-01 11:00:00'), 'ZZZ', 1,
         |  map('v2', ${variant("v2", 0.2, 50, 50, 1000000L, 0, "10.0D", "10.0D", "10.0D", "1.0D")}),
         |  named_struct('phases', map('ph1', array(
         |    ${phase("CAST(NULL AS DOUBLE)", "1.0D", "1.0D", "1.0D", 5, 1)}))),
         |  array(${pickupBox("45.0D", "30.0D", "20.0D", "8.5D", 10, 10)})""".stripMargin))

    // raw catalog read: models.dim_pair_currency_rate (two candidate rates
    // on the day → MAX wins; a pre-2023 row must be filtered)
    val dbLoc = TempDirs.create("graft_modelsdb_boxes")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS models LOCATION '$dbLoc'")
    spark.sql(
      """SELECT 'EUR' AS currency_code, 'USD' AS currency_code_to,
        |  CAST(1.2 AS DOUBLE) AS rate, DATE'2024-03-01' AS effective_date
        |UNION ALL SELECT 'EUR', 'USD', 1.1, DATE'2024-03-01'
        |UNION ALL SELECT 'EUR', 'USD', 99.0, DATE'2022-03-01'""".stripMargin)
      .write.mode("overwrite").option("path", s"$dbLoc/dim_pair_currency_rate")
      .saveAsTable("models.dim_pair_currency_rate")
    try {
      val model = SqlTemplater.sqlModelAuto("procurement_orders_boxes", sql)
      assert(model.fileFormat == "delta")
      assert(model.deps.toSet == Set("fact_customer_requests_variants",
        "fact_deals_with_requests", "procurement_orders"))

      for ((n, st) <- new DagRunner(Seq(model)).run(ctx,
          selectors = Seq("procurement_orders_boxes")))
        assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

      val out = ctx.ref("procurement_orders_boxes")
      val rows = out.selectExpr("procurement_order_id",
        "CAST(request_qty AS LONG)", "ROUND(weighted_avg_merchant_price_per_item, 6)",
        "ROUND(request_weight, 6)", "ROUND(request_volume, 6)",
        "CAST(count_variants AS LONG)", "ROUND(total_price, 6)",
        "ROUND(total_price_usd, 6)", "ROUND(weighted_avg_price_per_item, 6)",
        "CAST(original_qty AS LONG)", "CAST(final_qty AS LONG)",
        "ROUND(item_weight_netto, 6)", "ROUND(merchant_number_of_boxes, 6)",
        "ROUND(merchant_weight, 6)", "ROUND(merchant_weight_per_piece, 6)",
        "ROUND(merchant_volume, 6)", "ROUND(merchant_volume_per_piece, 6)",
        "CAST(warehouse_number_of_boxes AS LONG)", "ROUND(warehouse_weight, 6)",
        "ROUND(warehouse_weight_per_piece, 6)", "ROUND(warehouse_volume, 6)",
        "ROUND(warehouse_volume_per_piece, 6)", "is_for_merchant_comparison",
        "ROUND(weight_diff_per_piece_pct, 6)", "ROUND(weight_diff_pct, 6)",
        "ROUND(volume_diff_pct, 6)", "ROUND(volume_diff_per_piece_pct, 6)",
        "is_for_confirmed_comparison", "ROUND(merchant_price_diff_pct, 6)",
        "ROUND(request_weight_diff_pct, 6)", "ROUND(request_volume_diff_pct, 6)")
        .collect().map(r => r.getString(0) -> r.toSeq).toMap
      assert(rows.size == 2, rows.keys.toString)

      // po1: request(qty 200, wavg 2.5, brutto 35, vol .12); merchant(250 →
      // ×1.2 = 300 usd, 10 boxes, 80 kg, .24 m³); warehouse = PRODUCT boxes
      // (10, 90, .30); diffs: weight .125, volume .25, request 45/35, 1.0
      assert(rows("po1") == Seq("po1", 200L, 2.5, 35.0, 0.12,
        1L, 250.0, 300.0, 2.5, 120L, 100L, 0.5, 10.0, 80.0, 0.8, 0.24, 0.0024,
        10L, 90.0, 0.9, 0.3, 0.003, 1,
        0.125, 0.125, 0.25, 0.25, 1, 0.0, 1.285714, 1.0), rows("po1").toString)
      // po2: request filtered (self_service=0); zero per-box → NULL merchant
      // boxes; l-NULL phases filtered → warehouse falls back to pickup
      // (10, 85, .27); no rate for ZZZ; both flags 0, all diffs NULL
      assert(rows("po2") == Seq("po2", null, null, null, null,
        1L, 50.0, null, 1.0, 50L, 50L, 0.2, null, null, null, null, null,
        10L, 85.0, 1.7, 0.27, 0.0054, 0,
        null, null, null, null, 0, null, null, null), rows("po2").toString)
    } finally spark.sql("DROP TABLE IF EXISTS models.dim_pair_currency_rate")
  }
}
