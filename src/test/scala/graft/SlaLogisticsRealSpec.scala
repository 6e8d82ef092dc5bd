package graft

import graft.runtime._

/** models/spark/b2b_mart/dashboards/general_dashboard/sla_logistics.sql
  * executed VERBATIM — the tail of the purchasing_and_production_report
  * chain. Semantics under test: small-batch vs big-deal milestone column
  * SELECTION (the same logical stage reads a different timestamp column per
  * deal class, :19-30), per-deal MIN/MAX milestone rollups with
  * FLOOR(hours)/24 day fractions (:40-52), the stage-gated UNION ALL — each
  * later metric requires ALL the deal's orders to have cleared every prior
  * stage (:57-93), and PERCENTILE_APPROX(0.5/0.8/0.95) as WINDOW functions
  * over a named WINDOW clause with a SELECT DISTINCT collapse (:95-104).
  *
  * Fixture: D1 (small batch, 2 orders, all stages cleared) emits all four
  * metrics; D2 (big deal, confirmed-only) and D4 (small, confirmed-only)
  * emit only 'placed - confirmed'; D3 is cancelled and filtered. Every
  * (date, batch, country, metric) window holds exactly ONE deal's value, so
  * the approximate percentiles are exact and the spec asserts them. */
class SlaLogisticsRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL sla_logistics.sql: class-dependent milestone columns, stage-gated " +
       "metric union, windowed PERCENTILE_APPROX over a named WINDOW") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/b2b_mart/dashboards/general_dashboard/sla_logistics.sql"))
    val ctx = freshCtx()

    def po(deal: String, poId: String, small: Int, created: String,
           confirmedSmall: String, preparingBig: String, readySmall: String,
           finalPayBig: String, shippedSmall: String, pickedBig: String,
           status: String) =
      s"""SELECT '$deal' AS deal_id, 'DE' AS country, '$poId' AS procurement_order_id,
         |  $small AS is_small_batch, TIMESTAMP('$created') AS created_ts,
         |  $confirmedSmall AS sub_status_confirmed_by_procurement_ts,
         |  $preparingBig AS sub_status_preparing_order_ts,
         |  $readySmall AS sub_status_ready_for_shipment_ts,
         |  $finalPayBig AS sub_status_final_payment_acquired_ts,
         |  $shippedSmall AS sub_status_shipped_by_3pl_ts,
         |  $pickedBig AS sub_status_pick_up_payment_picked_up_ts,
         |  '$status' AS current_status""".stripMargin
    def ts(s: String) = s"TIMESTAMP('$s')"
    val nul = "CAST(NULL AS TIMESTAMP)"
    ctx.warehouse.createTable("purchasing_and_production_report", spark.sql(Seq(
      // D1 small batch: both orders clear every stage; the BIG-deal columns
      // are planted non-null decoys the small-batch CASE must ignore
      po("D1", "po1", 1, "2024-01-01 00:00:00", ts("2024-01-03 12:00:00"),
        ts("2030-01-01 00:00:00"), ts("2024-01-05 00:00:00"),
        ts("2030-01-01 00:00:00"), ts("2024-01-08 00:00:00"),
        ts("2030-01-01 00:00:00"), "active"),
      po("D1", "po2", 1, "2024-01-02 00:00:00", ts("2024-01-04 00:00:00"),
        nul, ts("2024-01-06 00:00:00"), nul, ts("2024-01-07 00:00:00"),
        nul, "active"),
      // D2 big deal: confirmed via preparing_order; small-batch decoys set,
      // ready (final_payment) missing → later stages gated out
      po("D2", "po3", 0, "2024-01-01 06:00:00", ts("2030-01-01 00:00:00"),
        ts("2024-01-02 06:00:00"), ts("2030-01-01 00:00:00"), nul, nul, nul,
        "active"),
      // D3: cancelled — filtered entirely
      po("D3", "po4", 1, "2024-01-01 00:00:00", ts("2024-01-02 00:00:00"),
        nul, nul, nul, nul, nul, "cancelled"),
      // D4 small, different date (its own percentile window), confirmed-only
      po("D4", "po5", 1, "2024-02-01 03:00:00", ts("2024-02-02 03:00:00"),
        nul, nul, nul, nul, nul, "active")).mkString("\nUNION ALL\n")))

    val model = SqlTemplater.sqlModelAuto("sla_logistics", sql)
    assert(model.fileFormat == "delta")
    assert(model.deps == Seq("purchasing_and_production_report"))

    for ((n, st) <- new DagRunner(Seq(model)).run(ctx, selectors = Seq("sla_logistics")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val out = ctx.ref("sla_logistics")
    val rows = out.selectExpr("CAST(order_created_date AS STRING)",
      "is_small_batch", "country", "metric_name", "perc_50", "perc_80", "perc_95")
      .as[(String, Int, String, String, Double, Double, Double)]
      .collect().toSet

    // D1: min created 01-01, max confirmed 01-04 (72 h → 3.0), max ready
    // 01-06 (48 h → 2.0), max outbound 01-08 (48 h → 2.0; placed→outbound
    // 168 h → 7.0); single-deal windows make the approx percentiles exact
    assert(rows == Set(
      ("2024-01-01", 1, "DE", "placed - confirmed", 3.0, 3.0, 3.0),
      ("2024-01-01", 1, "DE", "confirmed - ready to ship", 2.0, 2.0, 2.0),
      ("2024-01-01", 1, "DE", "ready to ship - outbound", 2.0, 2.0, 2.0),
      ("2024-01-01", 1, "DE", "placed - outbound", 7.0, 7.0, 7.0),
      ("2024-01-01", 0, "DE", "placed - confirmed", 1.0, 1.0, 1.0),
      ("2024-02-01", 1, "DE", "placed - confirmed", 1.0, 1.0, 1.0)),
      rows.toString)
  }
}
