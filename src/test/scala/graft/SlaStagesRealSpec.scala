package graft

import graft.runtime._

/** models/spark/b2b_mart/dashboards/purchasing_and_production_report/
  * purchasing_and_production_report_sla_stages.sql executed VERBATIM — the
  * 400-line stage-spine model. Semantics under test: per-class stage UNION
  * spines (7 big-batch + 9 small-batch stages with class-specific milestone
  * columns and date-gated SLA values, :33-267), the Total Production
  * roll-up with class-conditional boundary stages (:275-314), a FOUR-YEAR
  * hourly calendar explode used to subtract weekend hours inside a +5 h
  * timezone shift (:316-324, :342-352), the latest-activity rn over
  * `GREATEST(COALESCE(start,0001), COALESCE(end,0001)) DESC, stage DESC`
  * that names the CURRENT stage (:328-334, :371-375), skip detection via
  * FIRST_VALUE over `ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING` in
  * STAGE-STRING order (:376-393 — note `FIRST_VALUE` does NOT ignore nulls,
  * so a missing-start immediate successor masks the first arm and the
  * end-side window must catch it), and the order-in-production window over
  * the Total row (:394-395).
  *
  * Fixture: po1 (small batch) runs 03-01→03-09 across the 2024-03-02/03
  * and 03-09 weekends — its '0.Assigned'/'5.Ready' windows each contain
  * exactly 5 weekend hours (the +5 h shift pulls Saturday 00:00-05:00 in)
  * and '05.Confirmed' contains 43; its 3pl shipment is pending → current
  * stage '6.Shipped' wins the rn tie at equal GREATEST via stage DESC.
  * po2 (big batch) has a PSI hole: '5.PSI Execution' (end null, successor
  * start ALSO null → caught by the end-side FIRST_VALUE) and '6.PSI
  * Confirmation' (start null) are both skipped=1, its Total Production has
  * no end → is_order_in_production=1. po3 is cancelled and filtered. */
class SlaStagesRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL purchasing_and_production_report_sla_stages.sql: stage spines, " +
       "weekend-hour calendar, current-stage rn, FOLLOWING-frame skips") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/b2b_mart/dashboards/purchasing_and_production_report/purchasing_and_production_report_sla_stages.sql"))
    val ctx = freshCtx()

    def ts(s: String) = s"TIMESTAMP('$s 00:00:00')"
    val nul = "CAST(NULL AS TIMESTAMP)"
    def po(id: String, small: Int, status: String, cols: Map[String, String]) = {
      val all = Seq("sub_status_forming_order_unassigned_ts",
        "sub_status_filling_in_information_ts", "sub_status_preparing_order_ts",
        "sub_status_client_payment_received_ts", "sub_status_manufacturing_ts",
        "psi_being_conducted_ts", "sub_status_psi_being_conducted_ts",
        "psi_waiting_for_confirmation_ts", "sub_status_psi_waiting_for_confirmation_ts",
        "psi_problems_are_to_be_fixed_ts", "sub_status_psi_problems_are_to_be_fixed_ts",
        "psi_results_accepted_ts", "sub_status_psi_results_accepted_ts",
        "sub_status_final_payment_acquired_ts", "sub_status_confirmed_by_procurement_ts",
        "sub_status_waiting_for_payment_ts", "sub_status_merchant_preparing_order_ts",
        "sub_status_merchant_shipped_the_goods_ts", "sub_status_ready_for_shipment_ts",
        "sub_status_shipped_by_3pl_ts")
      s"""SELECT 'DL-$id' AS deal_friendly_id, $small AS is_small_batch,
         |  '$id' AS procurement_order_id, TIMESTAMP('2024-03-01 00:00:00') AS created_ts,
         |  '$status' AS current_status,
         |  ${if (small == 1) "CAST(NULL AS INT)" else "CAST(NULL AS INT)"} AS manufacturing_days,
         |  10 AS manufacturing_days_from_merchant_order,
         |  ${all.map(c => s"${cols.getOrElse(c, nul)} AS $c").mkString(",\n  ")}""".stripMargin
    }
    ctx.warehouse.createTable("purchasing_and_production_report", spark.sql(Seq(
      po("po1", 1, "active", Map(
        "sub_status_forming_order_unassigned_ts" -> ts("2024-03-01"),
        "sub_status_filling_in_information_ts" -> ts("2024-03-02"),
        "sub_status_confirmed_by_procurement_ts" -> ts("2024-03-04"),
        "sub_status_waiting_for_payment_ts" -> ts("2024-03-05"),
        "sub_status_merchant_preparing_order_ts" -> ts("2024-03-06"),
        "sub_status_merchant_shipped_the_goods_ts" -> ts("2024-03-07"),
        "sub_status_psi_being_conducted_ts" -> ts("2024-03-08"),
        "sub_status_ready_for_shipment_ts" -> ts("2024-03-09"))),
      po("po2", 0, "active", Map(
        "sub_status_forming_order_unassigned_ts" -> ts("2024-04-01"),
        "sub_status_filling_in_information_ts" -> ts("2024-04-02"),
        "sub_status_preparing_order_ts" -> ts("2024-04-03"),
        "sub_status_client_payment_received_ts" -> ts("2024-04-03"),
        "sub_status_manufacturing_ts" -> ts("2024-04-04"),
        "sub_status_psi_being_conducted_ts" -> ts("2024-04-05"),
        "sub_status_psi_results_accepted_ts" -> ts("2024-04-08"))),
      po("po3", 1, "cancelled", Map(
        "sub_status_forming_order_unassigned_ts" -> ts("2024-03-01"))))
      .mkString("\nUNION ALL\n")))

    val model = SqlTemplater.sqlModelAuto("purchasing_and_production_report_sla_stages", sql)
    assert(model.fileFormat == "delta")
    assert(model.deps == Seq("purchasing_and_production_report"))

    for ((n, st) <- new DagRunner(Seq(model)).run(ctx,
        selectors = Seq("purchasing_and_production_report_sla_stages")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val out = ctx.ref("purchasing_and_production_report_sla_stages")
    val rows = out.selectExpr("procurement_order_id", "stage",
      "CAST(sla_value AS INT)", "CAST(start_ts AS STRING)", "CAST(end_ts AS STRING)",
      "ROUND(fact_value_with_weekends, 6)", "ROUND(fact_value_without_weekends, 6)",
      "is_current_stage", "current_stage", "is_stage_skipped", "is_order_in_production")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
    assert(rows.size == 18, s"10 small + 8 big rows expected: ${rows.keys.toSeq.sorted}")

    def d(s: String): String = s + " 00:00:00"
    val r6 = (x: Double) => math.rint(x * 1e6) / 1e6
    // po1 (small batch): weekends 03-02/03 and 03-09 land inside the +5h
    // shifted windows; current stage = 6.Shipped (pending 3pl)
    val cur1 = "6.Shipped"
    assert(rows(("po1", "0.Assigned")) == Seq(null, d("2024-03-01"), d("2024-03-02"),
      1.0, r6(19.0 / 24), 0, cur1, 0, 0), rows(("po1", "0.Assigned")).toString)
    assert(rows(("po1", "05.Confirmed by Procurement")) == Seq(null, d("2024-03-02"),
      d("2024-03-04"), 2.0, r6(5.0 / 24), 0, cur1, 0, 0),
      rows(("po1", "05.Confirmed by Procurement")).toString)
    assert(rows(("po1", "1.Confirmation")) == Seq(1, d("2024-03-01"), d("2024-03-04"),
      3.0, 1.0, 0, cur1, 0, 0), rows(("po1", "1.Confirmation")).toString)
    assert(rows(("po1", "15.Waiting Payment")) == Seq(null, d("2024-03-04"),
      d("2024-03-05"), 1.0, 1.0, 0, cur1, 0, 0))
    assert(rows(("po1", "2.Payment to Merchant")) == Seq(1, d("2024-03-05"),
      d("2024-03-06"), 1.0, 1.0, 0, cur1, 0, 0))
    assert(rows(("po1", "3.Merchant Shipped")) == Seq(1, d("2024-03-06"),
      d("2024-03-07"), 1.0, 1.0, 0, cur1, 0, 0))
    assert(rows(("po1", "4.Warehouse Received")) == Seq(3, d("2024-03-07"),
      d("2024-03-08"), 1.0, 1.0, 0, cur1, 0, 0))
    assert(rows(("po1", "5.Ready for Shipment")) == Seq(1, d("2024-03-08"),
      d("2024-03-09"), 1.0, r6(19.0 / 24), 0, cur1, 0, 0))
    // pending 3pl: the date-gated CASE over a NULL date falls to ELSE 7
    assert(rows(("po1", "6.Shipped")) == Seq(7, d("2024-03-09"), null,
      null, null, 1, cur1, 0, 0), rows(("po1", "6.Shipped")).toString)
    assert(rows(("po1", "Total Production")) == Seq(6, d("2024-03-05"),
      d("2024-03-09"), 4.0, r6(91.0 / 24), 0, cur1, 0, 0),
      rows(("po1", "Total Production")).toString)

    // po2 (big batch): manufacturing SLA falls back to the merchant-order
    // days; the PSI hole marks two stages skipped; Total has no end →
    // the order is in production
    val cur2 = "7.Final Payment"
    assert(rows(("po2", "1.Queue")) == Seq(1, d("2024-04-01"), d("2024-04-02"),
      1.0, 1.0, 0, cur2, 0, 1), rows(("po2", "1.Queue")).toString)
    assert(rows(("po2", "2.Confirmation")) == Seq(1, d("2024-04-02"), d("2024-04-03"),
      1.0, 1.0, 0, cur2, 0, 1))
    assert(rows(("po2", "3.First Payment")) == Seq(4, d("2024-04-03"), d("2024-04-04"),
      1.0, 1.0, 0, cur2, 0, 1))
    assert(rows(("po2", "4.Manufacturing")) == Seq(10, d("2024-04-04"), d("2024-04-05"),
      1.0, 1.0, 0, cur2, 0, 1), rows(("po2", "4.Manufacturing")).toString)
    assert(rows(("po2", "5.PSI Execution")) == Seq(3, d("2024-04-05"), null,
      null, null, 0, cur2, 1, 1), rows(("po2", "5.PSI Execution")).toString)
    assert(rows(("po2", "6.PSI Confirmation")) == Seq(3, null, d("2024-04-08"),
      null, null, 0, cur2, 1, 1), rows(("po2", "6.PSI Confirmation")).toString)
    assert(rows(("po2", "7.Final Payment")) == Seq(4, d("2024-04-08"), null,
      null, null, 1, cur2, 0, 1), rows(("po2", "7.Final Payment")).toString)
    assert(rows(("po2", "Total Production")) == Seq(24, d("2024-04-03"), null,
      null, null, 0, cur2, 0, 1), rows(("po2", "Total Production")).toString)
  }
}
