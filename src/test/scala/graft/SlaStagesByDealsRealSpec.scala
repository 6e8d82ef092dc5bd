package graft

import graft.runtime._

/** models/spark/b2b_mart/dashboards/purchasing_and_production_report/
  * purchasing_and_production_report_sla_stages_by_deals.sql executed
  * VERBATIM — the deal-level rollup of the stage spine. Semantics under
  * test: the per-(deal, stage) order-count window `po_in_deal` (:16) gating
  * deal readiness — a deal stage is `is_deal_ready` only when EVERY order
  * in the deal has cleared both boundary milestones (COUNT DISTINCT ==
  * MAX(po_in_deal), :28-32), the not-ready END suppression (`CASE WHEN
  * is_deal_ready THEN end_ts END`, :93 — start survives, facts go null),
  * boundary-stage MIN/MAX across orders (:33-34), and the same +5 h-shifted
  * weekend-hour calendar subtraction as the stage model (:97-124).
  *
  * Fixture: DL-1 has two orders — both assigned and paid (1.Confirmation
  * ready: start 03-01, end 03-06, 120 h spanning one full weekend → 48
  * weekend hours → 3.0 working days), but only ONE is ready-for-shipment
  * (2.China Operations NOT ready: end suppressed despite a real MAX) and
  * neither is shipped (3.Shipped not ready). DL-2's single order clears
  * everything → all three deal stages ready with exact day facts. */
class SlaStagesByDealsRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL purchasing_and_production_report_sla_stages_by_deals.sql: " +
       "all-orders readiness gates, end suppression, weekend subtraction") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/b2b_mart/dashboards/purchasing_and_production_report/purchasing_and_production_report_sla_stages_by_deals.sql"))
    val ctx = freshCtx()

    def row(deal: String, po: String, stage: String, start: String, end: String) =
      s"""SELECT '$deal' AS deal_friendly_id, 1 AS is_small_batch,
         |  '$po' AS procurement_order_id, '$stage' AS stage,
         |  $start AS start_ts, $end AS end_ts""".stripMargin
    def ts(s: String) = s"TIMESTAMP('$s 00:00:00')"
    val nul = "CAST(NULL AS TIMESTAMP)"
    ctx.warehouse.createTable("purchasing_and_production_report_sla_stages",
      spark.sql(Seq(
        // DL-1 / po1: fully ready through 5.Ready; not shipped
        row("DL-1", "po1", "0.Assigned", ts("2024-03-01"), ts("2024-03-02")),
        row("DL-1", "po1", "15.Waiting Payment", ts("2024-03-04"), ts("2024-03-05")),
        row("DL-1", "po1", "2.Payment to Merchant", ts("2024-03-06"), ts("2024-03-07")),
        row("DL-1", "po1", "5.Ready for Shipment", ts("2024-03-08"), ts("2024-03-09")),
        row("DL-1", "po1", "6.Shipped", ts("2024-03-09"), nul),
        // DL-1 / po2: paid but NOT ready-for-shipment (end null)
        row("DL-1", "po2", "0.Assigned", ts("2024-03-02"), ts("2024-03-03")),
        row("DL-1", "po2", "15.Waiting Payment", ts("2024-03-05"), ts("2024-03-06")),
        row("DL-1", "po2", "2.Payment to Merchant", ts("2024-03-07"), ts("2024-03-08")),
        row("DL-1", "po2", "5.Ready for Shipment", ts("2024-03-08"), nul),
        row("DL-1", "po2", "6.Shipped", nul, nul),
        // DL-2 / po3: everything cleared
        row("DL-2", "po3", "0.Assigned", ts("2024-04-01"), ts("2024-04-01")),
        row("DL-2", "po3", "15.Waiting Payment", ts("2024-04-01"), ts("2024-04-02")),
        row("DL-2", "po3", "2.Payment to Merchant", ts("2024-04-02"), ts("2024-04-03")),
        row("DL-2", "po3", "5.Ready for Shipment", ts("2024-04-03"), ts("2024-04-04")),
        row("DL-2", "po3", "6.Shipped", ts("2024-04-04"), ts("2024-04-05")))
        .mkString("\nUNION ALL\n")))

    val model = SqlTemplater.sqlModelAuto(
      "purchasing_and_production_report_sla_stages_by_deals", sql)
    assert(model.fileFormat == "delta")
    assert(model.deps == Seq("purchasing_and_production_report_sla_stages"))

    for ((n, st) <- new DagRunner(Seq(model)).run(ctx,
        selectors = Seq("purchasing_and_production_report_sla_stages_by_deals")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val out = ctx.ref("purchasing_and_production_report_sla_stages_by_deals")
    val rows = out.selectExpr("deal_friendly_id", "stage", "is_small_batch",
      "sla_granularity", "CAST(sla_value AS INT)", "CAST(start_ts AS STRING)",
      "CAST(end_ts AS STRING)", "ROUND(fact_value_with_weekends, 6)",
      "ROUND(fact_value_without_weekends, 6)")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
    assert(rows.size == 6, rows.keys.toString)

    def d(s: String) = s + " 00:00:00"
    // DL-1 1.Confirmation: both orders assigned AND paid → ready; 03-01 →
    // 03-06 spans Sat+Sun (48 weekend h of 120) → 3.0 working days
    assert(rows(("DL-1", "1.Confirmation")) == Seq(1, "day", 4,
      d("2024-03-01"), d("2024-03-06"), 5.0, 3.0),
      rows(("DL-1", "1.Confirmation")).toString)
    // DL-1 2.China Operations: po2 not ready-for-shipment → end suppressed
    assert(rows(("DL-1", "2.China Operations")) == Seq(1, "day", 14,
      d("2024-03-06"), null, null, null),
      rows(("DL-1", "2.China Operations")).toString)
    // DL-1 3.Shipped: no order shipped → not ready
    assert(rows(("DL-1", "3.Shipped")) == Seq(1, "day", 7,
      d("2024-03-08"), null, null, null))
    // DL-2: single order, all gates pass, no weekend overlap
    assert(rows(("DL-2", "1.Confirmation")) == Seq(1, "day", 4,
      d("2024-04-01"), d("2024-04-02"), 1.0, 1.0))
    assert(rows(("DL-2", "2.China Operations")) == Seq(1, "day", 14,
      d("2024-04-02"), d("2024-04-04"), 2.0, 2.0))
    assert(rows(("DL-2", "3.Shipped")) == Seq(1, "day", 7,
      d("2024-04-03"), d("2024-04-05"), 2.0, 2.0))
  }
}
