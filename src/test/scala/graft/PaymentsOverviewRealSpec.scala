package graft

import graft.runtime._

/** models/spark/payments/bs_ip_overview_raw_data.sql executed VERBATIM —
  * the payments-family archetype: the idbank UTC+4 branch coercing the
  * time columns to STRING (IF(string, timestamp) → string; MINs are then
  * lexicographic, which matches time order for this format), a THREE-key
  * payment↔refund join (payment_id + currency + provider — a
  * wrong-currency refund must NOT attach), MIN_BY first-payment roll-ups,
  * FLATTEN(ARRAY_AGG(list)) refund flattening with ARRAY_SIZE counting,
  * struct fee sums with ANY_VALUE ccy, and the zero-PSP card flag. */
class PaymentsOverviewRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL bs_ip_overview_raw_data.sql: idbank shift, 3-key refund join, " +
       "flattened refund lists, zero-psp flag") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/payments/bs_ip_overview_raw_data.sql"))
    val model = SqlTemplater.sqlModelAuto("bs_ip_overview_raw_data", sql)
    assert(model.materialization == Materialization.Table())
    assert(model.deps == Seq("payment"))

    // ref'd payment model (stub; the real one is upstream of this family)
    val payment = Model("payment", ctx => ctx.spark.sql(Seq(
      // og1: two successful payments — idbank's created 09:00 books at
      // bank time 10:00 (UTC+4), beating paygine's 11:00 → MIN_BY picks it
      ("og1", "p1", "po1", "2024-05-01 11:00:00", "RUB", 100.0, 1.0, 1, "paygine_bs", "card", "2024-05-01"),
      ("og1", "p2", "po2", "2024-05-01 09:00:00", "AMD", 200.0, 0.5, 1, "idbank", "card", "2024-05-01"),
      // og1: FAILED payment that still carries this group's refunds
      ("og1", "p3", "po3", "2024-05-02 10:00:00", "RUB", 80.0, 0.8, 0, "raifpay_bs", "card", "2024-05-02"),
      // og4: lone successful card payment, no fees, no refunds → flag
      ("og4", "p7", "po7", "2024-05-05 08:00:00", "RUB", 50.0, 0.6, 1, "paygine_ip", "card", "2024-05-05"),
      // excluded: provider / landmark date / null group
      ("og2", "p4", "po4", "2024-05-01 10:00:00", "RUB", 10.0, 0.1, 1, "gateway_x", "card", "2024-05-01"),
      ("og3", "p5", "po5", "2023-12-31 10:00:00", "RUB", 10.0, 0.1, 1, "paygine_bs", "card", "2023-12-31"),
      (null, "p6", "po6", "2024-05-01 10:00:00", "RUB", 10.0, 0.1, 1, "paygine_bs", "card", "2024-05-01"))
      .map { case (og, pid, poid, ct, ccy, amt, usd, ok, prov, typ, d) =>
        val ogSql = Option(og).map(x => s"'$x'").getOrElse("CAST(NULL AS STRING)")
        s"""SELECT $ogSql AS order_group_id, '$pid' AS payment_id,
           |  '$poid' AS payment_order_id, TIMESTAMP'$ct' AS created_time,
           |  '$ccy' AS currency, ${amt}D AS amount_currency, ${usd}D AS amount_usd,
           |  $ok AS is_success, '$prov' AS provider, '$typ' AS payment_type,
           |  DATE'$d' AS date""".stripMargin
      }.mkString("\nUNION ALL\n")), Materialization.Table())

    val ctx = freshCtx()
    ctx.sources.register("payments", "fact_refund")(s => s.sql(Seq(
      // two successful refunds of p3 (RUB, raifpay_bs): joined + flattened
      ("p3", "r1", "RUB", 50.0, 0.5, "2024-05-03 12:00:00", 1, "raifpay_bs"),
      ("p3", "r2", "RUB", 25.0, 0.25, "2024-05-03 11:00:00", 1, "raifpay_bs"),
      // wrong CURRENCY for p1: the 3-key join must not attach it
      ("p1", "r3", "USD", 1.0, 1.0, "2024-05-03 10:00:00", 1, "paygine_bs"),
      // failed refund: excluded at the first CTE
      ("p3", "r4", "RUB", 5.0, 0.05, "2024-05-03 09:00:00", 0, "raifpay_bs"))
      .map { case (pid, rid, ccy, amt, usd, ts, ok, prov) =>
        s"""SELECT '$pid' AS payment_id, '$rid' AS refund_id, '$ccy' AS currency,
           |  ${amt}D AS amount_currency, ${usd}D AS amount_usd,
           |  TIMESTAMP'$ts' AS ts_msk, $ok AS is_success, '$prov' AS provider_id""".stripMargin
      }.mkString("\nUNION ALL\n")))
    ctx.sources.register("mongo", "finance_order_costs_daily_snapshot")(s =>
      s.sql(Seq((2.0, 0.02, 1.0, 0.01), (3.0, 0.03, 1.0, 0.01)).map {
        case (ia, iu, fa, fu) =>
          s"""SELECT 'og1' AS orderGroupId, NAMED_STRUCT(
             |  'pspChargeFeeInitial', NAMED_STRUCT('amount', ${ia}D, 'ccy', 'RUB', 'usd', ${iu}D),
             |  'pspFinal', NAMED_STRUCT('amount', ${fa}D, 'ccy', 'RUB', 'usd', ${fu}D)) AS costs""".stripMargin
      }.mkString("\nUNION ALL\n")))

    new DagRunner(Seq(payment, model)).run(ctx)
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    val out = ctx.ref("bs_ip_overview_raw_data")
      .selectExpr("order_group_id", "pmt_time_bank", "pmt_ccy", "pmt_amount",
        "pmt_provider", "cnt_pmts", "array_sort(payment_id_list)",
        "psp_from_cost_initial", "psp_ccy_from_costs_initial",
        "psp_usd_from_costs_final", "ref_time_bank", "ref_amount",
        "cnt_refunds", "array_sort(refund_id_list)", "zero_psp_card_ru_flag")
      .as[(String, String, String, Double, String, Long, Seq[String],
           Option[Double], Option[String], Option[Double], Option[String],
           Option[Double], Option[Int], Option[Seq[String]], Boolean)]
      .collect().toSet
    assert(out == Set(
      ("og1", "2024-05-01 10:00:00", "AMD", 300.0, "idbank", 2L, Seq("p1", "p2"),
        Some(5.0), Some("RUB"), Some(0.02), Some("2024-05-03 11:00:00"),
        Some(75.0), Some(2), Some(Seq("r1", "r2")), false),
      ("og4", "2024-05-05 08:00:00", "RUB", 50.0, "paygine_ip", 1L, Seq("p7"),
        None, None, None, None, None, None, None, true)), out.toString)
  }
}
