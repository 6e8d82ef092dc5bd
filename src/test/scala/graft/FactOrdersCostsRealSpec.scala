package graft

import graft.runtime._

/** models/spark/b2b_mart/fact/fact_orders_costs.sql (448 LoC) executed
  * VERBATIM: `payload.currencies.*` struct star-expansion, currency-pair
  * discovery via EXPLODE(SPLIT(map key, '-')) + self CROSS JOIN, UNQUOTED
  * reserved-word columns `from`/`to` compared and CASE-matched, chained map
  * indexing `rates[currency]['exchangeRate']`, triple-nested price
  * explosion (typedPricesOriginal → stagedPrices → multiPrice), RUB fee
  * conversion with markup, the DDP-suffix strip + EXW tag rewrite, and
  * per-stage (final / forecast=confirmed / subsidy) fee pivots over 25 fee
  * types — one order with four planted fees, hand-tallied.
  */
class FactOrdersCostsRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL fact_orders_costs.sql (448 LoC): currency-pair rates, staged fee pivots") {
    val ctx = freshCtx()

    def staged(stage: String, amount: Double): String =
      s"named_struct('stage', '$stage', 'multiPrice', array(named_struct('amount', CAST($amount AS DOUBLE), 'ccy', 'USD')))"

    ctx.sources.register("b2b_mart", "operational_events")(sp => sp.sql(
      s"""SELECT 'orderChangedByAdmin' AS type, 'e1' AS event_id,
         |  DATE'2024-06-01' AS partition_date,
         |  named_struct(
         |    'orderId', 'O1', 'updatedTime', 100L, 'status', 'manufacturing',
         |    'currencies', named_struct(
         |      'rates', map('USD-RUB',
         |        named_struct('exchangeRate', CAST(90.0 AS DOUBLE), 'markupRate', CAST(0.1 AS DOUBLE))),
         |      'companyRates', map('USD-RUB',
         |        named_struct('exchangeRate', CAST(88.0 AS DOUBLE), 'markupRate', CAST(0.05 AS DOUBLE)))),
         |    'typedPricesOriginal', array(
         |      named_struct('type', 'qc', 'tag', 'dap',
         |        'stagedPrices', array(${staged("final", 100.0)})),
         |      named_struct('type', 'linehaulDDP', 'tag', 'ddp',
         |        'stagedPrices', array(${staged("final", 10.0)}, ${staged("confirmed", 8.0)}))),
         |    'otherPricesOriginal', array(
         |      named_struct('type', 'grant', 'tag', 'grant',
         |        'stagedPrices', array(${staged("confirmed", 5.0)})))
         |  ) AS payload""".stripMargin))

    ctx.warehouse.createTable("dim_user", spark.sql(
      """SELECT 'U1' AS user_id, 'KZ' AS country,
        |  CAST(NULL AS TIMESTAMP) AS next_effective_ts_msk""".stripMargin))
    ctx.warehouse.createTable("fact_order", spark.sql(
      """SELECT 'U1' AS user_id, 'O1' AS order_id,
        |  TIMESTAMP'2024-06-01 10:00:00' AS min_manufactured_ts_msk,
        |  'FR1' AS friendly_id, CAST(NULL AS TIMESTAMP) AS next_effective_ts_msk,
        |  'EXW' AS delivery_scheme""".stripMargin))
    ctx.warehouse.createTable("fact_order_change", spark.sql(
      """SELECT 'O1' AS order_id, 'ADM1' AS owner_moderator_id,
        |  TIMESTAMP'2024-06-01 12:00:00' AS event_ts_msk,
        |  'manufacturing' AS status""".stripMargin))
    ctx.warehouse.createTable("dim_user_admin", spark.sql(
      "SELECT 'ADM1' AS admin_id, 'own@x.io' AS email"))
    ctx.warehouse.createTable("fact_customers", spark.sql(
      """SELECT 'U1' AS user_id, CAST(0.9 AS DOUBLE) AS grade_probability,
        |  'A' AS grade, 'Co' AS company_name""".stripMargin))
    ctx.warehouse.createTable("gmv_by_sources_wo_filters", spark.sql(
      """SELECT 'O1' AS order_id, CAST(1000.0 AS DOUBLE) AS gmv_initial,
        |  CAST(150.0 AS DOUBLE) AS initial_gross_profit,
        |  CAST(120.0 AS DOUBLE) AS final_gross_profit""".stripMargin))

    val model = SqlTemplater.sqlModelAuto("fact_orders_costs",
      java.nio.file.Files.readString(java.nio.file.Paths.get(
        "/root/reference/models/spark/b2b_mart/fact/fact_orders_costs.sql")))
    new DagRunner(Seq(model)).run(ctx, selectors = Seq("fact_orders_costs"))
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    val out = ctx.ref("fact_orders_costs")
    assert(out.count() == 1)
    val r = out.selectExpr(
      "order_id", "friendly_id", "user_id",
      "ddp_final_price_rub", "dap_final_price_rub", "qc_final_price_rub",
      "linehaul_final_price_rub",
      "ddp_forecast_price_rub", "linehaul_forecast_price_rub",
      "subsidy_confirmed_price_rub", "linehaul_confirmed_price_rub",
      "usd_rate", "usd_company_rate", "usd_markup_rate",
      "ROUND(usd_rate_with_markup, 2)", "cny_rate",
      "owner_email", "gmv_initial", "company_name", "grade", "country",
      "delivery_scheme").collect().head

    // hand-tally: USD->RUB effective rate 90*(1+0.1) = 99;
    //  final stage:     qc/dap 100 -> 9900, linehaul(DDP stripped)/ddp 10 -> 990
    //  confirmed stage: linehaul 8 -> 792, grant 5 -> 495
    //  forecast pivot = confirmed fees (1287); subsidy = grant rows only (495)
    val expected = Seq[Any]("O1", "FR1", "U1",
      10890.0, 9900.0, 9900.0, 990.0,
      1287.0, 792.0,
      495.0, 792.0,
      90.0, 88.0, 0.1, 99.0, null,
      "own@x.io", 1000.0, "Co", "A", "KZ", "EXW")
    for (i <- expected.indices)
      assert(r.get(i) == expected(i), s"col $i: got ${r.get(i)}, want ${expected(i)}")
  }
}
