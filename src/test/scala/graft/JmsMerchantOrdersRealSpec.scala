package graft

import java.nio.file.{Files, Paths}

import graft.runtime._

/** The corpus-wide currency-conversion archetype, run as a 4-verbatim-node
  * DAG: `dashboards/dim_pair_currency_rate.sql` (the same-date self-join
  * rate-ratio VIEW dozens of models consume) feeding
  * `dashboards/jms_merchant_orders.sql`'s
  * `marketplace_created_time BETWEEN effective_date AND next_effective_date`
  * as-of range join, plus the verbatim `gold_merchants` and
  * `gold_merchant_categories` dims (a synthetic gold_products stands in for
  * the already-proven wide product model). Pins: the rate ratio arithmetic,
  * the inclusive BETWEEN edge at exactly effective_date, the source.kind
  * and created-date floor filters, VAT/revenue conversion cells, and the
  * refund/fraud passthrough.
  */
class JmsMerchantOrdersRealSpec extends SparkSpec {
  import spark.implicits._

  private val ref = "/root/reference"
  private def readSql(p: String): String = Files.readString(Paths.get(s"$ref/$p"))

  private def order(id: String, kind: String, created: String, mkt: String,
                    ccy: String, gmv: Double, vat: Double, online: Option[String],
                    refunded: Boolean): String = {
    val onl = online.map(o => s"'$o'").getOrElse("CAST(NULL AS STRING)")
    val rts = if (refunded) s"TIMESTAMP'2024-03-20 00:00:00'" else "CAST(NULL AS TIMESTAMP)"
    val rr = if (refunded) "'notAsDescribed'" else "CAST(NULL AS STRING)"
    s"""SELECT TIMESTAMP'$mkt' AS marketplace_created_time, 7L AS merchant_id,
       |  70L AS store_id, '$id' AS order_id,
       |  named_struct('marketplace', 'ozon') AS marketplace_id,
       |  'F$id' AS friendly_id, 'TRK$id' AS tracking_number, $onl AS online_order_id,
       |  200L AS product_id, 400L AS variant_id, 'DE' AS country, 2 AS quantity,
       |  named_struct('merchant_currency', '$ccy', 'customer_gmv', ${gmv}D,
       |    'customer_vat', ${vat}D, 'merchant_revenue', 60.0D,
       |    'merchant_unit_price', 30.0D) AS money_info,
       |  named_struct('time_utc', $rts, 'merchant_reason', $rr,
       |    'customer_reason', CAST(NULL AS STRING)) AS refund,
       |  false AS is_fraud, 3.5D AS cft,
       |  TIMESTAMP'$created' AS created_time_utc,
       |  TIMESTAMP'$mkt' AS user_ordered_time_utc,
       |  CAST(NULL AS TIMESTAMP) AS fulfilled_online_time_utc,
       |  CAST(NULL AS TIMESTAMP) AS shipped_time_utc,
       |  TIMESTAMP'$mkt' AS updated_time_utc,
       |  named_struct('time_utc', CAST(NULL AS TIMESTAMP)) AS cancelled_by_jl_info,
       |  named_struct('kind', '$kind') AS source""".stripMargin
  }

  test("REAL dim_pair_currency_rate.sql + jms_merchant_orders.sql (+ verbatim " +
    "gold_merchants/gold_merchant_categories): rate-ratio view feeding the " +
    "BETWEEN currency as-of, cells hand-pinned") {
    val macros = CorpusSweep.loadMacros(Paths.get(s"$ref/macros"))
    val ctx = freshCtx().copy(macros = macros)

    // mart.dim_currency_rate: per-currency rates at one effective date;
    // the view's same-date self-join turns them into pair ratios
    ctx.sources.register("mart", "dim_currency_rate")(s => s.sql(
      """SELECT 'EUR' AS currency_code, 1.2D AS rate,
        |  DATE'2024-03-01' AS effective_date, DATE'2024-04-01' AS next_effective_date
        |UNION ALL
        |SELECT 'USD', 0.8D, DATE'2024-03-01', DATE'2024-04-01'""".stripMargin))
    ctx.sources.register("mongo", "merchant_order")(s => s.sql(Seq(
      // M1: the happy path — EUR order inside the rate window, JL-linked
      order("M1", "jms", "2024-03-05 10:00:00", "2024-03-05 10:00:00",
        "EUR", 100.0, 10.0, Some("JL1"), refunded = false),
      // M2: kind='joom' -> source.kind filter drops it
      order("M2", "joom", "2024-03-05 10:00:00", "2024-03-05 10:00:00",
        "EUR", 999.0, 0.0, None, refunded = false),
      // M3: created before the 2023-02-16 first-JMS-order floor
      order("M3", "jms", "2023-01-01 10:00:00", "2023-01-01 10:00:00",
        "EUR", 999.0, 0.0, None, refunded = false),
      // M4: USD, refunded, no JL link; marketplace time EXACTLY at the
      // window's effective_date pins BETWEEN's inclusive lower edge
      order("M4", "jms", "2024-03-01 00:00:00", "2024-03-01 00:00:00",
        "USD", 50.0, 5.0, None, refunded = true)
    ).mkString("\nUNION ALL\n")))
    ctx.sources.register("logistics_mart", "jl_fact_order")(s => s.sql(
      """SELECT 'JL1' AS order_number, 6.0D AS final_revenue_usd,
        |  4.0D AS final_total_cost_usd, 'JMS' AS counterparty_customer,
        |  TIMESTAMP'2024-03-06 00:00:00' AS logistics_order_created_time_utc
        |UNION ALL
        |SELECT 'JL1', 999.0D, 999.0D, 'JOOM', TIMESTAMP'2024-03-06 00:00:00'""".stripMargin))
    // dims: same mock shapes the gold slice proves these two models on
    ctx.sources.register("mart", "dim_merchant")(s => {
      import s.implicits._
      Seq((7L, "m-seven", "cn")).toDF("merchant_id", "name", "origin_name")
        .selectExpr("merchant_id", "name", "origin_name",
          "1717200000000L AS created_time", "1717200000000L AS updated_time",
          "true AS enabled")
    })
    ctx.sources.register("mart", "category_levels")(s =>
      s.range(0, 10).selectExpr("id AS category_id", "concat('cat', id) AS name",
        "named_struct('name', concat('L1-', id), 'id', " +
          "IF(id = 2, '1473502935479416415-109-2-118-770440083', concat('l1-', id))) AS level_1_category",
        "named_struct('name', concat('L2-', id), 'id', concat('l2-', id)) AS level_2_category",
        "named_struct('name', concat('L3-', id), 'id', concat('l3-', id)) AS level_3_category",
        "named_struct('name', concat('L4-', id), 'id', concat('l4-', id)) AS level_4_category",
        "named_struct('name', concat('L5-', id), 'id', concat('l5-', id)) AS level_5_category"))

    def auto(name: String, path: String): Model =
      SqlTemplater.sqlModelAuto(name, readSql(path), macros, ctx.vars)
    val goldProducts = Model("gold_products", c => c.spark.sql(
      "SELECT 200L AS product_id, 'Widget' AS product_name, " +
        "'Electronics & HA' AS business_line, 2L AS merchant_category_id"))
    val nodes = Seq(
      auto("dim_pair_currency_rate", "models/spark/dashboards/dim_pair_currency_rate.sql"),
      auto("gold_merchants", "models/spark/gold/gold_merchants.sql"),
      auto("gold_merchant_categories", "models/spark/gold/gold_merchant_categories.sql"),
      goldProducts,
      auto("jms_merchant_orders", "models/spark/dashboards/jms_merchant_orders.sql"))
    for ((n, st) <- new DagRunner(nodes).run(ctx))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    // the view: |currencies|^2 pairs per date, ratio arithmetic pinned
    val pairs = ctx.ref("dim_pair_currency_rate")
      .selectExpr("currency_code", "currency_code_to", "ROUND(rate, 9)")
      .as[(String, String, Double)].collect().toSet
    assert(pairs == Set(
      ("EUR", "EUR", 1.0), ("EUR", "USD", 1.5),
      ("USD", "EUR", 0.666666667), ("USD", "USD", 1.0)), pairs.toString)

    val out = ctx.ref("jms_merchant_orders").cache()
    try {
      assert(out.count() == 2, out.select("merchant_order_id").collect().mkString(","))
      val rows = out.selectExpr("merchant_order_id", "CAST(order_date_utc AS STRING)",
          "merchant_name", "origin_name", "product_name", "business_line",
          "l2_merchant_category_name", "ROUND(gmv_initial_w_vat, 6)", "ROUND(gmv_initial_wo_vat, 6)",
          "ROUND(merchant_revenue, 6)", "ROUND(merchant_unit_price, 6)", "logistics_total_revenue",
          "logistics_total_cost", "is_refunded", "refund_merchant_reason")
        .as[(String, String, String, String, String, String, String, Double, Double,
             Double, Double, Option[Double], Option[Double], Boolean, Option[String])]
        .collect().toSet
      assert(rows == Set(
        // EUR at rate 1.2/0.8 = 1.5: gmv 100 -> 150, wo_vat 150-15, rev 60->90
        ("M1", "2024-03-05", "m-seven", "cn", "Widget", "Electronics & HA",
          "L2-2", 150.0, 135.0, 90.0, 45.0, Some(6.0), Some(4.0), false, None),
        // USD->USD rate 1.0; BETWEEN includes the exact effective_date edge;
        // refund passthrough; no JL link -> null logistics legs
        ("M4", "2024-03-01", "m-seven", "cn", "Widget", "Electronics & HA",
          "L2-2", 50.0, 45.0, 60.0, 30.0, None, None, true, Some("notAsDescribed"))),
        rows.toSeq.sortBy(_._1).mkString("\n"))
    } finally out.unpersist()
  }
}
