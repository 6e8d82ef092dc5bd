package graft

import graft.runtime._

/** models/spark/b2b_mart/order_product_prices.sql executed VERBATIM — the
  * round-11 "order-dependent type war" gap-class model, now on the roster:
  * a per-order currency-conversion pipeline carrying `from`/`to` as COLUMN
  * NAMES (:14-25 — legal identifiers in the non-ANSI dialect), a map-of-map
  * rates payload dereferenced as `rates[currency]['exchangeRate']` (:50-53),
  * `explode(variants)` over a MAP of structs (key/value columns, :71),
  * a row_number event dedup ordered by rates-non-null > companyRates-non-null
  * > updatedTime ASC (:34-35 — the planted decoy event is EARLIER and must
  * still lose on the companyRates tier), a cross join via a `for_join=1`
  * key (:25, :56), `select distinct` over a deliberately-duplicated
  * fact_merchant_order ref (:85), and the three-tier rate fallback
  * `coalesce(r1.rate, 1/r2.rate, case when currency='USD' then 1 end)`
  * (:83-84) — each tier covered by a planted product. */
class OrderProductPricesRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL order_product_prices.sql: rn dedup, rate fallbacks, map explode") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/b2b_mart/order_product_prices.sql"))
    val ctx = freshCtx()

    // operational events: the payload carries currencies as
    // struct<rates: map<pair, map<name, double>>, companyRates: same>
    def ev(typ: String, oid: String, ut: String, status: String,
           rates: String, companyRates: String): String =
      s"""SELECT '$typ' AS type, named_struct(
         |  'orderId', '$oid',
         |  'updatedTime', CAST($ut AS TIMESTAMP),
         |  'status', '$status',
         |  'currencies', named_struct(
         |    'rates', $rates,
         |    'companyRates', $companyRates)) AS payload""".stripMargin
    val nullRates = "CAST(NULL AS MAP<STRING, MAP<STRING, DOUBLE>>)"
    ctx.sources.register("b2b_mart", "operational_events")(s => s.sql(Seq(
      // o1 winner: both rates and companyRates non-null (later updatedTime
      // must NOT matter — the non-null tiers dominate the ordering)
      ev("orderChangedByAdmin", "o1", "'2024-03-06 14:00:00'", "manufacturing",
        "map('RUB-USD', map('exchangeRate', 0.01D, 'markupRate', 0.002D), " +
          "'USD-RUB', map('exchangeRate', 100.0D, 'markupRate', 1.0D))",
        "map('RUB-USD', map('exchangeRate', 0.011D))"),
      // o1 decoy: EARLIER time but companyRates null -> must lose rn=1;
      // if it won, p1's amount would come out 0.14, not 0.077
      ev("orderChangedByAdmin", "o1", "'2024-03-06 13:00:00'", "manufacturing",
        "map('RUB-USD', map('exchangeRate', 0.02D))", nullRates),
      // o2: only the USD->CNY direction exists -> the r2 1/rate tier fires
      ev("orderChangedByAdmin", "o2", "'2024-03-07 10:00:00'", "manufacturing",
        "map('USD-CNY', map('exchangeRate', 7.0D))", nullRates),
      // excluded: wrong status / null updatedTime / wrong type
      ev("orderChangedByAdmin", "o1", "'2024-03-08 09:00:00'", "pending",
        "map('RUB-USD', map('exchangeRate', 9.9D))", nullRates),
      ev("orderChangedByAdmin", "o2", "NULL", "manufacturing",
        "map('USD-CNY', map('exchangeRate', 9.9D))", nullRates),
      ev("somethingElse", "o1", "'2024-03-09 09:00:00'", "manufacturing",
        "map('RUB-USD', map('exchangeRate', 9.9D))", nullRates))
      .mkString("\nUNION ALL\n")))

    // order products: variants is a MAP of variant-id -> struct, so the
    // model's bare explode() yields key/value and reads value.qty
    def prod(pid: String, mo: String, deal: String, cur: String,
             variants: String): String =
      s"""SELECT '$pid' AS id, '$mo' AS merchOrdId, '$deal' AS dealId,
         |  $variants AS variants, '$cur' AS currency""".stripMargin
    def v(price: Long, qty: Int) =
      s"named_struct('priceAmountPerItem', ${price}L, 'qty', $qty)"
    ctx.sources.register("mongo", "b2b_core_order_products_daily_snapshot")(s =>
      s.sql(Seq(
        // two variants summed under one product: RUB via r1 company rate
        prod("p1", "mo1", "d1", "RUB", s"map('v1', ${v(2000000L, 3)}, 'v2', ${v(1000000L, 1)})"),
        // from = to: the rate-1 diagonal of the currency cross join
        prod("p2", "mo1", "d1", "USD", s"map('v1', ${v(5000000L, 2)})"),
        // no EUR rate in either direction: amount must be NULL, row kept
        prod("p3", "mo1", "d1", "EUR", s"map('v1', ${v(4000000L, 1)})"),
        // merchant order with no fact row: order_id NULL, USD literal tier
        prod("p4", "mo9", "d2", "USD", s"map('v1', ${v(3000000L, 2)})"),
        // only the reverse direction exists: 1/r2 tier (7.0 -> 1/7)
        prod("p5", "mo2", "d3", "CNY", s"map('v1', ${v(7000000L, 1)})"))
        .mkString("\nUNION ALL\n")))

    // ref table, with a duplicated mapping the model's SELECT DISTINCT
    // must collapse (a dup here would double p1/p2/p3 amounts)
    ctx.warehouse.createTable("fact_merchant_order", Seq(
      ("mo1", "o1", "a"), ("mo1", "o1", "b"), ("mo2", "o2", "c"))
      .toDF("merchant_order_id", "order_id", "noise"))

    val model = SqlTemplater.sqlModelAuto("order_product_prices", sql)
    assert(model.materialization == Materialization.Table())
    assert(model.deps.toSet == Set("fact_merchant_order"))

    for ((n, st) <- new DagRunner(Seq(model)).run(ctx, selectors = Seq("order_product_prices")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val out = ctx.ref("order_product_prices")
    val rows = out.selectExpr("product_id", "merchant_order_id", "deal_id",
      "order_id", "amount")
      .as[(String, String, String, Option[String], Option[Double])]
      .collect().map(r => (r._1, r._2, r._3, r._4) -> r._5).toMap
    assert(rows.size == 5, out.collect().mkString(";"))

    def near(a: Option[Double], b: Double) =
      a.exists(x => math.abs(x - b) < 1e-9)
    // winner event's company rate 0.011 (decoy's 0.02 would give 0.14)
    assert(near(rows(("p1", "mo1", "d1", Some("o1"))), 0.077), rows.toString)
    // diagonal USD->USD rate 1
    assert(near(rows(("p2", "mo1", "d1", Some("o1"))), 10.0), rows.toString)
    // no rate either direction -> NULL amount
    assert(rows(("p3", "mo1", "d1", Some("o1"))).isEmpty, rows.toString)
    // unmapped merchant order, USD literal tier
    assert(near(rows(("p4", "mo9", "d2", None)), 6.0), rows.toString)
    // reverse-direction fallback: 7000000 * (1/7.0) / 1e6
    assert(near(rows(("p5", "mo2", "d3", Some("o2"))), 7000000.0 * (1.0 / 7.0) / 1e6),
      rows.toString)
  }
}
