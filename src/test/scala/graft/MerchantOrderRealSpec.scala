package graft

import graft.runtime._

/** models/spark/mongo/merchant_order.sql executed VERBATIM — the round-11
  * "lambda-element struct comparison" gap-class model, now on the roster: a
  * 227-line projection VIEW over one Mongo snapshot whose heart is
  * `ELEMENT_AT(TRANSFORM(FILTER(st.st, element -> element.s == 0), x -> x.t), 1)`
  * (:24-27 — a lambda comparing a struct FIELD of the exploded element, the
  * exact shape that starved schema negotiation), `ELEMENT_AT(st.st, 1).s`
  * status decoding (:93-106), keyword field names (`st.if` :109,
  * backquoted `sid`/`oid`/`mpid`), IF-guarded NAMED_STRUCT re-nesting with
  * NULL fallthrough on every branch (marketplace_id :18-21, gift :38-41,
  * refund :112-160, return :162-173, cancelled_by_jl_info :174-222,
  * fulfillment_info :225-229), TRANSFORM dictionaries (discounts :71-89,
  * supported_return_methods :216-221), and micro-unit /1000000 money
  * scaling. Row o1 populates every branch; row o2 drives every IF down its
  * NULL arm plus the out-of-bounds ELEMENT_AT → NULL dialect contract. */
class MerchantOrderRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL merchant_order.sql: lambda filters, IF-null branches, status decode") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/mongo/merchant_order.sql"))
    val ctx = freshCtx()

    def ts(s: String) = s"CAST('$s' AS TIMESTAMP)"
    def nullOf(expr: String) = s"IF(FALSE, $expr, NULL)"

    // struct-expression builders shared by both rows so UNION branch types
    // align; row o2 reuses them under IF(FALSE, …, NULL) for typed NULLs
    val srcA = "named_struct('k', 'web', 'id', 's1')"
    val mpidA = "named_struct('m', 'ali', 'id', 'm9')"
    val shSidA = "named_struct('tn', 'TN1', 'sid', 'sh1', 'oid', 'oo1')"
    val rvA = "named_struct('r', 4.5D)"
    val refA = s"named_struct('t', ${ts("2024-05-03 10:00:00")}, 'f', 0.5D, 'cr', 4, 'mr', 2)"
    val retA = s"named_struct('t', ${ts("2024-05-04 10:00:00")}, 'dr', 1)"
    val cjlA =
      s"""named_struct('ct', ${ts("2024-05-05 10:00:00")}, 'reason', 2,
         |  'reaction', named_struct('d', ${ts("2024-05-06 10:00:00")},
         |    'rt', ${ts("2024-05-07 10:00:00")}, 's', 3, 'a', 1,
         |    'acc', 'acc1', 'pa', 'pa1', 'spi', named_struct('pd', DATE'2024-05-08')),
         |  'tn', 'TN2', 'oon', 'oo2', 'srm', array(1, 20, 7))""".stripMargin
    def stOf(events: String, sh: String, rv: String, fraud: Boolean,
             ref: String, ret: String, cjl: String) =
      s"named_struct('st', $events, 'sh', $sh, 'rv', $rv, 'if', $fraud, " +
        s"'ref', $ref, 'ret', $ret, 'cjl', $cjl)"
    val ciA = s"named_struct('t', ${ts("2024-04-30 09:00:00")}, " +
      "'a', named_struct('c', 'US'), " +
      "'jci', named_struct('pdr', named_struct('uid', 'u1'), 'dpid', 'dp1'))"
    val giftA = "named_struct('pid', 'gp', 'vid', 'gv')"
    val optA = "named_struct('whid', 'wh1')"
    val priceA = "named_struct('amount', 2500000, 'ccy', 'USD')"
    def piOf(p: String, q: Int, g: String, opt: String, shipT: Int, price: String) =
      s"named_struct('p', '$p', 'v', 'v-$p', 'q', $q, 'g', $g, " +
        s"'sh', named_struct('opt', $opt, 't', $shipT, 'p', $price))"
    def mimOf(gmvM: Long) = s"named_struct('c', 'EUR', 't', ${gmvM}L, 'r', 1000000L, " +
      "'up', 2000000L, 'us', 500000L, 'ra', 0L, 'ri', 0L, 'v', 0L, 'ewc', 0L, " +
      s"'td', ${gmvM}L, 'ot', 7000000L, 'otd', 7000000L)"
    val lA = "named_struct('sp', 3000000L, 'nc', 100000L, 'fsc', 200000L, 'pusd', 3300000L)"
    val dA = "named_struct('ds', array(named_struct('a', 1000000L, 't', 3, " +
      "'cid', CAST(NULL AS STRING), 'spid', 'sp9', 'btid', CAST(NULL AS STRING), " +
      "'mpid', CAST(NULL AS STRING), 'peid', CAST(NULL AS STRING), 'frid', CAST(NULL AS STRING))))"
    def miOf(cGmvM: Long, mGmvM: Long, l: String, d: String, tr: Double) =
      s"named_struct('m', ${mimOf(mGmvM)}, 'c', named_struct('gmv', ${cGmvM}L, 'vat', 500000L), " +
        s"'l', $l, 'd', $d, 'tr', ${tr}D)"
    val fiA = s"named_struct('isfa', true, 'fat', ${ts("2024-05-09 10:00:00")}, " +
      s"'oat', ${ts("2024-05-10 10:00:00")})"
    def row(id: String, fid: String, src: String, mpid: String, ci: String,
            st: String, pi: String, mi: String, fi: String): String =
      s"""SELECT '$id' AS _id, '$fid' AS fid, 'g-$id' AS ogid, $src AS src,
         |  $mpid AS mpid, ${ts("2024-04-30 08:00:00")} AS ctt, $ci AS ci,
         |  $st AS st, ${ts("2024-05-12 10:00:00")} AS upd, 'mer1' AS mid,
         |  'store1' AS `sid`, $pi AS pi, $mi AS mi, 'cft-$id' AS cft,
         |  $fi AS fi""".stripMargin
    val eventsA = s"array(named_struct('s', 0, 't', ${ts("2024-05-01 10:00:00")}), " +
      s"named_struct('s', 1, 't', ${ts("2024-05-02 10:00:00")}))"
    val eventsB = s"array(named_struct('s', 2, 't', ${ts("2024-05-11 10:00:00")}))"
    ctx.sources.register("mongo", "merchant_order_orders_daily_snapshot")(s => s.sql(
      row("o1", "F1", srcA, mpidA, ciA,
        stOf(eventsA, shSidA, rvA, fraud = false, refA, retA, cjlA),
        piOf("p1", 3, giftA, optA, shipT = 2, priceA),
        miOf(12000000L, 9000000L, lA, dA, 0.15), fiA) +
        "\nUNION ALL\n" +
        row("o2", "F2", srcA, nullOf(mpidA), ciA,
          stOf(eventsB, nullOf(shSidA), nullOf(rvA), fraud = true,
            nullOf(refA), nullOf(retA), nullOf(cjlA)),
          piOf("p2", 1, nullOf(giftA), nullOf(optA), shipT = 9, nullOf(priceA)),
          miOf(4000000L, 3000000L, nullOf(lA), nullOf(dA), 0.1), nullOf(fiA))))

    val model = SqlTemplater.sqlModelAuto("merchant_order", sql)
    assert(model.materialization == Materialization.View)
    assert(model.deps.isEmpty)

    for ((n, st) <- new DagRunner(Seq(model)).run(ctx, selectors = Seq("merchant_order")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val out = ctx.ref("merchant_order")
    val rows = out.selectExpr("order_id", "friendly_id", "source.kind",
      "marketplace_id.marketplace",
      "CAST(created_time_utc AS STRING)", "CAST(fulfilled_online_time_utc AS STRING)",
      "CAST(shipped_time_utc AS STRING)", "status", "selected_shipping_type",
      "gift.product_id", "warehouse_id", "selected_shipping_price.amount",
      "money_info.customer_gmv", "money_info.merchant_currency",
      "money_info.logistics_price",
      "money_info.discounts[0].type", "money_info.discounts[0].reference_id",
      "money_info.take_rate", "tracking_number", "rating", "is_fraud",
      "refund.customer_reason", "refund.merchant_reason",
      "`return`.decline_reason", "cancelled_by_jl_info.reason",
      "cancelled_by_jl_info.reaction.state", "cancelled_by_jl_info.reaction.author",
      "CAST(cancelled_by_jl_info.reaction.self_pickup_date AS STRING)",
      "cancelled_by_jl_info.supported_return_methods",
      "user_id", "country", "fulfillment_info.is_fulfillment_allowed")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.size == 2, rows.keys.toString)

    val a = rows("o1")
    assert(a.getString(1) == "F1" && a.getString(2) == "web" && a.getString(3) == "ali")
    // lambda FILTER on element.s: s==0 -> created, s==1 -> fulfilled; no
    // s==2 entry -> ELEMENT_AT over the empty filtered array is NULL
    assert(a.getString(4) == "2024-05-01 10:00:00", a.toString)
    assert(a.getString(5) == "2024-05-02 10:00:00", a.toString)
    assert(a.isNullAt(6), a.toString)
    assert(a.getString(7) == "created" && a.getString(8) == "JoomLogistics")
    assert(a.getString(9) == "gp" && a.getString(10) == "wh1")
    assert(math.abs(a.getDouble(11) - 2.5) < 1e-9)
    assert(math.abs(a.getDouble(12) - 12.0) < 1e-9 && a.getString(13) == "EUR")
    assert(math.abs(a.getDouble(14) - 3.0) < 1e-9)
    assert(a.getString(15) == "limitedTimeOffer" && a.getString(16) == "sp9")
    assert(math.abs(a.getDouble(17) - 0.15) < 1e-9)
    assert(a.getString(18) == "TN1" && math.abs(a.getDouble(19) - 4.5) < 1e-9)
    assert(!a.getBoolean(20))
    assert(a.getString(21) == "badQuality" && a.getString(22) == "outOfStock")
    assert(a.getString(23) == "incorrectItem" && a.getString(24) == "overweight")
    assert(a.getString(25) == "returned" && a.getString(26) == "merchantDefault")
    assert(a.getString(27) == "2024-05-08", a.toString)
    assert(a.getSeq[String](28) == Seq("courier", "selfPickup", "other"), a.toString)
    assert(a.getString(29) == "u1" && a.getString(30) == "US")
    assert(a.getBoolean(31))

    val b = rows("o2")
    // every IF drops to its NULL arm; s==2 is the only event -> shipped set,
    // created/fulfilled NULL; shipping type 9 hits the '' ELSE
    assert(b.isNullAt(3) && b.isNullAt(4) && b.isNullAt(5), b.toString)
    assert(b.getString(6) == "2024-05-11 10:00:00" && b.getString(7) == "shipped")
    assert(b.getString(8) == "")
    assert(b.isNullAt(9) && b.isNullAt(10) && b.isNullAt(11), b.toString)
    assert(math.abs(b.getDouble(12) - 4.0) < 1e-9)
    assert(b.isNullAt(14) && b.isNullAt(15) && b.isNullAt(16), b.toString)
    assert(b.isNullAt(18) && b.isNullAt(19) && b.getBoolean(20), b.toString)
    assert(b.isNullAt(21) && b.isNullAt(23) && b.isNullAt(24), b.toString)
    assert(b.isNullAt(28) && b.isNullAt(31), b.toString)
  }
}
