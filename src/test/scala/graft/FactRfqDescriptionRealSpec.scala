package graft

import graft.runtime._

/** models/spark/b2b_mart/fact/fact_rfq_description.sql executed VERBATIM —
  * the second round-11 "order-dependent type war" gap-class model, now on
  * the roster: a two-branch RFQ fact whose variant spine is a CROSS JOIN
  * against `sequence(0, max(size(productVariants)) - 1)` computed over the
  * WHOLE snapshot (:56-65) — so a row with fewer variants than the global
  * max dereferences `productVariants[vn]` out of bounds, and the non-ANSI
  * NULL feeds every `coalesce(variant.x, top_level_x)` fallback (:21-23);
  * plus `cat1 = cat1.category_id` joins where the bare name is a COLUMN and
  * the qualified name is a SUBQUERY ALIAS (:69, :141), a `size(…)=-1` images
  * filter quirk on empty-vs-null arrays (:78), `null as questionnaire`
  * union-coerced against the deals branch's deep struct (:34, :176-188 —
  * the positional UNION ALL at :193 that made type negotiation
  * order-dependent), and a deals-only bounds guard `(variant_number = 0 or
  * size(productVariants) >= variant_number + 1)` (:135). */
class FactRfqDescriptionRealSpec extends SparkSpec {
  import spark.implicits._

  private def msOf(mskWall: String): Long =
    (java.time.Instant.parse(mskWall.replace(' ', 'T') + "Z").getEpochSecond - 10800L) * 1000L

  test("REAL fact_rfq_description.sql: global variant spine, OOB coalesces, union coercion") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/b2b_mart/fact/fact_rfq_description.sql"))
    val ctx = freshCtx()

    val t1 = msOf("2024-06-01 10:00:00")
    val t2 = msOf("2024-06-02 10:00:00")
    val t3 = msOf("2024-06-03 10:00:00")
    val t4 = msOf("2024-06-04 10:00:00")

    ctx.sources.register("mart", "category_levels")(s => s.sql(
      "SELECT 'c1' AS category_id, 'Electronics' AS name UNION ALL " +
        "SELECT 'c2', 'Phones' UNION ALL SELECT 'c3', 'Cases'"))

    def variant(imgs: String, amount: Double, ccy: String, qty: Int,
                descr: String, color: String, size: String) =
      s"named_struct('images', $imgs, 'price', named_struct('amount', ${amount}D, 'ccy', '$ccy'), " +
        s"'quantity', $qty, 'description', '$descr', 'color', '$color', 'size', '$size')"
    val emptyStr = "CAST(array() AS ARRAY<STRING>)"

    // orders snapshot: r1 has 1 variant but the GLOBAL max is 2 (r2), so
    // r1 × vn=1 dereferences out of bounds and falls back to top-level
    // price/qty/descr; r2's second variant has EMPTY images on both sides
    // and must be dropped by the greatest(size,size) > 0 filter
    ctx.warehouse.createTable("scd2_rfq_request_snapshot", spark.sql(
      s"""SELECT 'r1' AS _id, array('c1','c2','c3') AS categories,
         |  array('i1','i2') AS images, 'Widget' AS name, 'FR1' AS friendlyId,
         |  'http://x' AS plnk, named_struct('amount', 5.0D, 'ccy', 'USD') AS price,
         |  10 AS qty, 'o1' AS oid, 'top desc' AS descr,
         |  array(${variant("array('vi1')", 6.0, "EUR", 3, "vdesc", "red", "L")}) AS productVariants,
         |  7 AS manufacturingDays, ${t1}L AS ctms
         |UNION ALL
         |SELECT 'r2', array('c9'), $emptyStr, 'Widget2', 'FR2', 'l9',
         |  named_struct('amount', 2.0D, 'ccy', 'USD'), 5, 'o2', CAST(NULL AS STRING),
         |  array(${variant("array('wi1')", 3.0, "USD", 4, "wd1", "green", "M")},
         |        ${variant(emptyStr, 3.5, "USD", 6, "wd2", "black", "XL")}),
         |  2, ${t2}L""".stripMargin))

    // deals snapshot: d1 has ZERO variants (vn=0 still survives the bounds
    // guard; every variant deref is NULL), d2 has one plus a questionnaire
    // planted NULL so the union's struct coercion is exercised both ways
    val quest = "named_struct('additionalInfo', named_struct(" +
      "'annualVolume', '1000', 'assembly', 'yes', " +
      "'availability', named_struct('productionDays', 30, 'type', 'inStock'), " +
      "'considersSimilar', true, 'endUseOfProduct', named_struct('type', 'resale')), " +
      "'customisation', named_struct('instruction', 'inst', " +
      "'instructionTyped', named_struct('type', 'it'), 'logo', 'lg', " +
      "'logoTyped', named_struct('type', 'lt'), " +
      "'packingDesign', named_struct('type', 'pd'), " +
      "'packingType', named_struct('type', 'pt')))"
    val dv = variant("array('dvi1')", 4.0, "CNY", 7, "dd", "blue", "S")
    ctx.warehouse.createTable("scd2_customer_rfq_request_snapshot", spark.sql(
      s"""SELECT 'd1' AS _id, array('c2') AS categories, array('di1') AS images,
         |  'Gadget' AS name, 'FD1' AS friendlyId, 'l2' AS plnk,
         |  named_struct('amount', 9.0D, 'ccy', 'USD') AS price, 1 AS qty,
         |  'cr1' AS crid, CAST(NULL AS STRING) AS descr,
         |  filter(array($dv), x -> false) AS productVariants,
         |  3 AS manufacturingDays, ${t3}L AS ctms, 'm1' AS model,
         |  $quest AS questionnaire
         |UNION ALL
         |SELECT 'd2', array('c1','c3'), $emptyStr, 'Gadget2', 'FD2', 'l3',
         |  named_struct('amount', 8.0D, 'ccy', 'USD'), 2, 'cr2', 'd2desc',
         |  array($dv), 4, ${t4}L, 'm2', IF(FALSE, $quest, NULL)""".stripMargin))

    val model = SqlTemplater.sqlModelAuto("fact_rfq_description", sql)
    assert(model.materialization == Materialization.Table())
    assert(model.deps.toSet == Set("scd2_rfq_request_snapshot",
      "scd2_customer_rfq_request_snapshot"))

    for ((n, st) <- new DagRunner(Seq(model)).run(ctx, selectors = Seq("fact_rfq_description")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val out = ctx.ref("fact_rfq_description")
    val rows = out.selectExpr("rfq_request_id", "variant_number",
      "category_1", "category_2", "category_3", "images", "link", "price",
      "currency", "quantity", "variants", "manufacturing_days", "description",
      "color", "size", "order_id", "customer_request_id", "friendly_id",
      "model", "annual_volume", "production_days", "availability", "end_use",
      "instruction_typed", "packing_type", "CAST(created_time AS STRING)")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    assert(rows.size == 5, rows.keys.toString)

    val r1v1 = rows(("r1", 1))
    assert(r1v1.getString(2) == "Electronics" && r1v1.getString(3) == "Phones" &&
      r1v1.getString(4) == "Cases", r1v1.toString)
    assert(r1v1.getInt(5) == 2 && r1v1.getString(6) == "http://x")
    // variant present: its price/qty win the coalesce
    assert(r1v1.getDouble(7) == 6.0 && r1v1.getString(8) == "EUR" && r1v1.getInt(9) == 3)
    assert(r1v1.getInt(10) == 1 && r1v1.getInt(11) == 7)
    assert(r1v1.getString(12) == "top desc" && r1v1.getString(13) == "red" &&
      r1v1.getString(14) == "L")
    assert(r1v1.getString(15) == "o1" && r1v1.getString(16) == "" &&
      r1v1.getString(17) == "FR1" && r1v1.getString(18) == "")
    // orders branch: questionnaire is a NULL struct -> every deref NULL
    assert(r1v1.isNullAt(19) && r1v1.isNullAt(20) && r1v1.isNullAt(21), r1v1.toString)
    assert(r1v1.getString(25) == "2024-06-01 10:00:00")

    // the global-spine quirk: r1 has 1 variant but vn=1 (0-based) survives
    // the images filter via the TOP-LEVEL images, falling back everywhere
    val r1v2 = rows(("r1", 2))
    assert(r1v2.getDouble(7) == 5.0 && r1v2.getString(8) == "USD" && r1v2.getInt(9) == 10)
    assert(r1v2.getInt(5) == 2 && r1v2.getInt(10) == 1)
    assert(r1v2.getString(12) == "top desc" && r1v2.isNullAt(13) && r1v2.isNullAt(14))

    // r2 vn=0: unknown cat -> NULL names; empty top images but variant
    // images non-empty keep it; descr NULL falls back to the variant's
    val r2v1 = rows(("r2", 1))
    assert(r2v1.isNullAt(2) && r2v1.isNullAt(3) && r2v1.isNullAt(4), r2v1.toString)
    assert(r2v1.getInt(5) == 1 && r2v1.getDouble(7) == 3.0 && r2v1.getInt(9) == 4)
    assert(r2v1.getString(12) == "wd1" && r2v1.getString(13) == "green")
    assert(r2v1.getInt(10) == 2 && r2v1.getInt(11) == 2)
    // r2 vn=1 (variant w2): empty images BOTH sides -> filtered out
    assert(!rows.contains(("r2", 2)), rows.keys.toString)

    // d1: zero variants, vn=0 survives the deals bounds guard; questionnaire
    // struct flattens; order_id is the literal ''
    val d1 = rows(("d1", 1))
    assert(d1.getString(2) == "Phones" && d1.isNullAt(3) && d1.isNullAt(4))
    assert(d1.getInt(5) == 1 && d1.getDouble(7) == 9.0 && d1.getInt(9) == 1)
    assert(d1.getInt(10) == 0 && d1.isNullAt(12) && d1.isNullAt(13))
    assert(d1.getString(15) == "" && d1.getString(16) == "cr1" && d1.getString(18) == "m1")
    assert(d1.getString(19) == "1000" && d1.getInt(20) == 30 &&
      d1.getString(21) == "inStock" && d1.getString(22) == "resale")
    assert(d1.getString(23) == "it" && d1.getString(24) == "pt")
    assert(d1.getString(25) == "2024-06-03 10:00:00")

    // d2: variant wins coalesces; NULL questionnaire derefs NULL
    val d2 = rows(("d2", 1))
    assert(d2.getString(2) == "Electronics" && d2.getString(3) == "Cases" && d2.isNullAt(4))
    assert(d2.getDouble(7) == 4.0 && d2.getString(8) == "CNY" && d2.getInt(9) == 7)
    assert(d2.getString(12) == "d2desc" && d2.getString(13) == "blue")
    assert(d2.getString(16) == "cr2" && d2.getString(18) == "m2")
    assert(d2.isNullAt(19) && d2.isNullAt(20) && d2.isNullAt(23), d2.toString)
  }
}
