package graft

import graft.runtime._

/** models/spark/onfy/onfy_product_analogues.sql executed VERBATIM — the
  * reference's own similarity-search archetype (SURVEY §2's most-cited model):
  *   - TRANSFORM over SORT_ARRAY(COLLECT_LIST(STRUCT(...))) (:40-42) — the
  *     index-ordered ingredient list with the index dropped after the sort;
  *   - EXISTS(active, x -> x.quantity IS NULL) (:53) — any unknown dose
  *     voids the signature;
  *   - SHA2(CONCAT_WS('|', TRANSFORM(SORT_ARRAY(...)))) ingredient signature
  *     (:55) — exact-dedup-by-content-hash, the same shape as ops/Dedup.exact;
  *   - double LATERAL VIEW POSEXPLODE pair generation with WHERE j > i
  *     (:76-80) — unique unordered pairs, no self-pairs;
  *   - non-ANSI g.product_ids[i] indexing (:73-74, dialect-pinned);
  *   - dim_product gating (is_current / NOT is_deleted / store_state /
  *     legal_form / stock) with MIN(price) per product (:89-97).
  *
  * Planted: products 1,2,3 share the active signature {Ibuprofen 400 mg,
  * Caffeine 100 mg, TAB} (insertion order shuffled per product to prove the
  * SORT_ARRAY orderings); product 1 also carries an INACTIVE lactose row that
  * must not enter the signature; product 4 has a NULL quantity (signature
  * NULL, dropped); product 5 matches on ingredients but in a CAP dosage form
  * (singleton group, HAVING SIZE > 1 drops it). Manufacturers A/B/A mean the
  * {1,3} pair dies on pn.manufacturer != pna.manufacturer, leaving exactly
  * the unordered pairs {1,2} and {2,3}. COLLECT_LIST order after a shuffle is
  * nondeterministic, so assertions are direction-agnostic (LEAST/GREATEST)
  * while every per-product attribute cell is hand-computed and exact.
  */
class ProductAnaloguesRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL onfy_product_analogues.sql finds analog pairs on planted products") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/onfy/onfy_product_analogues.sql"))
    val ctx = freshCtx()

    ctx.sources.register("pharmacy_landing", "ingredient")(s => {
      import s.implicits._
      Seq((10L, "Ibuprofen"), (11L, "Caffeine"), (12L, "Lactose"))
        .toDF("id", "name")
    })
    ctx.sources.register("pharmacy_landing", "dosage_form")(s => {
      import s.implicits._
      Seq((100L, "TAB"), (101L, "CAP")).toDF("id", "short_name")
    })
    ctx.sources.register("pharmacy_landing", "medicine")(s => {
      import s.implicits._
      Seq((1L, "PZN-1", 100L), (2L, "PZN-2", 100L), (3L, "PZN-3", 100L),
          (4L, "PZN-4", 100L), (5L, "PZN-5", 101L))
        .toDF("id", "country_local_id", "dosage_form_id")
    })
    ctx.sources.register("pharmacy_landing", "medicine_ingredient")(s => {
      import s.implicits._
      Seq(
        // product 1: rows inserted caffeine-first; index sort must restore 1,2
        (1L, 11L, true, 2, Some(100.0), "mg"),
        (1L, 10L, true, 1, Some(400.0), "mg"),
        (1L, 12L, false, 3, Some(50.0), "mg"), // inactive — excluded from signature
        // product 2: same actives, natural order
        (2L, 10L, true, 1, Some(400.0), "mg"),
        (2L, 11L, true, 2, Some(100.0), "mg"),
        // product 3: same actives, reversed insert order again
        (3L, 11L, true, 2, Some(100.0), "mg"),
        (3L, 10L, true, 1, Some(400.0), "mg"),
        // product 4: NULL quantity voids the whole signature (EXISTS :53)
        (4L, 10L, true, 1, None, "mg"),
        // product 5: same actives but CAP dosage form — singleton signature
        (5L, 10L, true, 1, Some(400.0), "mg"),
        (5L, 11L, true, 2, Some(100.0), "mg"))
        .toDF("medicine_id", "ingredient_id", "active", "index", "quantity", "unit")
    })
    ctx.sources.register("onfy_mart", "dim_product")(s => {
      import s.implicits._
      Seq(
        (1L, "P001", "Ibu400", "20", "St", "A", 5.99, true, false, "ACTIVE", "OTC", 10),
        (1L, "P001", "Ibu400", "20", "St", "A", 6.49, true, false, "ACTIVE", "OTC", 3),
        (1L, "P001", "Ibu400", "20", "St", "A", 1.00, true, false, "RESTRICTED", "OTC", 5),
        (2L, "P002", "IbuGen", "10", "St", "B", 4.50, true, false, "ACTIVE", "OTC", 7),
        (2L, "P002", "IbuGen", "10", "St", "B", 0.10, false, false, "ACTIVE", "OTC", 9),
        (2L, "P002", "IbuGen", "10", "St", "B", 0.20, true, true, "ACTIVE", "OTC", 9),
        (2L, "P002", "IbuGen", "10", "St", "B", 0.30, true, false, "ACTIVE", "OTC", 0),
        (3L, "P003", "IbuPlus", "20", "St", "A", 7.00, true, false, "ACTIVE", "OTC", 2),
        (3L, "P003", "IbuPlus", "20", "St", "A", 0.50, true, false, "ACTIVE", "RX", 2))
        .toDF("product_id", "pzn", "product_name", "quantity", "unit",
          "manufacturer_short_name", "price", "is_current", "is_deleted",
          "store_state", "legal_form", "stock_quantity")
    })

    val model = SqlTemplater.sqlModelAuto("onfy_product_analogues", sql)
    assert(model.materialization == Materialization.IncrementalInsertOverwrite(
      Nil, OnSchemaChange.Ignore))
    assert(model.deps.isEmpty) // pure source() model, no refs

    for ((n, st) <- new DagRunner(Seq(model)).run(ctx, selectors = Seq("onfy_product_analogues")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val out = ctx.ref("onfy_product_analogues")
    assert(out.count() == 2, out.collect().mkString("; "))

    // COLLECT_LIST order is nondeterministic -> pair direction is too; the
    // unordered pair set is the model's invariant.
    val pairs = out.selectExpr(
      "LEAST(product_id, analogue_id) AS lo", "GREATEST(product_id, analogue_id) AS hi")
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)), pairs.toString)

    // Every attribute cell exact, keyed by product id on BOTH sides of the pair.
    val expected = Map(
      1L -> ("P001", "Ibu400", "20 St", "A", 5.99),
      2L -> ("P002", "IbuGen", "10 St", "B", 4.50),
      3L -> ("P003", "IbuPlus", "20 St", "A", 7.00))
    val rows = out.selectExpr(
      "product_id", "product_pzn", "product_name", "product_package_size",
      "product_manufacturer", "product_min_price",
      "analogue_id", "analogue_pzn", "analogue_name", "analogue_package_size",
      "analogue_manufacturer", "analogue_min_price")
      .as[(Long, String, String, String, String, Double,
           Long, String, String, String, String, Double)].collect()
    for ((pid, ppzn, pname, psize, pman, pprice, aid, apzn, aname, asize, aman, aprice) <- rows) {
      assert((ppzn, pname, psize, pman, pprice) == expected(pid), s"product side of $pid/$aid")
      assert((apzn, aname, asize, aman, aprice) == expected(aid), s"analogue side of $pid/$aid")
      assert(pman != aman, "manufacturer filter must hold")
    }
  }
}
