package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.runtime.CorpusExecute

/** Real-corpus regression gate for the incremental warm start around the
  * r16 shared-key war participants (`product_nf_segment` /
  * `product_rating_segment`: the two nodes whose product_id plant⇄retract
  * war rekindled when a full-corpus incremental load dropped gold_orders'
  * claims on the shared mart tables — the failure the LOCALITY RULE fixed).
  *
  * This spec runs the smallest REAL subset that lets both warring readers
  * converge cold: the 10 roots below pull a 36-node dependency closure
  * containing every claimant of the shared keys ((mart, star_order_2020),
  * (mart, category_levels), (mart, dim_published_product_min)). Protocol:
  * cold → edit `user_points_transactions` (the r16 dev-loop edit, inside
  * gold_orders' ancestry) → incremental warm rerun. Asserts the warm run
  * executes the SAME set with NO negotiation-limit gaps and a strictly
  * smaller iteration bill.
  *
  * Scope, honestly: the 473-vs-475 war itself does NOT reproduce below
  * full-corpus scale — r17 probed this systematically (19/26/36-node
  * subsets, plus synthetic plant⇄retract fixtures): with every claimant
  * present the negotiation re-resolves the war from ANY partial seed, and
  * with claimants missing the readers fail even cold. The war's rekindling
  * needed the full 475-node choreography. What IS machine-gated:
  * per-state-kind invalidation + the locality rule's keep/drop semantics
  * (IncrementalWarmStartSpec, unit level), and THIS spec: end-to-end
  * cold→edit→warm equivalence on the war participants' real subgraph.
  * The full-scale evidence stays the r16 TSV pair
  * (reports/corpus_exec_report_{cold,increditwarm}_r16.tsv, 475 = 475).
  */
class WarSubsetRealSpec extends SparkSpec {

  private def copyDir(from: Path, to: Path): Unit = {
    val walk = Files.walk(from)
    try walk.forEach { p =>
      val t = to.resolve(from.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
  }

  test("war-participant subset: cold -> edit -> incremental warm executes " +
    "the same set with no negotiation-limit gaps") {
    val corpus = Paths.get(graft.runtime.TempDirs.create("graft_war_subset").toString)
    for (d <- Seq("models", "macros", "snapshots", "seeds"))
      copyDir(Paths.get(s"/root/reference/$d"), corpus.resolve(d))
    val cache = corpus.resolve("cache/synth.parquet")
    // the two warring readers + every claimant of their shared source keys
    // (star_order_2020: gold_orders/orders/user_segments/sales_data_daily/
    // fluff_products_ext; category_levels: categories/merchant_products;
    // product_rating_counters: fbj_variant_statistics)
    val roots = Set("gold_orders", "product_nf_segment", "product_rating_segment",
      "orders", "user_segments", "sales_data_daily", "fluff_products_ext",
      "categories", "fbj_variant_statistics", "merchant_products")
    def go(): CorpusExecute.Report = CorpusExecute.run(spark,
      corpus.resolve("models"), corpus.resolve("macros"),
      corpus.resolve("snapshots"), corpus.resolve("seeds"),
      only = Some(roots), cacheOverride = Some(cache))

    val cold = go()
    val coldExec = cold.executed.map(_.name).toSet
    assert(coldExec.contains("product_nf_segment") &&
      coldExec.contains("product_rating_segment"),
      s"war readers must converge cold in this subset:\n${cold.describe}")
    assert(!cold.items.exists(_.status.startsWith("gap:negotiation-limit")),
      cold.describe)

    // the r16 dev-loop edit: inside gold_orders' ancestry, outside the
    // readers' own subtrees — its closure invalidation is what dropped the
    // shared-key claims in the pre-locality-rule failure
    val upt = corpus.resolve("models/spark/dashboards/user_points_transactions.sql")
    Files.writeString(upt, Files.readString(upt) + "\n-- dev-loop edit\n")
    val warm = go()
    assert(warm.executed.map(_.name).toSet == coldExec,
      s"warm executed set diverged from cold:\n${warm.describe}")
    assert(!warm.items.exists(_.status.startsWith("gap:negotiation-limit")),
      s"war rekindled on the incremental seed:\n${warm.describe}")
    def iters(r: CorpusExecute.Report) = r.items.map(_.iterations).sum
    assert(iters(warm) < iters(cold),
      s"warm start paid MORE negotiation than cold: ${iters(warm)} >= ${iters(cold)}")
  }
}
