package graft

import graft.runtime._

/** models/spark/logistics/dashboards/consolidation/jl_ali_costs_comparison.sql
  * executed VERBATIM — the hand-bucketed XXHASH64 theta-join pattern
  * (SURVEY §2.3): parcels are collapsed into price buckets keyed by
  * `XXHASH64(weight, dangerous_kinds, country, ROUND(price,2))` (:22), each
  * bucket theta-joins against BOTH tariff grids on weight/price bands plus
  * `ARRAY_EXCEPT` dangerous-kind containment (:91-106), and
  * `ROW_NUMBER ... ORDER BY per_item + per_kg*weight` keeps only the
  * cheapest channel per bucket (:85-87). Also covered: the Mongo bounds
  * explode with `COALESCE(starttime, TIMESTAMP(0))` open intervals (:31-38),
  * the NRM-only min-price rule and max=0→9999 sentinel (:47-48), the
  * hand-added `UNION` MD/RM row (:51-58), `partition_date BETWEEN` the
  * bound timestamps (:78), and the final both-prices-non-null share rollup
  * (:127-141).
  *
  * Fixture design (hand-computed):
  *  - bucket A (weight 1.0, non-dangerous, msp 10.00): two parcels whose
  *    prices ROUND to the same cent (10.00 vs 10.004) must collapse into
  *    ONE bucket (count 2, gmv 150); two ali tariffs match and ROW_NUMBER
  *    must keep the cheaper (3.0 not 4.0); one NRM jl tariff matches
  *    through its price-bound join (msp 10 within [5,50)).
  *  - bucket B (weight 2.0, dangerous kind 1, msp 20): dangerous routing on
  *    BOTH grids — ali via the ARRAY_EXCEPT(...)!=0 → 'dangerous' flag, jl
  *    via ARRAY_EXCEPT(bd, jtb)=0 containment; the EXP bound row exercises
  *    max=0→9999 and the non-NRM min_price=0 rule.
  *  - bucket C (weight 5.0, msp 10): ali matches, NO jl tariff covers the
  *    weight → jtb_price NULL → the final WHERE must drop the bucket (its
  *    gmv 77 must NOT appear in gmv_initial).
  *  - a sourcecountry='US' bounds row must be filtered out (:38); without
  *    that filter bucket A would double-join and inflate jl_costs. */
class JlAliCostsComparisonRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL jl_ali_costs_comparison.sql: XXHASH64 buckets, dual theta tariff " +
       "join, cheapest-channel row_number, bound sentinels, share rollup") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/logistics/dashboards/consolidation/jl_ali_costs_comparison.sql"))
    val ctx = freshCtx()

    // parcels: A1+A2 collapse (ROUND to 10.00), B dangerous, C jl-uncovered
    ctx.warehouse.createTable("parcels_for_price_comparison", Seq(
      ("2024-03-01", true, 1.0, Seq(0), "DE", 10.000, 100.0),
      ("2024-03-01", true, 1.0, Seq(0), "DE", 10.004, 50.0),
      ("2024-03-01", true, 2.0, Seq(1), "DE", 20.000, 200.0),
      ("2024-03-01", true, 5.0, Seq(0), "DE", 10.000, 77.0))
      .toDF("pd", "is_last_week", "weight", "dangerous_kinds", "country",
        "merchant_sale_price", "gmv_initial")
      .selectExpr("CAST(pd AS DATE) AS partition_date", "is_last_week", "weight",
        "dangerous_kinds", "country", "merchant_sale_price", "gmv_initial"))

    // ali grid: a1/a2 both hit bucket A (row_number keeps a1's 3.0),
    // a3 hits dangerous bucket B, a4 hits bucket C
    ctx.warehouse.createTable("ali_tariffs", Seq(
      ("2024-03-01", "DE", 0.5, 1.5, "non_dangerous", 0.0, 100.0, 1.0, 2.0),
      ("2024-03-01", "DE", 0.5, 1.5, "non_dangerous", 0.0, 100.0, 2.0, 2.0),
      ("2024-03-01", "DE", 1.5, 3.0, "dangerous", 0.0, 100.0, 3.0, 1.0),
      ("2024-03-01", "DE", 4.0, 6.0, "non_dangerous", 0.0, 100.0, 1.0, 1.0))
      .toDF("pd", "country", "min_weight", "max_weight", "dangerous_type",
        "min_price", "max_price", "per_item", "per_kg")
      .selectExpr("CAST(pd AS DATE) AS partition_date", "country", "min_weight",
        "max_weight", "dangerous_type", "min_price", "max_price", "per_item", "per_kg"))

    // jl grid: j1 NRM covers bucket A, j2 EXP covers dangerous bucket B
    // ([1] ⊆ [0,1]), nothing covers weight 5 (bucket C starves)
    ctx.warehouse.createTable("jl_tariffs", Seq(
      ("2024-03-01", "DE", "ch1", "NRM", 0.5, 1.5, Seq(0), 2.0, 1.0),
      ("2024-03-01", "DE", "ch2", "EXP", 1.5, 3.0, Seq(0, 1), 4.0, 0.5))
      .toDF("pd", "country", "channel_id", "shipping_type", "min_weight",
        "max_weight", "dangerous_kinds", "per_item", "per_kg")
      .selectExpr("CAST(pd AS DATE) AS partition_date", "country", "channel_id",
        "shipping_type", "min_weight", "max_weight", "dangerous_kinds",
        "per_item", "per_kg"))

    // mongo bounds: CN row explodes to NRM (min 5, max 50 — millionths) and
    // EXP (min ignored as non-NRM, max=0 → 9999); US row must be filtered
    ctx.sources.register("mongo", "logistics_jl_obligatory_channels_daily_snapshot")(s => s.sql(
      """SELECT CAST(NULL AS TIMESTAMP) AS starttime, CAST(NULL AS TIMESTAMP) AS endtime,
        |  'DE' AS destinationcountry, 'CN' AS sourcecountry,
        |  named_struct('currency', 'USD', 'bounds', array(
        |    named_struct('shippingtype', 'NRM', 'min', 5000000L, 'max', 50000000L),
        |    named_struct('shippingtype', 'EXP', 'min', 2000000L, 'max', 0L))) AS shippingtypebounds
        |UNION ALL
        |SELECT CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP), 'DE', 'US',
        |  named_struct('currency', 'USD', 'bounds', array(
        |    named_struct('shippingtype', 'NRM', 'min', 0L, 'max', 90000000L),
        |    named_struct('shippingtype', 'EXP', 'min', 0L, 'max', 0L)))""".stripMargin))

    val model = SqlTemplater.sqlModelAuto("jl_ali_costs_comparison", sql)
    assert(model.materialization == Materialization.IncrementalInsertOverwrite(Nil),
      model.materialization.toString)
    assert(model.fileFormat == "delta")
    assert(model.deps.toSet == Set("parcels_for_price_comparison", "jl_tariffs",
      "ali_tariffs"))

    for ((n, st) <- new DagRunner(Seq(model)).run(ctx,
        selectors = Seq("jl_ali_costs_comparison")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    def check(): Unit = {
      val out = ctx.ref("jl_ali_costs_comparison")
      val rows = out.selectExpr("CAST(partition_date AS STRING)", "is_last_week",
        "country", "jl_costs", "ali_costs", "gmv_initial",
        "jl_costs_share", "ali_costs_share", "jl_ali_costs_share")
        .as[(String, Boolean, String, Double, Double, Double, Double, Double, Double)]
        .collect().toSeq
      // bucket A: ali 3.0×2 parcels=6, jl (2+1·1)=3.0×2=6
      // bucket B: ali (3+1·2)=5×1=5, jl (4+.5·2)=5×1=5
      // bucket C: dropped (no jl price) — gmv 77 excluded
      // totals: jl 11, ali 11, gmv 150+200=350; shares ROUND(11/350,3)=0.031
      assert(rows == Seq(("2024-03-01", true, "DE", 11.0, 11.0, 350.0,
        0.031, 0.031, 1.0)), rows.toString)
    }
    check()

    // insert_overwrite second run (no partition_by → full replace): the
    // incremental path must land the identical result, not a duplicate
    for ((n, st) <- new DagRunner(Seq(model)).run(ctx,
        selectors = Seq("jl_ali_costs_comparison")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")
    check()
  }
}
