package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

/** Pins `AsOfJoin.auto`'s STATS arm with genuine dispatch — no forced
  * `mode=on`, no zeroed floor. Every prior fixture drove the salted path by
  * overriding the decision; here Catalyst's own `optimizedPlan.stats
  * .sizeInBytes` estimate of a real input is what crosses (or doesn't cross)
  * a small-but-nonzero floor, so a regression inside the
  * `sz(left)+sz(right) >= minBytesForDetect` comparison — an estimate that
  * degenerates to Long.MaxValue and flips every small query onto the detect
  * pass, a unit slip, a swapped comparison — fails HERE instead of passing
  * every output-equivalence gate (the two paths are output-identical by
  * design, so only a plan-shape assertion can see the dispatch).
  *
  * Path discriminator (same as AsOfPlanShapeSpec): the salted plan's main
  * window partitions by (k, __c); the plain backward plan has exactly one
  * window and no __c anywhere.
  */
class AsOfAutoDispatchSpec extends SparkSpec {

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def chunkedWindows(df: DataFrame): Int =
    finalPlan(df.queryExecution.executedPlan).collect {
      case w: WindowExec if w.partitionSpec.exists(_.toString.contains("__c")) => w
    }.size

  // ~20k × ~70-byte rows: big enough that Catalyst's estimate sits solidly
  // in the 100 KB..100 MB band, small enough to run in seconds
  private def mk(n: Long, keyMod: Int): (DataFrame, DataFrame) = {
    val left = spark.range(0, n).select(
      when(col("id") % 4 === 0, lit("hot"))
        .otherwise(concat(lit("key_"), col("id") % keyMod)).as("k"),
      col("id").as("t"),
      concat(lit("leftval_padding_padding_"), col("id")).as("lv"))
    val right = spark.range(0, n / 5).select(
      when(col("id") % 4 === 0, lit("hot"))
        .otherwise(concat(lit("key_"), col("id") % keyMod)).as("k"),
      (col("id") * 5).as("t"),
      concat(lit("rightval_padding_padding_"), col("id")).as("rv"))
    (left, right)
  }

  private def statsBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  test("Catalyst's size estimate for the fixture is sane (not degenerate)") {
    val (left, right) = mk(20000, 97)
    val sz = statsBytes(left) + statsBytes(right)
    // a Long.MaxValue degeneration (or a KB/MB unit slip in either
    // direction) lands far outside this band and fails loudly here
    assert(sz > BigInt(100L << 10) && sz < BigInt(100L << 20),
      s"combined estimate $sz outside the 100KB..100MB sanity band — " +
        "auto's dispatch comparison is operating on garbage stats")
  }

  test("auto above the floor: genuine stats (not a forced mode) pick salted") {
    val (left, right) = mk(20000, 97)
    // floor = 64 KB, well below the fixture's real estimate; mode stays the
    // default "auto", so ONLY the sz(left)+sz(right) >= floor comparison
    // can route to the salted plan
    val out = AsOfJoin.auto(left, right, Seq("k"), "t", "t",
      splits = 8, hotThreshold = 100L, detectSample = 1.0,
      minBytesForDetect = 64L << 10)
    assert(out.count() == 20000)
    assert(chunkedWindows(out) == 1,
      "stats above the floor must dispatch the salted (chunked-window) plan")
  }

  test("auto below the floor: same input, default 1 GiB floor picks plain") {
    val (left, right) = mk(20000, 97)
    val out = AsOfJoin.auto(left, right, Seq("k"), "t", "t",
      splits = 8, hotThreshold = 100L, detectSample = 1.0) // default floor
    assert(out.count() == 20000)
    assert(chunkedWindows(out) == 0,
      "stats below the 1 GiB floor must dispatch the plain backward plan")
    val windows = finalPlan(out.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.size == 1,
      s"plain backward must plan exactly 1 window, got ${windows.size}")
  }
}
