package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.SparkPlan
import graft.ops.AsOfJoin

/** Structural pin for the salted as-of join's scale claim: ONE shuffle +
  * ONE window on the big side, zero post-window joins. The scaladoc makes
  * the claim; this spec makes a regression in it fail `sbt test` instead
  * of waiting for a probe read (same philosophy as PlanPinSpec).
  */
class AsOfPlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  test("backwardSalted executed plan: exactly 2 windows, the big union crosses " +
    "ONE exchange into the chunked window, no BNLJ/cartesian") {
    val left = spark.range(0, 2000).select(
      when(col("id") % 4 === 0, lit("hot")).otherwise(concat(lit("k"), col("id") % 97)).as("k"),
      col("id").as("t"), (col("id") * 3).as("lv"))
    val right = spark.range(0, 400).select(
      when(col("id") % 4 === 0, lit("hot")).otherwise(concat(lit("k"), col("id") % 97)).as("k"),
      (col("id") * 5).as("t"), (col("id") + 7).as("rv"))
    val out = AsOfJoin.backwardSalted(left, right, Seq("k"), "t", "t",
      splits = 8, hotThreshold = 100L, detectSample = 1.0)
    assert(out.count() == 2000) // force execution so AQE finalizes

    val plan = finalPlan(out.queryExecution.executedPlan)
    val s = plan.toString
    assert(!s.contains("CartesianProduct"), "cartesian product in salted plan")
    assert(!s.contains("BroadcastNestedLoop"), "BNLJ in salted plan")

    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.size == 2,
      s"expected 2 windows (chunked main + tiny carry), got ${windows.size}:\n$s")

    // the MAIN window partitions by (k, __c); the carry window by k only
    val main = windows.filter(_.partitionSpec.exists(_.toString.contains("__c")))
    assert(main.size == 1, s"main (k, __c) window not found:\n$s")

    // walk down from the main window: the first exchange is THE one big
    // shuffle; below it sits the union of (chunked input ++ seeds) and no
    // further exchange may touch the big branch (the one whose leaves are
    // the range scans of left+right). The seeds branch legitimately has its
    // own tiny exchanges (rTails agg, carry window) — they sit under the
    // union, inside the carry subtree only.
    def firstExchanges(p: SparkPlan): Seq[SparkPlan] = p match {
      case e: ShuffleExchangeLike => Seq(e)
      case other => other.children.flatMap(firstExchanges)
    }
    val topExchanges = main.head.children.flatMap(firstExchanges)
    assert(topExchanges.size == 1,
      s"main window must be fed by exactly ONE exchange, got ${topExchanges.size}:\n$s")

    // big-branch purity: under that exchange find the union; the branch
    // containing the LEFT input's scan must contain no further exchange
    val union = topExchanges.head.collectFirst {
      case u if u.nodeName.contains("Union") => u }
    assert(union.isDefined, s"no union under the big exchange:\n$s")
    val bigBranches = union.get.children.filter(_.collectLeaves().exists(
      _.toString.contains("Range")))
    assert(bigBranches.nonEmpty, s"no range-scan branch under the union:\n$s")
    val mainInputBranches = bigBranches.filterNot(b =>
      b.exists { case _: ShuffleExchangeLike => true; case _ => false })
    assert(mainInputBranches.nonEmpty,
      s"every big branch crosses an extra exchange before the window:\n$s")
  }

  test("backward (unsalted) executed plan: 1 window, 1 exchange, no joins at all") {
    val left = Seq(("a", 1L, "x"), ("b", 2L, "y")).toDF("k", "t", "lv")
    val right = Seq(("a", 1L, "r")).toDF("k", "t", "rv")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t")
    assert(out.count() == 2)
    val plan = finalPlan(out.queryExecution.executedPlan)
    val windows = plan.collect { case w: WindowExec => w }
    val exchanges = plan.collect { case e: ShuffleExchangeLike => e }
    assert(windows.size == 1 && exchanges.size == 1,
      s"backward must be 1 window + 1 exchange, got ${windows.size}/${exchanges.size}:\n$plan")
    assert(!plan.toString.contains("Join"), s"backward must plan no join:\n$plan")
  }
}
