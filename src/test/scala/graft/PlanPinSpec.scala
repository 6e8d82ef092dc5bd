package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Plan regression pins for the five most expensive wall-time queries
  * (r13 bench: q72 8.97 s, q74 8.02 s, q62 4.17 s, q30 3.86 s, q76 merge).
  * These are full pipeline runs (DagRunner double-runs + warehouse writes),
  * so asserting on the RETURNED DataFrame would only pin the final parquet
  * read — instead a QueryExecutionListener captures EVERY physical plan the
  * pipeline executes (model builds, incremental rewrites, dup tests, sinks)
  * and the pins hold over all of them:
  *   - no CartesianProduct anywhere, and no BroadcastNestedLoopJoin beyond
  *     a per-query budget (0 for all but q72, whose single BNLJ broadcasts
  *     a constant 27-row generated quarter dim — the O(n²) failure modes
  *     at 100 TB are out, the constant-broadcast range-join archetype stays);
  *   - at least the adjudicated number of BroadcastHashJoins (a future
  *     change that silently demotes a dim join to sort-merge fails here);
  *   - a per-job hash-exchange budget (a plan regression that inserts extra
  *     shuffles fails here before it costs a bench read).
  * Bounds are measured at sf0.001 with headroom of +1 exchange over the
  * adjudicated plans; the exchange count is per executed job, so pipeline
  * restructurings that only add/remove small jobs don't move it.
  */
class PlanPinSpec extends SparkSpec {

  /** Every physical plan executed while `f` runs. Listener delivery is
    * async, so wait until the capture count goes quiet before returning. */
  private def plansDuring(f: => Unit): Seq[String] = {
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        buf.synchronized { buf += qe.executedPlan.toString }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
        buf.synchronized { buf += qe.executedPlan.toString }
    }
    spark.listenerManager.register(l)
    try {
      f
      var last = -1; var stable = 0
      while (stable < 3) { // quiet = 3 consecutive 200 ms windows, no new plans
        Thread.sleep(200)
        val n = buf.synchronized(buf.size)
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      buf.synchronized(buf.toList)
    } finally spark.listenerManager.unregister(l)
  }

  // under AQE the rendered string carries the FINAL plan followed by an
  // "== Initial Plan ==" section; count only the final (executed) section so
  // the budgets measure real shuffles, not the pre-AQE draft
  private def finalSection(p: String): String = p.split("== Initial Plan ==").head
  private def exchanges(p: String): Int =
    finalSection(p).linesIterator.count(_.contains("Exchange hashpartitioning"))
  private def broadcasts(p: String): Int =
    finalSection(p).linesIterator.count(_.contains("BroadcastHashJoin"))

  private def bnljs(p: String): Int =
    finalSection(p).linesIterator.count(_.contains("BroadcastNestedLoopJoin"))

  private def pin(name: String, maxExchangesPerJob: Int, minBroadcastJoins: Int,
                  maxBnljPerJob: Int = 0): Unit =
    test(s"$name: no cartesian; ≤$maxBnljPerJob BNLJ/job; " +
      s"≥$minBroadcastJoins broadcast joins; ≤$maxExchangesPerJob exchanges/job") {
      val plans = plansDuring {
        SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      }
      assert(plans.nonEmpty, "listener captured no executed plans")
      for (p <- plans)
        assert(!p.contains("CartesianProduct"), s"CartesianProduct in a $name job:\n$p")
      val maxBnlj = plans.map(bnljs).max
      val maxEx = plans.map(exchanges).max
      val bc = plans.map(broadcasts).sum
      info(s"$name: ${plans.size} jobs, max exchanges/job=$maxEx, " +
        s"broadcast joins=$bc, max BNLJ/job=$maxBnlj")
      assert(maxBnlj <= maxBnljPerJob,
        s"$name worst job has $maxBnlj BroadcastNestedLoopJoins " +
          s"(budget $maxBnljPerJob — only constant-size generated dims may BNLJ):\n" +
          plans.maxBy(bnljs))
      assert(maxEx <= maxExchangesPerJob,
        s"$name worst job has $maxEx hash exchanges (budget $maxExchangesPerJob):\n" +
          plans.maxBy(exchanges))
      assert(bc >= minBroadcastJoins,
        s"$name executed only $bc BroadcastHashJoins (expected ≥$minBroadcastJoins) — " +
          "a dim join was demoted to sort-merge/shuffle")
    }

  private def sortAggs(p: String): Int =
    finalSection(p).linesIterator.count(_.contains("SortAggregate"))

  /** r18: pin the immutable-buffer fixes (MIN_BY/MAX_BY/MIN over strings →
    * int-encoded) — a regression that reintroduces a string aggregate buffer
    * falls back to SortAggregate and fails here before it costs a bench sort. */
  private def pinSortAgg(name: String, maxSortAggPerJob: Int): Unit =
    test(s"$name: ≤$maxSortAggPerJob SortAggregates/job") {
      val plans = plansDuring {
        SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      }
      assert(plans.nonEmpty, "listener captured no executed plans")
      val worst = plans.map(sortAggs).max
      info(s"$name: ${plans.size} jobs, max SortAggregates/job=$worst")
      assert(worst <= maxSortAggPerJob,
        s"$name worst job has $worst SortAggregates (budget $maxSortAggPerJob):\n" +
          plans.maxBy(sortAggs))
    }

  // budgets: measured at sf0.001 (see info lines) + headroom of 1-2
  pin("q30_gold_orders_pipeline", maxExchangesPerJob = 3, minBroadcastJoins = 4)
  pin("q62_append_overwrite", maxExchangesPerJob = 5, minBroadcastJoins = 1)
  // q72's single BNLJ/job is the promo_periods validity-range join — the
  // build side is a GENERATED 27-row quarter sequence (the reference's
  // validity-period range-join archetype, gold_orders.sql:390-400), a
  // constant-size broadcast at any data scale; a SECOND BNLJ fails the pin
  pin("q72_orders_wide", maxExchangesPerJob = 14, minBroadcastJoins = 4,
    maxBnljPerJob = 1)
  pin("q74_campaign_funnels", maxExchangesPerJob = 25, minBroadcastJoins = 15)
  pin("q76_incremental_merge", maxExchangesPerJob = 4, minBroadcastJoins = 6)

  // r18 immutable-buffer pins: q73/q53/q60/q80 staging aggregates and q72's
  // lineitem_agg must stay hash-based; q74 keeps exactly the tiny
  // MIN(manufacturer) dict pair (partial+final over ≤100 rows, deliberate)
  pinSortAgg("q73_scd2_bucketed", maxSortAggPerJob = 0)
  pinSortAgg("q53_scd2_pipeline", maxSortAggPerJob = 0)
  pinSortAgg("q60_scd2_check", maxSortAggPerJob = 0)
  pinSortAgg("q80_snapshot_file", maxSortAggPerJob = 0)
  pinSortAgg("q72_orders_wide", maxSortAggPerJob = 0)
  pinSortAgg("q74_campaign_funnels", maxSortAggPerJob = 2)
}
