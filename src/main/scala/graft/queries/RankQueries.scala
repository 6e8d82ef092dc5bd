package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** RANK / DENSE_RANK / ANY_VALUE / FIRST-LAST-as-GROUP-BY-aggregate — the four
  * §2.4/§2.5 operators the reference leans on that previous rounds routed
  * around (reference: RANK in models/spark/onfy/conversion_funnel_new.sql:246
  * `RANK() OVER (PARTITION BY device_id, payment_dt ORDER BY session_start)`;
  * FIRST_VALUE-as-aggregate in models/spark/base/active_devices.sql:24-43;
  * ANY_VALUE in models/spark/category_management/merchant_prices/
  * new_pp_prices_history.sql:20).
  *
  * Determinism note (the reason these were deferred): Spark's FIRST/LAST
  * aggregates take whatever per-partition row order the plan delivers. The
  * engine form pins it the way the reference's own models do implicitly —
  * co-locate the group on one partition (`repartition(key)`) and sort within
  * it (`sortWithinPartitions`), so the partial aggregate consumes rows in
  * event order and `ignoreNulls` picks the first/last non-null by that order.
  * Catalyst's EliminateSorts keeps the sort because FIRST/LAST are
  * order-sensitive aggregates.
  */
object RankQueries {

  /** Per-user funnel attributes (FIRST/LAST purchase value ignoring nulls,
    * ANY_VALUE cohort) then cohort-level RANK + DENSE_RANK by activity.
    * Ties are real (many users share an event count), which is exactly what
    * distinguishes RANK/DENSE_RANK from ROW_NUMBER — and tied ranks are
    * order-independent, so the result stays hash-deterministic. */
  def q58FunnelRanking(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val perUser = e
      .select(col("user_id"), col("ts_ns"),
        when(col("event_type") === "purchase", col("value")).as("purchase_value"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_ns"))
      .groupBy(col("user_id"))
      .agg(
        first(col("purchase_value"), ignoreNulls = true).as("first_purchase_value"),
        last(col("purchase_value"), ignoreNulls = true).as("last_purchase_value"),
        any_value(col("user_id") % 10).as("cohort"),
        count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("n_events").desc)
    perUser.select(col("user_id"), col("cohort"), col("n_events"),
      col("first_purchase_value"), col("last_purchase_value"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"))
  }

  val q58Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_ns(ts) AS tns,
      |    CASE WHEN event_type = 'purchase' THEN value END AS pv
      |  FROM events),
      |pu AS (
      |  SELECT user_id,
      |    first(pv ORDER BY tns) FILTER (WHERE pv IS NOT NULL) AS first_purchase_value,
      |    last(pv ORDER BY tns) FILTER (WHERE pv IS NOT NULL) AS last_purchase_value,
      |    any_value(user_id % 10) AS cohort,
      |    COUNT(*) AS n_events
      |  FROM ev GROUP BY 1)
      |SELECT user_id, cohort, n_events, first_purchase_value, last_purchase_value,
      |  CAST(rank() OVER (PARTITION BY cohort ORDER BY n_events DESC) AS INT) AS rnk,
      |  CAST(dense_rank() OVER (PARTITION BY cohort ORDER BY n_events DESC) AS INT) AS drnk
      |FROM pu""".stripMargin
}
