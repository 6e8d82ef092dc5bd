package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.runtime._

/** incremental_strategy='merge' on the oracle gate — the upsert semantics
  * behind the reference's 197 delta-format models (reference:
  * macros/spark_adapter_patch/create_table.sql:29-34 delta `create or
  * replace`; dbt-spark emits `MERGE INTO … WHEN MATCHED UPDATE SET * WHEN NOT
  * MATCHED INSERT *` for delta + unique_key), served parquet-native by
  * [[graft.runtime.Warehouse.mergeUpsert]]'s partition-pruned rewrite.
  *
  * Scenario (the standard late-arriving-facts shape): run 1 materializes
  * per-customer order profiles from history before a cutoff; run 2 recomputes
  * the profile ONLY for customers with activity at/after the cutoff and
  * merges on customer_id. The closed form the oracle states: customers with
  * post-cutoff activity carry the full-range profile (matched → updated, or
  * brand-new → inserted), everyone else keeps the pre-cutoff row untouched.
  */
object MergeQueries {

  def q76IncrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    val whDir = java.nio.file.Files.createTempDirectory("graft_merge").toString
    val ctx = Ctx(spark, new Warehouse(spark, whDir), SourceRegistry.overDir(spark, dir))
    val cutoff = "1998-01-01"
    val model = Model("customer_profile_merge",
      c => {
        val orders = c.source("default", "orders")
        val cust = c.source("default", "customer")
        def profile(of: DataFrame): DataFrame =
          of.groupBy(col("o_custkey").as("customer_id"))
            .agg(count(lit(1)).as("order_count"),
              max(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("last_order_date"))
            .join(broadcast(cust), col("customer_id") === col("c_custkey"), "left")
            .select(col("customer_id"),
              coalesce(col("c_mktsegment"), lit("Other")).as("mkt_segment"),
              col("order_count"), col("last_order_date"))
        if (!c.isIncremental) profile(orders.filter(col("o_orderdate") < lit(cutoff)))
        else {
          // key probe first: recompute full history only for changed keys —
          // the increment stays small relative to the table, which is what
          // makes merge's partition-pruned rewrite pay off at 100 TB
          val changed = orders.filter(col("o_orderdate") >= lit(cutoff))
            .select(col("o_custkey")).distinct()
          profile(orders.join(changed, Seq("o_custkey"), "left_semi"))
        }
      },
      Materialization.IncrementalMerge(Seq("customer_id"), Seq("mkt_segment")))
    val dag = new DagRunner(Seq(model))
    val rs = dag.run(ctx) ++ dag.run(ctx)
    rs.collect { case (n, RunStatus.Failed(e)) =>
      throw new RuntimeException(s"model $n failed: $e") }
    ctx.ref("customer_profile_merge")
  }

  val q76Oracle: String =
    """WITH pre AS (
      |  SELECT o_custkey AS customer_id, COUNT(*) AS order_count,
      |    MAX(strftime(o_orderdate, '%Y-%m-%d')) AS last_order_date
      |  FROM orders WHERE o_orderdate < DATE '1998-01-01' GROUP BY 1),
      |changed AS (
      |  SELECT DISTINCT o_custkey AS customer_id
      |  FROM orders WHERE o_orderdate >= DATE '1998-01-01'),
      |fullr AS (
      |  SELECT o_custkey AS customer_id, COUNT(*) AS order_count,
      |    MAX(strftime(o_orderdate, '%Y-%m-%d')) AS last_order_date
      |  FROM orders GROUP BY 1),
      |merged AS (
      |  SELECT * FROM fullr WHERE customer_id IN (SELECT customer_id FROM changed)
      |  UNION ALL
      |  SELECT * FROM pre WHERE customer_id NOT IN (SELECT customer_id FROM changed))
      |SELECT m.customer_id,
      |  COALESCE(c.c_mktsegment, 'Other') AS mkt_segment,
      |  m.order_count, m.last_order_date
      |FROM merged m LEFT JOIN customer c ON m.customer_id = c.c_custkey""".stripMargin
}
