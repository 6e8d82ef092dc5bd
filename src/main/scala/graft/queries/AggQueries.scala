package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Aggregate operators from SURVEY.md §2.4: GROUPING SETS, multi-DISTINCT,
  * MAX_BY/MIN_BY, COUNT_IF, STDDEV, exact PERCENTILE, HAVING. */
object AggQueries {

  /** GROUPING SETS incl. grand total (reference: models/spark/search/
    * success_by_relevance/search_success_aggregated.sql:51-59). Runs through
    * spark.sql — grouping sets are SQL-only surface, like the reference's. */
  def q12GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT COALESCE(l_returnflag, 'ALL') AS return_flag,
        |  COALESCE(l_linestatus, 'ALL') AS line_status,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)
  }

  val q12Oracle: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS return_flag,
      |  COALESCE(l_linestatus, 'ALL') AS line_status,
      |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin

  /** ROLLUP + CUBE (engine extension — the reference stops at GROUPING SETS,
    * SURVEY.md §2.4 "No native CUBE/ROLLUP"; both engines support them). */
  def q55RollupCube(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    o.rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
  }

  val q55Oracle: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  /** Multi COUNT(DISTINCT) (reference: models/spark/search/success_by_relevance/
    * search_success_aggregated.sql:26-27) + HAVING (tests/spark/b2b_mart/
    * procurement_order_id_duplicates_check.sql:4). */
  def q13DistinctAggs(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("n_days"),
        count(lit(1)).as("n_orders"))
      .where(col("n_orders") > 10)
  }

  val q13Oracle: String =
    """SELECT o_orderpriority,
      |  COUNT(DISTINCT o_custkey) AS n_customers,
      |  COUNT(DISTINCT strftime(o_orderdate, '%Y-%m-%d')) AS n_days,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY 1 HAVING COUNT(*) > 10""".stripMargin

  /** MAX_BY / MIN_BY argmax over a composite unique key (reference:
    * models/spark/onfy/onfy_sessions.sql:168-169 — made tie-stable by folding
    * the 2-decimal balance and the unique custkey into one integer key). */
  def q14ArgMinMax(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    val key = (round(col("c_acctbal") * 100).cast("long") * 10000000L + col("c_custkey"))
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        max_by(col("c_custkey"), key).as("richest_cust"),
        max(col("c_acctbal")).as("max_bal"),
        min_by(col("c_custkey"), key).as("poorest_cust"),
        min(col("c_acctbal")).as("min_bal"),
        count(lit(1)).as("n_customers"))
  }

  val q14Oracle: String =
    """SELECT n_name,
      |  arg_max(c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey) AS richest_cust,
      |  MAX(c_acctbal) AS max_bal,
      |  arg_min(c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey) AS poorest_cust,
      |  MIN(c_acctbal) AS min_bal,
      |  COUNT(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1""".stripMargin

  /** COUNT_IF + STDDEV + exact PERCENTILE (reference: .../search_success_aggregated.sql:47-48,
    * models/spark/onfy/onfy_marketing_channel_popular_competitors_new.sql:132-135). */
  def q15Stats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        count_if(col("l_discount") > 0.05).as("n_discounted"),
        round(stddev(col("l_quantity")), 6).as("sd_qty"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
        count(lit(1)).as("n"))
  }

  val q15Oracle: String =
    """SELECT l_returnflag,
      |  CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
      |  ROUND(stddev(l_quantity), 6) AS sd_qty,
      |  ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
      |  ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY 1""".stripMargin

  /** PIVOT — wide conditional aggregation (engine extension; the reference
    * hand-writes SUM(CASE WHEN ...) columns for the same shape, which is
    * exactly what the oracle states): monthly revenue per order status. */
  def q69Pivot(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    o.groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
  }

  val q69Oracle: String =
    """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "O",
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "P"
      |FROM orders GROUP BY 1""".stripMargin
}
