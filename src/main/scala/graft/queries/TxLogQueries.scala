package graft.queries

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.plans.TxLog

/** Oracle-gated exercise of the [[graft.plans.TxLog]] table format — the
  * self-contained Delta-log stand-in (reference materializes 197 models on
  * Delta: macros/spark_adapter_patch/create_table.sql:29-34).
  *
  * The pipeline commits three versions of an orders table partitioned by
  * month — v0 full overwrite of pre-1996 data, v1 append of the rest, v2
  * dynamic-partition overwrite that re-publishes the 1997 months with
  * non-urgent orders only — then reads BOTH the live snapshot and the
  * time-travel v0 snapshot from the log's file manifests (no directory
  * listing) and aggregates. The DuckDB oracle reproduces the exact
  * commit-by-commit semantics, including the subtlety that a dynamic
  * partition overwrite only replaces partitions PRESENT in the incoming
  * frame. */
object TxLogQueries {

  def q81TxLogPipeline(spark: SparkSession, dir: String): DataFrame = {
    val table = Paths.get(graft.runtime.TempDirs.create("graft_txlog")).resolve("orders_log")
    val base = Tables(spark, dir, "orders")
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"),
        col("o_orderdate"), col("order_month"))

    // r17 (guide §6): cluster each commit by the partition column — the
    // reference's DISTRIBUTE BY discipline, same as Warehouse writes. An
    // unclustered partitioned write commits tasks × months files (one
    // sub-8KB sliver per task-month pair at sf0.1), and both snapshot reads
    // below then pay the per-file open cost. Same rows, same commit
    // semantics — only the file layout changes.
    // r18: explicit partition count (the conf-driven shuffle-partition knob)
    // — without it AQE coalesces each commit's exchange to 1-2 tasks, which
    // then create every month directory's file serially (see
    // Warehouse.writeParallelism for the full Profile evidence).
    val writeN = spark.sessionState.conf.numShufflePartitions
    // v0: create with history data
    TxLog.overwrite(table,
      base.filter(col("o_orderdate") < to_date(lit("1996-01-01")))
        .repartition(writeN, col("order_month")), Seq("order_month"))
    // v1: append the rest (schema + partitioning carried from the log meta)
    TxLog.append(table, base.filter(col("o_orderdate") >= to_date(lit("1996-01-01")))
      .repartition(writeN, col("order_month")))
    // v2: atomically re-publish the 1997 months without urgent orders
    TxLog.overwritePartitions(table,
      base.filter(col("order_month").startsWith("1997") &&
        col("o_orderpriority") =!= "1-URGENT")
        .repartition(writeN, col("order_month")),
      Seq("order_month"))

    val live = TxLog.read(spark, table)
      .groupBy(col("order_month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"))
    val v0 = TxLog.read(spark, table, asOf = 0L)
      .groupBy(col("order_month")).agg(count(lit(1)).as("n_orders_v0"))
    live.join(v0, Seq("order_month"), "left")
      .select(col("order_month"), col("n_orders"), col("total_price"),
        coalesce(col("n_orders_v0"), lit(0L)).as("n_orders_v0"))
  }

  val q81Oracle: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_totalprice, o_orderpriority, o_orderdate,
      |         strftime(o_orderdate, '%Y-%m') AS order_month
      |  FROM orders
      |),
      |v0 AS (SELECT * FROM base WHERE o_orderdate < DATE '1996-01-01'),
      |replaced AS (
      |  SELECT * FROM base
      |  WHERE order_month LIKE '1997%' AND o_orderpriority <> '1-URGENT'
      |),
      |touched AS (SELECT DISTINCT order_month FROM replaced),
      |final AS (
      |  SELECT * FROM base WHERE order_month NOT IN (SELECT order_month FROM touched)
      |  UNION ALL
      |  SELECT * FROM replaced
      |)
      |SELECT f.order_month,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |  COALESCE(MAX(v.n), 0) AS n_orders_v0
      |FROM final f
      |LEFT JOIN (SELECT order_month, COUNT(*) AS n FROM v0 GROUP BY 1) v
      |  ON f.order_month = v.order_month
      |GROUP BY f.order_month""".stripMargin
}
