package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational core: aggregation over the fact table.
  *
  * Exercises the reference's ubiquitous groupBy/SUM/AVG/COUNT shape
  * (reference: macros/gold_active_users_and_devices_with_ephemeral.sql:66-75).
  *
  * Oracle-parity note: money columns (2-decimal doubles) are summed as
  * DECIMAL(18,2) so Spark and DuckDB produce bit-identical results regardless
  * of floating-point accumulation order, then cast back to DOUBLE for a stable
  * comparable output type. Ratios are rounded.
  */
object CoreQueries {

  private def dec(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(18,2)"))

  /** TPC-H Q1-style pricing summary. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dec(col("l_quantity")).cast("double").as("sum_qty"),
        dec(col("l_extendedprice")).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(22,6)"))
          .cast("double").as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1OracleSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
      |  ROUND(AVG(l_quantity), 6) AS avg_qty,
      |  ROUND(AVG(l_discount), 6) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin
}
