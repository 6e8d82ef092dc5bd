package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source registry over the driver-provided parquet test tables.
  *
  * Mirrors the reference's `{{ source('schema','table') }}` resolution
  * (reference: models/spark/sources.yml:1-211) — a name → relation lookup —
  * but Spark-native: each table is a lazily-planned parquet scan, so Catalyst
  * predicate pushdown / column pruning reach the file scan directly.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one named table from an sf directory (e.g. /root/testdata/sf0.01). */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so spark.sql(...) models resolve. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
