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

  /** Read one named table from an sf directory (e.g. /root/testdata/sf0.01).
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads as a
    * raw nanos BIGINT (requires `spark.sql.legacy.parquet.nanosAsLong=true`,
    * set in Verify/Bench/test sessions). We expose both:
    *   - `ts`:     TimestampType, floor-truncated to micros (`ts_ns div 1000`
    *     — integer division; double division would lose precision at 1e18ns)
    *   - `ts_ns`:  the raw nanos long, for exact-order parity with engines
    *     that keep nanosecond precision.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts_ns div 1000)"))
    else df
  }

  /** Register every table as a temp view so spark.sql(...) models resolve. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
