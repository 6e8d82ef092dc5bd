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
    * `events` is normalized via [[normalizeEvents]] so every consumer sees
    * the same (`ts`: TimestampType, `ts_ns`: nanos BIGINT) pair regardless
    * of how the driver generated the file. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  /** Normalize the events table's `ts` column, adaptively by physical type:
    *
    *   - parquet TIMESTAMP(NANOS): Spark reads it as a raw nanos BIGINT
    *     (requires `spark.sql.legacy.parquet.nanosAsLong=true`, set in
    *     Verify/Bench/test sessions). `ts` = micros floor-truncation
    *     (`div 1000` integer division — double division would lose
    *     precision at 1e18 ns); `ts_ns` = the raw long.
    *   - parquet TIMESTAMP(MICROS) (NTZ or not): read natively. `ts` =
    *     cast to TimestampType (identity under the pinned UTC session
    *     timezone); `ts_ns` = `unix_micros(ts) * 1000`, matching DuckDB's
    *     `epoch_ns(ts)` on the same file — the oracle contract.
    *
    * Works on batch and streaming DataFrames alike (pure column ops). */
  def normalizeEvents(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      case _ =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
    }
  }

  /** Register every table as a temp view so spark.sql(...) models resolve. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
