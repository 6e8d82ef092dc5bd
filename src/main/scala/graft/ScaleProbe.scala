package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe: replicate the sf0.1 tables ~20× into /tmp (12M lineitem
  * rows) with shifted keys, re-run headline query shapes, and compare
  * per-row throughput against sf0.1 — checks that the plans scale linearly
  * (no accidental quadratic joins / driver collects) before the real 100TB
  * claim. Usage: runMain graft.ScaleProbe [factor]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val big = "/tmp/graft_scale"

    def replicate(name: String, keyCols: Seq[String], keySpan: Long): Unit = {
      val base = Tables(spark, src, name)
      val out = (0 until factor).map { i =>
        keyCols.foldLeft(base)((df, k) => df.withColumn(k, col(k) + lit(i * keySpan)))
      }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$big/$name.parquet")
    }
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    replicate("lineitem", Seq("l_orderkey"), 10000000L)
    replicate("orders", Seq("o_orderkey", "o_custkey"), 10000000L)
    replicate("customer", Seq("c_custkey"), 10000000L)
    println(s"replicated x$factor")

    def q1(dir: String) = queries.CoreQueries.q1PricingSummary(spark, dir).count()
    def q3(dir: String) = queries.JoinQueries.q3RevenueByRegionMonth(spark, dir).count()
    def q2(dir: String) = queries.WindowQueries.q2LatestOrderPerCustomer(spark, dir).count()

    // nation/region not replicated: copy through for the join chain
    for (t <- Seq("nation", "region", "part", "supplier", "events", "documents", "embeddings"))
      Tables(spark, src, t).write.mode("overwrite").parquet(s"$big/$t.parquet")

    for (r <- 1 to 2) {
      timed(s"q1_agg sf0.1 (r$r)")(q1(src)); timed(s"q1_agg x$factor (r$r)")(q1(big))
      timed(s"q3_join sf0.1 (r$r)")(q3(src)); timed(s"q3_join x$factor (r$r)")(q3(big))
      timed(s"q2_window sf0.1 (r$r)")(q2(src)); timed(s"q2_window x$factor (r$r)")(q2(big))
    }
    spark.stop()
  }
}
