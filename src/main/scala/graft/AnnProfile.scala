package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the ANN family (temporary; not part of the API). */
object AnnProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.runtime.Dialect(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val e = Tables(spark, dir, "embeddings")
    e.count()
    def q39() = {
      val cents = graft.ops.Similarity.kmeansOnSample(e,
        e.filter(col("vec_id") % 31 === 0).limit(16), sampleSize = 1024, iters = 25)
      graft.ops.Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), cents, k = 5, nProbe = 2)
        .write.format("noop").mode("overwrite").save()
    }
    t("q39 new warm")(q39()); t("q39 new run2")(q39()); t("q39 new run3")(q39())
    def q56() =
      graft.ops.Similarity.signBucketNearDup(e, 0.35, nBits = 4, tables = 8)
        .write.format("noop").mode("overwrite").save()
    t("q56 warm")(q56()); t("q56 run2")(q56()); t("q56 run3")(q56())
    t("q56 tables=1") {
      graft.ops.Similarity.signBucketNearDup(e, 0.35, nBits = 4, tables = 1)
        .write.format("noop").mode("overwrite").save()
    }
    t("q56 tables=1 again") {
      graft.ops.Similarity.signBucketNearDup(e, 0.35, nBits = 4, tables = 1)
        .write.format("noop").mode("overwrite").save()
    }
    val out = graft.ops.Similarity.signBucketNearDup(e, 0.35, nBits = 4, tables = 8)
    t("q56 output count")(println("rows=" + out.count()))
    spark.stop()
  }
}
