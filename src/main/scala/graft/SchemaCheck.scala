package graft
import org.apache.spark.sql.SparkSession
/** Ad-hoc debug main: print Spark-read schemas of the test tables. */
object SchemaCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.runtime.Dialect(SparkSession.builder()).master("local[2]")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Tables.all)
      println(t + " :: " + Tables(spark, "/root/testdata/sf0.001", t).schema.simpleString)
    Tables(spark, "/root/testdata/sf0.001", "events")
      .selectExpr("min(ts)","max(ts)","min(unix_timestamp(ts))","max(ts_ns)").show(false)
    spark.stop()
  }
}
