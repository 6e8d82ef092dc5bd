package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector: prints `explain("formatted")` for selected queries
  * so pushdown / broadcast / codegen coverage can be reviewed (SURVEY.md §4).
  * Usage: runMain graft.PlanCheck [queryName ...]
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.runtime.Dialect(SparkSession.builder()).master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq("q3_revenue_by_region_month")
    for (n <- names) {
      println(s"########## $n ##########")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
