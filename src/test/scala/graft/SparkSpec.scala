package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.runtime.{Ctx, SourceRegistry, Warehouse}

/** Shared local session + warehouse scaffolding for specs. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def freshCtx(vars: Map[String, String] = Map.empty): Ctx = {
    val wh = new Warehouse(spark, graft.runtime.TempDirs.create("graft_wh"))
    Ctx(spark, wh, SourceRegistry.overDir(spark, "/root/testdata/sf0.001"), vars)
  }
}
