package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.runtime._

/** r18 optimization round: dump `explain("formatted")` for the query surfaces
  * the round touches, into plans/r18/<name>_<tag>.txt.
  *
  * Same contract as [[PlanDumpR17]]: for SQL-text pipelines the MODEL BODY
  * plans (full + incremental render) are dumped — the final `ctx.ref` read
  * plan is near-empty. r18 additionally dumps the DataFrame-built pipeline
  * bodies (q30 gold_orders, q62 fact_cells) and q73's staging aggregate,
  * which PlanDumpR17 could not show.
  *
  * Usage: runMain graft.PlanDumpR18 <tag> [name ...]   (default: all known)
  */
object PlanDumpR18 {
  private def explainStr(df: DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      df.explain("formatted")
    }
    out.toString("UTF-8")
  }

  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names = args.drop(1).toSet
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.runtime.Dialect(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "512k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r18"))

    def dump(name: String, df: => DataFrame): Unit =
      if (names.isEmpty || names(name)) {
        val p = Paths.get(s"plans/r18/${name}_$tag.txt")
        try {
          Files.writeString(p, explainStr(df))
          println(s"wrote $p")
        } catch {
          case e: Throwable => println(s"FAILED $name: $e")
        }
      }

    def sqlBody(model: String, sql: String, vars: Map[String, String],
                inc: Boolean): DataFrame = {
      val whDir = graft.runtime.TempDirs.create(s"graft_plandump18_$model")
      val ctx = Ctx(spark, new Warehouse(spark, whDir),
        SourceRegistry.overDir(spark, dir), vars = vars, isIncremental = inc)
      SqlTemplater.runSql(ctx, model, sql, materializeCtes = true)
    }
    dump("q72_model_full", sqlBody("gold_orders_wide",
      graft.queries.GoldOrdersWide.modelSql,
      Map("start_date_ymd" -> "2001-06-01"), inc = false))
    dump("q72_model_incr", sqlBody("gold_orders_wide",
      graft.queries.GoldOrdersWide.modelSql,
      Map("start_date_ymd" -> "2001-06-01"), inc = true))
    dump("q74_model_full", sqlBody("campaign_funnels",
      graft.queries.CampaignFunnels.modelSql,
      Map("start_date_ymd" -> "2024-01-25"), inc = false))
    dump("q74_model_incr", sqlBody("campaign_funnels",
      graft.queries.CampaignFunnels.modelSql,
      Map("start_date_ymd" -> "2024-01-25"), inc = true))
    dump("q76_model_full", sqlBody("customer_profile_merge",
      graft.queries.MergeQueries.modelSql,
      Map("cutoff_ymd" -> "1998-01-01"), inc = false))

    // q30 gold_orders model body (DataFrame pipeline): replicate the builder
    // over a registered stg_orders view, full + incremental
    def q30Body(inc: Boolean): DataFrame = {
      val whDir = graft.runtime.TempDirs.create("graft_plandump18_q30")
      val ctx = Ctx(spark, new Warehouse(spark, whDir), SourceRegistry.overDir(spark, dir),
        vars = Map("start_date_ymd" -> "2001-06-01"), isIncremental = inc)
      ctx.warehouse.registerView("stg_orders", () =>
        ctx.source("default", "orders")
          .join(ctx.source("default", "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(ctx.source("default", "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
            col("c_mktsegment"), col("n_name"),
            date_format(col("o_orderdate"), "yyyy-MM").as("order_month")))
      graft.queries.PipelineQueries.q30GoldBody(ctx)
    }
    dump("q30_model_full", q30Body(inc = false))
    dump("q30_model_incr", q30Body(inc = true))

    // q62 fact_cells body, full + incremental
    def q62Body(inc: Boolean): DataFrame = {
      val whDir = graft.runtime.TempDirs.create("graft_plandump18_q62")
      val ctx = Ctx(spark, new Warehouse(spark, whDir), SourceRegistry.overDir(spark, dir),
        isIncremental = inc)
      graft.queries.PipelineQueries.q62CellsBody(ctx)
    }
    dump("q62_cells_full", q62Body(inc = false))
    dump("q62_cells_incr", q62Body(inc = true))

    // q73 staging aggregate (the snapshot machinery's input)
    dump("q73_state", {
      val orders = Tables(spark, dir, "orders")
      graft.queries.Scd2Queries.stateAsOfForPlan(orders)
    })

    // plain (non-pipeline) declared queries: the returned plan IS the work
    for (n <- Seq("q32_ngram_jaccard", "q33_minhash_lsh", "q34_simhash_neardup",
                  "q56_ann_lsh_neardup", "q3_revenue_by_region_month",
                  "q43_generators", "q64_skew_join", "q67_bucketed_join",
                  "q18_word_pairs", "q1_pricing_summary", "q40_embed_neardup",
                  "q16_first_last_per_user"))
      dump(n, SparkEntry.queries(n)(spark, dir))

    spark.stop()
  }
}
