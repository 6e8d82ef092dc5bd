package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.runtime._

/** r17 optimization round: dump `explain("formatted")` for the query surfaces
  * the round touches, into plans/r17/<name>_<tag>.txt.
  *
  * For plain queries the dumped plan is the query's own; for the pipeline
  * queries (q30/q62/q72/q74/q47/q76) the *final read* plan is near-empty, so
  * this also dumps the MODEL BODY plans (full + incremental render) — those
  * are the plans whose execution dominates the bench wall.
  *
  * Usage: runMain graft.PlanDumpR17 <tag> [name ...]   (default: all known)
  */
object PlanDumpR17 {
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
    Files.createDirectories(Paths.get("plans/r17"))

    def dump(name: String, df: => DataFrame): Unit =
      if (names.isEmpty || names(name)) {
        val p = Paths.get(s"plans/r17/${name}_$tag.txt")
        try {
          Files.writeString(p, explainStr(df))
          println(s"wrote $p")
        } catch {
          case e: Throwable => println(s"FAILED $name: $e")
        }
      }

    // model-body plans for the SQL-text pipelines (full + incremental render).
    // The incremental body references the existing table via the lookback
    // var only (no {{ this }}), so rendering it against freshly-registered
    // sources is exactly the plan run 2 executes.
    def sqlBody(model: String, sql: String, vars: Map[String, String],
                inc: Boolean): DataFrame = {
      val whDir = graft.runtime.TempDirs.create(s"graft_plandump_$model")
      val ctx = Ctx(spark, new Warehouse(spark, whDir),
        SourceRegistry.overDir(spark, dir), vars = vars, isIncremental = inc)
      // materializeCtes mirrors sqlModel's table-backed path (the plan the
      // DagRunner actually executes for these models since r17)
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

    // plain (non-pipeline) declared queries: the returned plan IS the work
    for (n <- Seq("q32_ngram_jaccard", "q33_minhash_lsh", "q34_simhash_neardup",
                  "q56_ann_lsh_neardup", "q3_revenue_by_region_month",
                  "q43_generators", "q51_nested_mongo", "q64_skew_join",
                  "q67_bucketed_join", "q18_word_pairs", "q1_pricing_summary",
                  "q45_window_first_last", "q61_interval_frame", "q40_embed_neardup"))
      dump(n, SparkEntry.queries(n)(spark, dir))

    spark.stop()
  }
}
