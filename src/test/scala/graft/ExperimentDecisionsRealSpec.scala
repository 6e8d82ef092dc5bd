package graft

import graft.runtime._

/** models/spark/experiments/decisions.sql executed VERBATIM — the
  * experiments-family archetype: CONCAT_WS experiment ids, the polymorphic
  * Mongo author struct (`coalesce(author.oid, author.value)`), NOT
  * ARRAY_CONTAINS team exclusion, epoch-millis landmark filter,
  * cancelled-beats-end finish-date COALESCE, a raw catalog LEFT JOIN
  * USING on a DERIVED column (`experiments.authors_manual` — read without
  * a source() call), and a second USING join against a filtered CTE. */
class ExperimentDecisionsRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL decisions.sql: polymorphic author, exclusion filters, " +
       "cancelled-over-end finish, raw-catalog USING join") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/experiments/decisions.sql"))
    val model = SqlTemplater.sqlModelAuto("decisions", sql)
    assert(model.materialization == Materialization.View)
    assert(model.meta("bigquery_table_name") == "experiments.decisions")

    def setupRow(pid: String, ver: Int, oid: Option[String], value: Option[String],
                 state: String, startMs: Long, endMs: Long, cancelMs: Option[Long],
                 split: String, commands: Seq[String]): String = {
      def s(o: Option[String]) = o.map(x => s"'$x'").getOrElse("CAST(NULL AS STRING)")
      s"""SELECT '$pid' AS publicId, $ver AS version, 'ab' AS acceptanceType,
         |  NAMED_STRUCT('oid', ${s(oid)}, 'value', ${s(value)}) AS author,
         |  '$state' AS state, ${startMs}L AS startTimeMs, ${endMs}L AS endTimeMs,
         |  ${cancelMs.map(_ + "L").getOrElse("CAST(NULL AS BIGINT)")} AS cancelledTimeMs,
         |  ARRAY('g1', 'g2') AS groups, '$split' AS splitType,
         |  ARRAY(${commands.map(c => s"'$c'").mkString(",")}) AS commands,
         |  ARRAY('search') AS components,
         |  NAMED_STRUCT('status', 'accepted', 'description', 'ship it') AS decisionStatus""".stripMargin
    }
    def ms(d: String) = java.time.LocalDate.parse(d)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli

    val ctx = freshCtx()
    ctx.sources.register("experiments", "experiments_setup")(s => s.sql(Seq(
      // kept: finished, user split, author via oid
      setupRow("exp1", 2, Some("a1"), None, "finished",
        ms("2024-01-10"), ms("2024-01-20"), None, "splitByUserID", Seq("growth")),
      // kept: stopped, device split, author via value fallback, CANCELLED
      // earlier than end -> finish/duration use the cancel time
      setupRow("exp5", 1, None, Some("a2"), "stopped",
        ms("2024-02-01"), ms("2024-02-15"), Some(ms("2024-02-11")),
        "splitByDeviceID", Seq("pricing")),
      // excluded: the experimentPlatform team's own experiments
      setupRow("exp2", 1, Some("a1"), None, "finished",
        ms("2024-03-01"), ms("2024-03-10"), None, "splitByUserID",
        Seq("experimentPlatform")),
      // excluded: state not launched/stopped/finished
      setupRow("exp3", 1, Some("a1"), None, "draft",
        ms("2024-03-01"), ms("2024-03-10"), None, "splitByUserID", Seq("growth")),
      // excluded: pre-2023 landmark
      setupRow("exp4", 1, Some("a1"), None, "finished",
        ms("2022-06-01"), ms("2022-06-10"), None, "splitByUserID", Seq("growth")))
      .mkString("\nUNION ALL\n")))
    ctx.sources.register("experiments", "rollout_group_2")(s =>
      s.sql("""SELECT 'exp1.2' AS experiment_id, 'treatment2' AS group_id,
              |  DATE'2024-01-21' AS rollout_date, '2024-01-21' AS start
              |UNION ALL
              |SELECT 'exp1.2', 'old', DATE'2022-12-02', '2022-12-02'""".stripMargin))

    val dbLoc = TempDirs.create("graft_experiments_db")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS experiments LOCATION '$dbLoc'")
    try {
      Seq(("a1", "alice")).toDF("author_id", "username")
        .write.mode("overwrite").option("path", s"$dbLoc/authors_manual")
        .saveAsTable("experiments.authors_manual")

      new DagRunner(Seq(model)).run(ctx)
        .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

      val out = ctx.ref("decisions")
        .selectExpr("experiment_id", "author", "experiment_status",
          "CAST(start_date AS STRING)", "CAST(finish_date AS STRING)",
          "duration_days", "num_groups", "split_type",
          "decision_status", "rollout_group", "CAST(rollout_date AS STRING)")
        .as[(String, Option[String], String, String, String, Int, Int, String,
             String, Option[String], Option[String])].collect().toSet
      assert(out == Set(
        ("exp1.2", Some("alice"), "finished", "2024-01-10", "2024-01-20", 10, 2,
          "user_id", "accepted", Some("treatment2"), Some("2024-01-21")),
        // value-fallback author has no manual row; cancel wins over end;
        // non-user split maps to device_id; pre-2023 rollout row filtered
        ("exp5.1", None, "stopped", "2024-02-01", "2024-02-11", 10, 2,
          "device_id", "accepted", None, None)), out.toString)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS experiments CASCADE")
    }
  }
}
