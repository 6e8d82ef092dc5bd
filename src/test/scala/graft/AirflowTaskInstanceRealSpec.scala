package graft

import graft.runtime._

/** models/spark/platform/airflow_task_instance_daily.sql executed VERBATIM —
  * the platform-family view: a NOW()-relative UNION of an archive ref (last
  * 3 months, strictly before yesterday) with a RAW catalog table
  * `platform.airflow_task_instance` (no source() call — the engine's raw
  * db.table path), the 22:00-hour rollover that books late-evening task
  * starts into the NEXT day's partition, a skipped-state filter on both
  * branches, and ROW_NUMBER/COUNT retry bookkeeping per
  * (task, dag, partition_date).
  *
  * Fixture dates are derived from the test run's own clock because the
  * verbatim SQL filters on TO_DATE(NOW()).
  */
class AirflowTaskInstanceRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL airflow_task_instance_daily.sql: archive+live union, 22h " +
       "rollover, retry numbering") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/platform/airflow_task_instance_daily.sql"))
    val model = SqlTemplater.sqlModelAuto("airflow_task_instance_daily", sql)
    assert(model.materialization == Materialization.View)
    assert(model.deps == Seq("airflow_task_instance_archive"))

    // The verbatim SQL evaluates TO_DATE(NOW()) at execution while the
    // fixtures pin `today` at build time — a run straddling UTC midnight
    // shifts the archive/live window and the rollover expectations. Capture
    // `today` per attempt and retry ONCE if the date rolled mid-attempt.
    def attempt(): Unit = {
    val today = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
    def d(off: Long) = today.plusDays(off).toString
    def ts(off: Long, hm: String) = s"${d(off)} $hm:00"

    // archive rows: `partition_date < today-1 AND >= today-3mo AND state <>
    // 'skipped'` — two tries of the same (task, dag, partition) for the
    // retry numbering, a skipped row, a too-recent row (today-1), and a
    // too-old row (today-4mo)
    val archive = Model("airflow_task_instance_archive", ctx => {
      val s = ctx.spark; import s.implicits._
      Seq(
        ("load", "dagA", "r1", "BashOperator", d(-3), "success", 10, ts(-3, "06:00"), ts(-3, "06:05"), 300.0, 1, "default"),
        ("load", "dagA", "r1b", "BashOperator", d(-3), "failed", 10, ts(-3, "05:00"), ts(-3, "05:01"), 60.0, 1, "default"),
        ("load", "dagA", "r2", "BashOperator", d(-2), "success", 10, ts(-2, "06:00"), ts(-2, "06:04"), 240.0, 1, "default"),
        ("skip", "dagA", "r3", "BashOperator", d(-3), "skipped", 10, ts(-3, "07:00"), ts(-3, "07:00"), 0.0, 1, "default"),
        ("load", "dagA", "r4", "BashOperator", d(-1), "success", 10, ts(-1, "06:00"), ts(-1, "06:05"), 300.0, 1, "default"),
        ("load", "dagA", "r0", "BashOperator", d(-120), "success", 10, ts(-120, "06:00"), ts(-120, "06:05"), 300.0, 1, "default"))
        .toDF("task_id", "dag_id", "run_id", "operator", "pd", "state",
          "priority_weight", "sd", "ed", "duration", "try_number", "pool")
        .selectExpr("task_id", "dag_id", "run_id", "operator",
          "CAST(pd AS DATE) AS partition_date", "state", "priority_weight",
          "CAST(sd AS TIMESTAMP) AS start_date", "CAST(ed AS TIMESTAMP) AS end_date",
          "duration", "try_number", "pool")
    }, Materialization.Table())

    // live rows, raw catalog table: `start_date >= (today-1) - 2h` — a
    // 23:30 start yesterday rolls into TODAY's partition (HOUR >= 22), a
    // late-today start books into TOMORROW, a 10:00 start stays same-day,
    // a yesterday-21:00 start is IN window (the bound is midnight-yesterday
    // minus 2h, i.e. two-days-ago 22:00) with a same-day partition,
    // skipped excluded
    val dbLoc = TempDirs.create("graft_airflow_db")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS platform LOCATION '$dbLoc'")
    try {
      Seq(
        ("live", "dagB", "r5", "PythonOperator", "running", 5, ts(-1, "23:30"), null.asInstanceOf[String], 0.0, 1, "default"),
        ("live", "dagB", "r6", "PythonOperator", "success", 5, ts(0, "23:10"), ts(0, "23:12"), 120.0, 1, "default"),
        ("live", "dagB", "r7", "PythonOperator", "success", 5, ts(0, "10:00"), ts(0, "10:02"), 120.0, 2, "default"),
        ("live", "dagB", "r8", "PythonOperator", "success", 5, ts(-1, "21:00"), ts(-1, "21:01"), 60.0, 1, "default"),
        ("live", "dagB", "r9", "PythonOperator", "skipped", 5, ts(0, "11:00"), ts(0, "11:00"), 0.0, 1, "default"))
        .toDF("task_id", "dag_id", "run_id", "operator", "state",
          "priority_weight", "sd", "ed", "duration", "try_number", "pool")
        .selectExpr("task_id", "dag_id", "run_id", "operator", "state",
          "priority_weight", "CAST(sd AS TIMESTAMP) AS start_date",
          "CAST(ed AS TIMESTAMP) AS end_date", "duration", "try_number", "pool")
        .write.mode("overwrite").option("path", s"$dbLoc/airflow_task_instance")
        .saveAsTable("platform.airflow_task_instance")

      val ctx = freshCtx()
      new DagRunner(Seq(archive, model)).run(ctx)
        .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

      val out = ctx.ref("airflow_task_instance_daily")
        .selectExpr("task_id", "run_id", "CAST(partition_date AS STRING)",
          "run_number", "run_cnt")
        .as[(String, String, String, Long, Long)].collect().toSet

      assert(out == Set(
        // archive day -3: two tries ordered by start_date (r1b 05:00 first)
        ("load", "r1b", d(-3), 1L, 2L),
        ("load", "r1", d(-3), 2L, 2L),
        ("load", "r2", d(-2), 1L, 1L),
        // live: 23:30 yesterday → TODAY's partition, joined there by the
        // 10:00 today run; 23:10 today → TOMORROW's partition
        ("live", "r5", d(0), 1L, 2L),
        ("live", "r7", d(0), 2L, 2L),
        ("live", "r8", d(-1), 1L, 1L),
        ("live", "r6", d(1), 1L, 1L)), out.toString)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS platform CASCADE")
    }
    }
    val dayAtStart = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
    try attempt()
    catch {
      case e: Throwable
          if java.time.LocalDate.now(java.time.ZoneOffset.UTC) != dayAtStart =>
        attempt() // UTC midnight rolled mid-attempt; re-derive fixtures on the new day
    }
  }
}
