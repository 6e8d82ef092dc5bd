package graft.models

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parameterized retention model — the Scala analogue of the reference's
  * 390-line Jinja model-template macro instantiated once per entity
  * (reference: macros/gold_active_users_and_devices_with_ephemeral.sql:1-393,
  * callers models/spark/gold/gold_active_devices_with_ephemeral.sql:1 and
  * gold_active_users_with_ephemeral.sql:1). Where dbt parameterizes with
  * Jinja text substitution, this engine parameterizes with a plain function
  * `(entity id expression) => DataFrame`.
  *
  * Per entity-day: first-seen/new flags, rd1 / rw4 (22..28 FOLLOWING) /
  * churn-14 retention frames over the integer day key, ephemeral = new with
  * no return within 28 days (reference frames at lines 258-293).
  */
object ActiveRetention {

  /** Daily activity rollup for any entity id expression over `events`.
    *
    * The per-entity-day distinct is done as collect_set + explode so the
    * single shuffle lands on entity_id alone — a plain `.distinct()` hashes
    * on (entity, day) and forces the downstream entity-keyed windows to
    * re-shuffle everything (verified with PlanCheck: 3 exchanges → 2). */
  def dailyStats(events: DataFrame, idExpr: Column): DataFrame = {
    val days = events
      .select(idExpr.as("entity_id"), unix_date(to_date(col("ts"))).as("d"))
      .groupBy(col("entity_id")).agg(collect_set(col("d")).as("ds"))
      .select(col("entity_id"), explode(col("ds")).as("d"))
    val w = Window.partitionBy(col("entity_id")).orderBy(col("d"))
    def frame(lo: Int, hi: Int) = count(lit(1)).over(w.rangeBetween(lo, hi))
    val flagged = days
      .withColumn("first_d", min(col("d")).over(Window.partitionBy(col("entity_id"))))
      .withColumn("is_new", (col("d") === col("first_d")).cast("int"))
      .withColumn("rd1", (frame(1, 1) > 0).cast("int"))
      .withColumn("rw4", (frame(22, 28) > 0).cast("int"))
      .withColumn("churn14", (frame(1, 14) === 0).cast("int"))
      .withColumn("ephemeral",
        (col("d") === col("first_d") && frame(1, 28) === 0).cast("int"))
    flagged.groupBy(col("d"))
      .agg(count(lit(1)).as("n_active"),
        sum(col("is_new")).as("n_new"),
        sum(col("rd1")).as("n_rd1"),
        sum(col("rw4")).as("n_rw4"),
        sum(col("churn14")).as("n_churn14"),
        sum(col("ephemeral")).as("n_ephemeral"))
  }

  /** Oracle SQL for [[dailyStats]], parameterized by the entity expression
    * (DuckDB dialect) — mirrors the two macro instantiations. */
  def oracleSql(idSqlExpr: String): String =
    s"""WITH days AS (
       |  SELECT DISTINCT $idSqlExpr AS entity_id,
       |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS INT) AS d
       |  FROM events),
       |f AS (
       |  SELECT entity_id, d,
       |    MIN(d) OVER (PARTITION BY entity_id) AS first_d,
       |    COUNT(*) OVER (PARTITION BY entity_id ORDER BY d RANGE BETWEEN 1 FOLLOWING AND 1 FOLLOWING) AS c_rd1,
       |    COUNT(*) OVER (PARTITION BY entity_id ORDER BY d RANGE BETWEEN 22 FOLLOWING AND 28 FOLLOWING) AS c_rw4,
       |    COUNT(*) OVER (PARTITION BY entity_id ORDER BY d RANGE BETWEEN 1 FOLLOWING AND 14 FOLLOWING) AS c_14,
       |    COUNT(*) OVER (PARTITION BY entity_id ORDER BY d RANGE BETWEEN 1 FOLLOWING AND 28 FOLLOWING) AS c_28
       |  FROM days)
       |SELECT d, COUNT(*) AS n_active,
       |  CAST(SUM(CAST(d = first_d AS INT)) AS BIGINT) AS n_new,
       |  CAST(SUM(CAST(c_rd1 > 0 AS INT)) AS BIGINT) AS n_rd1,
       |  CAST(SUM(CAST(c_rw4 > 0 AS INT)) AS BIGINT) AS n_rw4,
       |  CAST(SUM(CAST(c_14 = 0 AS INT)) AS BIGINT) AS n_churn14,
       |  CAST(SUM(CAST(d = first_d AND c_28 = 0 AS INT)) AS BIGINT) AS n_ephemeral
       |FROM f GROUP BY 1""".stripMargin

  /** Instantiation 1: real users (reference: gold_active_users_with_ephemeral). */
  def activeUsers(spark: SparkSession, dir: String): DataFrame =
    dailyStats(graft.Tables(spark, dir, "events"), col("user_id"))

  /** Instantiation 2: synthetic devices (reference: gold_active_devices_with_
    * ephemeral) — same builder, different id expression. */
  def activeDevices(spark: SparkSession, dir: String): DataFrame =
    dailyStats(graft.Tables(spark, dir, "events"), col("event_id") % 200)

  val usersOracle: String = oracleSql("user_id")
  val devicesOracle: String = oracleSql("event_id % 200")
}
