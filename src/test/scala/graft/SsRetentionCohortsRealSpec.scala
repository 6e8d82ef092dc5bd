package graft

import graft.runtime._
import java.time.{LocalDate, ZoneOffset}
import java.time.temporal.ChronoUnit

/** models/spark/b2b_mart/ss/ss_retention_cohorts.sql executed VERBATIM —
  * the triple-granularity retention cube. Semantics under test: the cohort
  * gate (landing locales + bot filter) applying ONLY to cohort derivation
  * while `activity` counts every session (a pre-cohort bot session lands at
  * a NEGATIVE week_number and must never join the 0-based spine — but the
  * same session truncates to month/quarter 0 via CAST-toward-zero and DOES
  * light those periods), the 0..500 POSEXPLODE counter spine cut per user
  * at a CLOCK-RELATIVE max period (the spec recomputes Monday-start weeks /
  * month firsts / 92-day quarters from the session clock), the per-user
  * deal-type FAN-OUT (a user with two historical deal types carries TWO
  * spine rows per period, joined to aggregates by the NULL-SAFE `<=>` so
  * dealless users ride a NULL type), the `deal_created_date >= cohort_date`
  * gate that keeps a PRE-COHORT deal out of the aggregates while its type
  * still fans the spine, and the Sample-type exclusion. */
class SsRetentionCohortsRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL ss_retention_cohorts.sql: cohort gates, counter spine, " +
       "deal-type fan-out with null-safe joins") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/b2b_mart/ss/ss_retention_cohorts.sql"))
    val ctx = freshCtx()

    // u1: cohort 2026-06-01 (a Monday) + an active day in week 1, plus a
    // PRE-COHORT BOT session (excluded from cohort, included in activity —
    // week -2, month/quarter 0); u2: cohort 06-02, dealless; u3: wrong
    // landing → no cohort at all
    ctx.warehouse.createTable("ss_events_startsession", spark.sql(
      """SELECT 'u1' AS user_id, DATE'2026-06-01' AS event_msk_date,
        |  'pt-br' AS landing, 0 AS bot_flag
        |UNION ALL SELECT 'u1', DATE'2026-06-10', 'pt-br', 0
        |UNION ALL SELECT 'u1', DATE'2026-05-20', 'pt-br', 1
        |UNION ALL SELECT 'u2', DATE'2026-06-02', 'es-mx', 0
        |UNION ALL SELECT 'u3', DATE'2026-06-01', 'en', 0""".stripMargin))

    // DA: VIP→Big Deal inside the cohort window (week 1 / month 0);
    // DB: Sample (excluded outright); DC: RFQ→Small Deal but PRE-COHORT —
    // fans deal_types yet contributes no aggregate row
    ctx.warehouse.createTable("fact_deals_with_requests", spark.sql(
      """SELECT DATE'2026-06-09' AS deal_created_date, 'DA' AS deal_id,
        |  'u1' AS user_id, 'VIP' AS deal_type,
        |  CAST(NULL AS DOUBLE) AS final_gmv, 100.0D AS gmv_initial
        |UNION ALL SELECT DATE'2026-06-09', 'DB', 'u1', 'Sample', 1.0D, 1.0D
        |UNION ALL SELECT DATE'2026-05-30', 'DC', 'u1', 'RFQ', 2.0D, 50.0D""".stripMargin))

    ctx.warehouse.createTable("fact_marketing_utm_interactions", spark.sql(
      """SELECT 'u1' AS user_id, 'google' AS friendly_source,
        |  'camp1' AS utm_campaign, true AS first_visit_flag
        |UNION ALL SELECT 'u2', 'meta', 'camp2', false""".stripMargin))

    ctx.warehouse.createTable("ss_users_table", spark.sql(
      "SELECT 'u1' AS user_id, 'A' AS questionnaire_grade, 'mql' AS Marketing_Lead_Type"))

    val model = SqlTemplater.sqlModelAuto("ss_retention_cohorts", sql)
    assert(model.materialization == Materialization.View)
    assert(model.deps.toSet == Set("fact_marketing_utm_interactions",
      "ss_users_table", "ss_events_startsession", "fact_deals_with_requests"))

    for ((n, st) <- new DagRunner(Seq(model)).run(ctx,
        selectors = Seq("ss_retention_cohorts")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val out = ctx.ref("ss_retention_cohorts").cache()

    // the spine length is clock-relative; recompute it the model's way
    val today = LocalDate.now(ZoneOffset.UTC)
    def wk(d: LocalDate) = d.minusDays((d.getDayOfWeek.getValue + 6) % 7)
    def mo(d: LocalDate) = d.withDayOfMonth(1)
    def qt(d: LocalDate) = LocalDate.of(d.getYear, ((d.getMonthValue - 1) / 3) * 3 + 1, 1)
    def spans(c: LocalDate): Long =
      (ChronoUnit.DAYS.between(wk(c), wk(today)) / 7 + 1) +
        (ChronoUnit.MONTHS.between(mo(c), mo(today)) + 1) +
        (ChronoUnit.DAYS.between(qt(c), qt(today)) / 92 + 1)
    // u1 fans ×2 deal types (Big via DA, Small via pre-cohort DC); u2 ×1
    val expectedRows = 2 * spans(LocalDate.of(2026, 6, 1)) +
      spans(LocalDate.of(2026, 6, 2))
    assert(out.count() == expectedRows,
      s"spine must be (maxPeriod+1) per granularity × deal-type fan: $expectedRows")
    assert(out.filter("user_id = 'u3'").count() == 0, "non-locale landing gated out")

    val weekRows = out.filter("retention_detalization = 'week' AND user_id = 'u1'")
      .selectExpr("deal_type", "CAST(period_number AS INT)", "is_active",
        "CAST(deals AS INT)", "gmv", "CAST(cohort_date AS STRING)",
        "friendly_source", "utm_campaign", "questionnaire_grade", "ss_user")
      .as[(String, Int, Int, Int, Double, String, String, String, String, Int)]
      .collect().toSet
    // week 0: active (cohort day), no deals yet; week 1: active + DA lands
    // on the Big Deal row ONLY (null-safe type match); the Small Deal fan
    // rows carry activity but zero aggregates (DC is pre-cohort)
    assert(weekRows.contains(("Big Deal", 0, 1, 0, 0.0, "2026-06-01",
      "google", "camp1", "A", 1)), weekRows.filter(_._2 == 0).toString)
    assert(weekRows.contains(("Big Deal", 1, 1, 1, 100.0, "2026-06-01",
      "google", "camp1", "A", 1)), weekRows.filter(_._2 == 1).toString)
    assert(weekRows.contains(("Small Deal", 0, 1, 0, 0.0, "2026-06-01",
      "google", "camp1", "A", 1)))
    assert(weekRows.contains(("Small Deal", 1, 1, 0, 0.0, "2026-06-01",
      "google", "camp1", "A", 1)))
    // weeks ≥2: no activity, no deals (the -2 bot week never joins)
    assert(!weekRows.exists(r => r._2 >= 2 && (r._3 == 1 || r._4 > 0)),
      weekRows.filter(_._2 >= 2).filter(r => r._3 == 1 || r._4 > 0).toString)

    // month 0 absorbs BOTH the cohort-day and the 06-10 session AND the
    // pre-cohort bot session (CAST toward zero) — and DA's deal
    val monthRows = out.filter(
      "retention_detalization = 'month' AND user_id = 'u1' AND deal_type = 'Big Deal'")
      .selectExpr("CAST(period_number AS INT)", "is_active", "CAST(deals AS INT)", "gmv")
      .as[(Int, Int, Int, Double)].collect().toSet
    assert(monthRows.contains((0, 1, 1, 100.0)), monthRows.toString)
    assert(!monthRows.exists(r => r._1 >= 1 && (r._2 == 1 || r._3 > 0)))

    // u2: dealless → NULL deal type rides the null-safe join; no marketing
    // first-visit row (flag false) and no ss_users row → nulls / ss_user 0
    val u2 = out.filter("retention_detalization = 'quarter' AND user_id = 'u2' " +
      "AND period_number = 0")
      .selectExpr("deal_type", "is_active", "CAST(deals AS INT)", "gmv",
        "friendly_source", "questionnaire_grade", "ss_user")
      .as[(Option[String], Int, Int, Double, Option[String], Option[String], Int)]
      .collect().toSeq
    assert(u2 == Seq((None, 1, 0, 0.0, None, None, 0)), u2.toString)
    out.unpersist()
  }
}
