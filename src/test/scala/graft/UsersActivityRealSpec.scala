package graft

import graft.runtime._

/** b2b_mart/dashboards/general_dashboard/users_activity.sql (608 LoC)
  * executed VERBATIM: the DAU→WAU→MAU→QAU→AAU pyramid — per-day typed
  * activity, then per-window device cross-over detection, priority-resolved
  * user/traffic types, and COUNT(DISTINCT) rollups unioned across five
  * granularities. Planted users make every row hand-computable, including
  * the model's own 'inactive' vs 'not active' priority-arm mismatch (the
  * weekly+ user_type of an inactive-only user resolves to NULL — faithful
  * execution reproduces it). */
class UsersActivityRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL users_activity.sql (608 LoC) builds the activity pyramid from planted users") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/b2b_mart/dashboards/general_dashboard/users_activity.sql"))
    val ctx = freshCtx()
    ctx.warehouse.createTable("ss_events_authentication",
      Seq(("u1", 1, 1, "2025-03-03")).toDF("user_id", "autorisation", "registration", "d")
        .selectExpr("user_id", "autorisation", "registration", "CAST(d AS DATE) AS event_msk_date"))
    ctx.warehouse.createTable("ss_events_startsession", Seq(
      // u1: android Monday, windows Tuesday -> daily mobile+desktop, weekly 'cross'
      ("u1", "2025-03-03", "2025-03-03 10:00:00", "android", null, null, null, 1, "pt-br", 0, "sessionStart"),
      ("u1", "2025-03-04", "2025-03-04 09:00:00", "windows", null, null, null, 1, "pt-br", 0, "sessionStart"),
      // u2: inactive advertising desktop user in MX
      ("u2", "2025-03-05", "2025-03-05 12:00:00", "windows", "google", "cpc", "c1", 0, "es-mx", 0, "sessionStart"),
      // excluded: bot flag, out-of-scope landing
      ("u3", "2025-03-03", "2025-03-03 10:00:00", "ios", null, null, null, 1, "pt-br", 1, "sessionStart"),
      ("u4", "2025-03-03", "2025-03-03 10:00:00", "ios", null, null, null, 1, "en-us", 0, "sessionStart"))
      .toDF("user_id", "d", "ts", "osType", "utm_source", "utm_medium",
        "utm_campaign", "active_user", "landing", "bot_flag", "type")
      .selectExpr("user_id", "CAST(d AS DATE) AS event_msk_date",
        "CAST(ts AS TIMESTAMP) AS event_ts_msk", "osType", "utm_source",
        "utm_medium", "utm_campaign", "active_user", "landing", "bot_flag", "type"))

    val model = SqlTemplater.sqlModelAuto("users_activity", sql)
    assert(model.deps.toSet == Set("ss_events_authentication", "ss_events_startsession"))
    for ((n, st) <- new DagRunner(Seq(model)).run(ctx, selectors = Seq("users_activity")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val got = ctx.ref("users_activity")
      .selectExpr("CAST(date_msk AS STRING)", "device_type", "user_type",
        "country_code", "traffic_type", "metric", "num_of_users")
      .as[(String, String, Option[String], String, String, String, Long)]
      .collect().toSet
    val expected = Set(
      ("2025-03-03", "mobile", Some("registration"), "BR", "organic", "DAU", 1L),
      ("2025-03-04", "desktop", Some("registration"), "BR", "organic", "DAU", 1L),
      ("2025-03-05", "desktop", Some("inactive"), "MX", "advertising", "DAU", 1L),
      // weekly+: u1's two device classes collapse to 'cross'; u2's
      // 'inactive' has no priority arm ('not active' is what the resolver
      // lists) -> NULL user_type, reproduced faithfully
      ("2025-03-03", "cross", Some("registration"), "BR", "organic", "WAU", 1L),
      ("2025-03-03", "desktop", None, "MX", "advertising", "WAU", 1L),
      ("2025-03-01", "cross", Some("registration"), "BR", "organic", "MAU", 1L),
      ("2025-03-01", "desktop", None, "MX", "advertising", "MAU", 1L),
      ("2025-01-01", "cross", Some("registration"), "BR", "organic", "QAU", 1L),
      ("2025-01-01", "desktop", None, "MX", "advertising", "QAU", 1L),
      ("2025-01-01", "cross", Some("registration"), "BR", "organic", "AAU", 1L),
      ("2025-01-01", "desktop", None, "MX", "advertising", "AAU", 1L))
    assert(got.map(r => (r._1.take(10), r._2, r._3, r._4, r._5, r._6, r._7)) == expected,
      got.toSeq.sortBy(r => (r._6, r._1)).mkString("\n"))
  }
}
