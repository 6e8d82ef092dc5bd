package graft

import graft.runtime._

/** models/spark/search/success_by_relevance/search_success_aggregated.sql
  * executed VERBATIM — the last major analytics archetype not previously run
  * as a file: per-device COUNT(DISTINCT) roll-up, GROUP BY + GROUPING SETS
  * over (country, os) with per-day totals, a `RANGE BETWEEN INTERVAL 27 DAYS
  * PRECEDING` rolling window over the grand-total band, Wilson CI +
  * prediction interval via a CROSS JOIN'd params CTE, a `roll_n >= 100`
  * threshold, and a UNION ALL of the banded total with the detail slices
  * (grand total deduped out). Every asserted row hand-computed from the
  * planted device grid. */
class SearchSuccessRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL search_success_aggregated.sql: grouping sets, 28-day band, PI") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/search/success_by_relevance/search_success_aggregated.sql"))
    val ctx = freshCtx()

    // planted grid: 60 devices on each of two days (inside one 28-day
    // window). device i: country = us (i<30) else de; os = android (i%4<2)
    // else ios; one query each, successful iff i%3==0 (20/day).
    // Hand-tallied slice counts per day:
    //   us-android 16 devices / 5 success      us-ios 14 / 5
    //   de-android 14 / 5                      de-ios 16 / 5
    //   us 30/10, de 30/10, android 30/10, ios 30/10, grand 60/20
    val grid = for {
      d <- Seq("2024-03-01", "2024-03-02")
      i <- 0 until 60
    } yield (d, s"dev$i", "text_search",
      if (i < 30) "us" else "de",
      if (i % 4 < 2) "android" else "ios",
      s"q$i", 1, if (i % 3 == 0) 1 else 0)
    val extras = Seq(
      // duplicate row for dev0's same query, non-purchasing: COUNT(DISTINCT)
      // must not double-count the query or the success
      ("2024-03-01", "dev0", "text_search", "us", "android", "q0", 1, 0),
      // second DISTINCT query for dev1 (us-android, unsuccessful): day-1
      // us-android queries becomes 17 while its users stays 16 — splits
      // success_rate_by_query from success_rate_by_user
      ("2024-03-01", "dev1", "text_search", "us", "android", "qq", 1, 0),
      // filter fodder: NULL date, unknown_search, non-mobile os
      ("", "devX", "text_search", "us", "android", "qx", 1, 1),
      ("2024-03-01", "devY", "unknown_search", "us", "android", "qy", 1, 1),
      ("2024-03-01", "devZ", "text_search", "us", "web", "qz", 1, 1))
    ctx.warehouse.createTable("search_success_result",
      (grid ++ extras).toDF("d", "device_id", "search_type", "device_country",
        "os_type", "textQueryOrCategory", "relevance", "has_purchase")
        .selectExpr("CAST(NULLIF(d, '') AS DATE) AS search_date", "device_id",
          "search_type", "device_country", "os_type", "textQueryOrCategory",
          "relevance", "has_purchase"))

    val model = SqlTemplater.sqlModelAuto("search_success_aggregated", sql)
    assert(model.materialization == Materialization.IncrementalInsertOverwrite(
      Seq("search_date"), OnSchemaChange.Ignore))
    assert(model.meta("team") == "search")

    val dag = new DagRunner(Seq(model))
    for (r <- Seq(dag.run(ctx, selectors = Seq("search_success_aggregated")),
                  dag.run(ctx, selectors = Seq("search_success_aggregated")));
         (n, st) <- r)
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val out = ctx.ref("search_success_aggregated")
    // 9 grouping-set rows/day, minus the grand total in the detail leg
    // (8/day × 2 days), plus the band leg: day 1's rolling users (60) miss
    // the roll_n >= 100 gate, day 2's (120) pass it -> exactly one band row
    assert(out.count() == 17, out.count().toString)

    val rows = out.selectExpr("CAST(search_date AS STRING)", "device_country",
      "os_type", "sum_queries", "sum_queries_with_success",
      "success_rate_by_query", "sum_users", "sum_users_with_success",
      "success_rate_by_user", "is_incomplete_data")
      .as[(String, String, String, Long, Long, Double, Long, Long, Double, Boolean)]
      .collect().map(r => (r._1, r._2, r._3) -> r).toMap
    assert(rows.size == 17)

    // day-1 us-android: dev1's second query gives 17 queries over 16 users
    assert(rows(("2024-03-01", "us", "android")) ==
      ("2024-03-01", "us", "android", 17L, 5L, 0.2941, 16L, 5L, 0.3125, false))
    // day-2 us-android: clean grid, queries == users
    assert(rows(("2024-03-02", "us", "android")) ==
      ("2024-03-02", "us", "android", 16L, 5L, 0.3125, 16L, 5L, 0.3125, false))
    // day-1 us total (os rolled up): 31 queries / 30 users
    assert(rows(("2024-03-01", "us", "total")) ==
      ("2024-03-01", "us", "total", 31L, 10L, 0.3226, 30L, 10L, 0.3333, false))
    // day-1 ios total (country rolled up)
    assert(rows(("2024-03-01", "total", "ios")) ==
      ("2024-03-01", "total", "ios", 30L, 10L, 0.3333, 30L, 10L, 0.3333, false))
    // the de-ios detail slice both days
    assert(rows(("2024-03-02", "de", "ios")) ==
      ("2024-03-02", "de", "ios", 16L, 5L, 0.3125, 16L, 5L, 0.3125, false))

    // band: only day 2 (roll_n = 120 >= 100); day 1's grand total is absent
    assert(!rows.contains(("2024-03-01", "total", "total")))
    assert(rows(("2024-03-02", "total", "total")) ==
      ("2024-03-02", "total", "total", 60L, 20L, 0.3333, 60L, 20L, 0.3333, false))

    // prediction interval of the band row, formula order as in the model:
    // p_roll = roll_s/roll_n = 40/120; margin = z*sqrt(p(1-p)/sum_users)
    val band = out.filter("device_country = 'total' AND os_type = 'total'")
      .selectExpr("pi_low", "pi_high", "is_outlier")
      .as[(Option[Double], Option[Double], Option[Boolean])].head()
    // the model's `roll_s * 1.0 / roll_n` makes this DECIMAL arithmetic in
    // Spark SQL (the 1.0 literal is DECIMAL(2,1)), and decimal overflow
    // rounds the p*(1-p) and /sum_users intermediates to scale 6 — so the
    // result sits ~5e-6 off the pure-double value; assert to that precision
    val pRoll = 40.0 * 1.0 / 120.0
    val margin = 1.96 * math.sqrt(pRoll * (1.0 - pRoll) / 60.0)
    assert(math.abs(band._1.get - (pRoll - margin)) < 1e-5, band.toString)
    assert(math.abs(band._2.get - (pRoll + margin)) < 1e-5, band.toString)
    assert(band._3.contains(false)) // 0.3333 sits inside the PI
    // detail legs carry NULL intervals
    val detail = out.filter("device_country = 'us' AND os_type = 'android'")
      .selectExpr("pi_low", "is_outlier")
      .as[(Option[Double], Option[Boolean])].collect()
    assert(detail.length == 2 && detail.forall(r => r._1.isEmpty && r._2.isEmpty))
  }
}
