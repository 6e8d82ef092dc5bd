package graft

import graft.runtime._

/** models/spark/anomaly_detection/gross_profit_estimation_change.sql
  * executed VERBATIM — the anomaly_detection family: a WINDOW OVER AN
  * AGGREGATE with a predicate inside (`MAX(IF(days = 0, SUM(gp), NULL))
  * OVER (PARTITION BY t, country)` evaluated in the same GROUP BY query),
  * broadcasting each (date, country)'s day-0 estimation onto every later
  * re-estimation row; rows OUTSIDE the 0..180-day output filter still feed
  * the window (the filter is applied after the CTE); date-vs-string
  * landmark comparison and an inner country join. */
class GrossProfitChangeRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL gross_profit_estimation_change.sql: day-0 estimation window " +
       "over grouped sums") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/anomaly_detection/gross_profit_estimation_change.sql"))
    val model = SqlTemplater.sqlModelAuto("gross_profit_estimation_change", sql)
    assert(model.materialization == Materialization.Table())
    assert(model.deps == Seq("gold_countries"))

    val countries = Model("gold_countries", ctx => {
      val s = ctx.spark; import s.implicits._
      Seq(("de", "de", "Europe")).toDF("country_code", "top_country_code", "region_name")
    }, Materialization.Table())

    val ctx = freshCtx()
    ctx.sources.register("cube", "profit")(s => s.sql(Seq(
      // (2024-03-01, de): day 0 has TWO rows — the window must see their SUM
      ("2024-03-01", "de", "2024-03-02", 100.0, 10.0),
      ("2024-03-01", "de", "2024-03-02", 100.0, 12.0),
      ("2024-03-01", "de", "2024-03-03", 110.0, 25.0),  // day 1
      ("2024-03-01", "de", "2024-03-05", 120.0, 30.0),  // day 3
      // day -1 and day 200: dropped by the OUTER filter but still window rows
      ("2024-03-01", "de", "2024-03-01", 999.0, 99.0),
      ("2024-03-01", "de", "2024-09-18", 999.0, 99.0),
      // group with NO day-0 estimation: window yields NULL
      ("2024-03-10", "de", "2024-03-12", 50.0, 7.0),
      // excluded: unknown country (inner join), pre-2022 landmark
      ("2024-03-01", "xx", "2024-03-02", 1.0, 1.0),
      ("2021-06-01", "de", "2021-06-02", 1.0, 1.0))
      .map { case (t, c, pd, gmv, gp) =>
        s"""SELECT DATE'$t' AS t, '$c' AS country, DATE'$pd' AS prediction_date,
           |  ${gmv}D AS gmv_initial, ${gp}D AS order_gross_profit_final_estimated""".stripMargin
      }.mkString("\nUNION ALL\n")))

    new DagRunner(Seq(countries, model)).run(ctx)
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    val out = ctx.ref("gross_profit_estimation_change")
      .selectExpr("CAST(order_date_msk AS STRING)", "country_code",
        "days_since_first_estimation", "gmv_initial",
        "order_gross_profit_final_estimated",
        "order_gross_profit_final_estimated_first_estimation")
      .as[(String, String, Int, Double, Double, Option[Double])].collect().toSet
    assert(out == Set(
      ("2024-03-01", "de", 0, 200.0, 22.0, Some(22.0)),
      ("2024-03-01", "de", 1, 110.0, 25.0, Some(22.0)),
      ("2024-03-01", "de", 3, 120.0, 30.0, Some(22.0)),
      ("2024-03-10", "de", 1, 50.0, 7.0, None)), out.toString)
  }
}
