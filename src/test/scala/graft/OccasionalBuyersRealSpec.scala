package graft

import graft.runtime._

/** models/spark/engagement/segments/occasional_buyers.sql executed VERBATIM —
  * the corpus's LEFT SEMI JOIN archetype: an SCD2-style effective-window
  * segment lookup (`effective_ts <= D < next_effective_ts`), a USING join to
  * the device link table, then `LEFT SEMI JOIN ... USING(device_id)` against
  * the device dimension as a pure existence filter, and a final DISTINCT
  * collapsing devices shared by several segment members. */
class OccasionalBuyersRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL occasional_buyers.sql: effective-window segment + semi-join " +
       "existence filter + distinct") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/engagement/segments/occasional_buyers.sql"))
    val model = SqlTemplater.sqlModelAuto("occasional_buyers", sql,
      Map.empty, Map("start_date_ymd" -> "2024-06-15"))
    assert(model.materialization == Materialization.Table())
    assert(model.meta("segment_name") == "occ_buyers")
    assert(model.deps.toSet == Set("user_segments", "link_device_real_user"))

    val segments = Model("user_segments", ctx => {
      val s = ctx.spark; import s.implicits._
      Seq(
        // in segment, window covers 2024-06-15
        ("u1", "Occasional buyers", "2024-06-01", "2024-07-01"),
        // same user, SUPERSEDED version of the window (next <= D): excluded
        ("u1", "Occasional buyers", "2024-05-01", "2024-06-01"),
        // window starts after D: excluded
        ("u2", "Occasional buyers", "2024-06-16", "2024-07-01"),
        // different segment: excluded
        ("u3", "Frequent buyers", "2024-06-01", "2024-07-01"),
        // second member of the segment (will share a device with u1)
        ("u4", "Occasional buyers", "2024-06-10", "2024-06-16"))
        .toDF("real_user_id", "user_segment", "eff", "next")
        .selectExpr("real_user_id", "user_segment",
          "CAST(eff AS TIMESTAMP) AS effective_ts",
          "CAST(next AS TIMESTAMP) AS next_effective_ts")
    }, Materialization.Table())
    val link = Model("link_device_real_user", ctx => {
      val s = ctx.spark; import s.implicits._
      Seq(("u1", "dv1"), ("u1", "dv2"), ("u2", "dv9"), ("u3", "dv8"),
        ("u4", "dv1"), ("u4", "dv3"))
        .toDF("real_user_id", "device_id")
    }, Materialization.Table())

    val ctx = freshCtx(vars = Map("start_date_ymd" -> "2024-06-15"))
    // dim_device_min: dv2 is missing → the semi join drops it even though
    // u1 (in-segment) links to it; dv9/dv8 present but their users are out
    ctx.sources.register("mart", "dim_device_min")(s => {
      import s.implicits._
      Seq("dv1", "dv3", "dv8", "dv9").toDF("device_id")
    })
    new DagRunner(Seq(segments, link, model)).run(ctx)
      .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    // dv1 appears via BOTH u1 and u4 → DISTINCT must emit it once
    val out = ctx.ref("occasional_buyers").as[String].collect().sorted.toSeq
    assert(out == Seq("dv1", "dv3"), out.toString)
  }
}
