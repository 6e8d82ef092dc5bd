package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.runtime._

/** SCD2 snapshot scenarios from FIXTURES.md §B.2: new key, changed row,
  * unchanged row, hard-deleted key, re-run idempotence — both strategies. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def snap(ctx: Ctx, name: String, df: DataFrame, strategy: Scd2Strategy,
                   runTs: String, hardDeletes: Boolean = true): Unit =
    Scd2.snapshot(ctx, name, df, "_id", strategy, hardDeletes, ts(runTs))

  private def history(ctx: Ctx, name: String): Set[(String, String, String, String)] =
    ctx.ref(name)
      .select($"_id", $"payload",
        date_trunc_s($"dbt_valid_from"), date_trunc_s($"dbt_valid_to"))
      .as[(String, String, Option[String], Option[String])]
      .collect().map(r => (r._1, r._2, r._3.getOrElse("-"), r._4.getOrElse("open"))).toSet

  private def date_trunc_s(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.date_format(c, "yyyy-MM-dd HH:mm:ss")

  test("REAL reference snapshot file runs the full SCD2 lifecycle verbatim") {
    // snapshots/spark/referral_program/referral_bloggers_info.sql:
    // check-strategy over ALL columns + invalidate_hard_deletes, source() in
    // the body — two runs with a changed row and a hard delete, history
    // asserted; contract parsed from the file's own {% snapshot %} config
    val model = SqlTemplater.snapshotModel(java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/reference/snapshots/spark/referral_program/referral_bloggers_info.sql")))
    assert(model.name == "referral_bloggers_info")
    assert(model.materialization == Materialization.Snapshot(
      "user_id", Scd2Strategy.Check(Nil), invalidateHardDeletes = true))
    assert(model.meta == Map("model_owner" -> "@zhabrev"))

    var rows = Seq((1L, "a@x.io", "en", "Ann", "2024-01-01"),
                   (2L, "b@x.io", "de", "Ben", "2024-01-02"))
    val ctx = freshCtx(vars = Map("run_ts" -> "2024-02-01 00:00:00"))
    ctx.sources.register("ads", "referral_bloggers")(s => {
      import s.implicits._
      rows.toDF("user_id", "email", "language", "user_name", "created_at")
    })
    val dag = new DagRunner(Seq(model))
    def run(at: String): Unit = {
      val r = new DagRunner(Seq(model)).run(
        ctx.copy(vars = ctx.vars + ("run_ts" -> at)))
      r.foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }
    }
    run("2024-02-01 00:00:00")
    assert(ctx.ref("referral_bloggers_info").count() == 2)
    // Ann changes language (check-all detects), Ben hard-deleted
    rows = Seq((1L, "a@x.io", "fr", "Ann", "2024-01-01"))
    run("2024-03-01 00:00:00")
    val h = ctx.ref("referral_bloggers_info")
      .select($"user_id", $"language", date_trunc_s($"dbt_valid_to"))
      .as[(Long, String, Option[String])].collect().toSet
    assert(h == Set(
      (1L, "en", Some("2024-03-01 00:00:00")),  // superseded version closed
      (1L, "fr", None),                         // new open version
      (2L, "de", Some("2024-03-01 00:00:00")))) // hard delete invalidated
  }

  test("REAL timestamp-strategy snapshot file runs verbatim (mongo shape)") {
    // snapshots/spark/b2b_mart/scd2_customers_snapshot.sql: SELECT * over a
    // mongo daily snapshot + millis_to_ts_msk(utms+1) as the updated_at
    // column — the 34-file archetype of the timestamp strategy
    val model = SqlTemplater.snapshotModel(java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/reference/snapshots/spark/b2b_mart/scd2_customers_snapshot.sql")))
    assert(model.name == "scd2_customers_snapshot")
    assert(model.materialization == Materialization.Snapshot(
      "_id", Scd2Strategy.Timestamp("update_ts_msk"), invalidateHardDeletes = true))
    var rows = Seq(("c1", "Ann", 1000000L), ("c2", "Ben", 1000000L))
    val ctx = freshCtx(vars = Map("run_ts" -> "2024-02-01 00:00:00"))
    ctx.sources.register("mongo", "b2b_core_customers_daily_snapshot")(s => {
      import s.implicits._
      rows.toDF("_id", "name", "utms")
    })
    def run(at: String): Unit = {
      val r = new DagRunner(Seq(model)).run(
        ctx.copy(vars = ctx.vars + ("run_ts" -> at)))
      r.foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }
    }
    run("2024-02-01 00:00:00")
    assert(ctx.ref("scd2_customers_snapshot").count() == 2)
    // c1's utms advances (new version), c2 hard-deleted
    rows = Seq(("c1", "Ann K", 2000000L))
    run("2024-03-01 00:00:00")
    val h = ctx.ref("scd2_customers_snapshot")
      .select($"_id", $"name", date_trunc_s($"dbt_valid_to"))
      .as[(String, String, Option[String])].collect().toSet
    assert(h.count(_._1 == "c1") == 2)                       // two versions
    assert(h.contains(("c1", "Ann K", None)))                // open new version
    assert(h.exists(r => r._1 == "c2" && r._3.isDefined))    // c2 closed out
  }

  test("timestamp strategy: versions, hard deletes, idempotent re-runs") {
    val ctx = freshCtx()
    val t = "scd2_ts"
    val strat = Scd2Strategy.Timestamp("updated_at")

    // day 1: two keys
    snap(ctx, t, Seq(
      ("k1", "a", ts("2024-01-01 00:00:00")),
      ("k2", "b", ts("2024-01-01 00:00:00"))).toDF("_id", "payload", "updated_at"),
      strat, "2024-01-01 12:00:00")
    assert(history(ctx, t) == Set(
      ("k1", "a", "2024-01-01 00:00:00", "open"),
      ("k2", "b", "2024-01-01 00:00:00", "open")))

    // day 2: k1 changed, k2 unchanged, k3 new, (nothing deleted)
    snap(ctx, t, Seq(
      ("k1", "a2", ts("2024-01-02 00:00:00")),
      ("k2", "b", ts("2024-01-01 00:00:00")),
      ("k3", "c", ts("2024-01-02 00:00:00"))).toDF("_id", "payload", "updated_at"),
      strat, "2024-01-02 12:00:00")
    assert(history(ctx, t) == Set(
      ("k1", "a", "2024-01-01 00:00:00", "2024-01-02 00:00:00"),
      ("k1", "a2", "2024-01-02 00:00:00", "open"),
      ("k2", "b", "2024-01-01 00:00:00", "open"),
      ("k3", "c", "2024-01-02 00:00:00", "open")))

    // re-run same snapshot: idempotent (updated_at not advanced)
    snap(ctx, t, Seq(
      ("k1", "a2", ts("2024-01-02 00:00:00")),
      ("k2", "b", ts("2024-01-01 00:00:00")),
      ("k3", "c", ts("2024-01-02 00:00:00"))).toDF("_id", "payload", "updated_at"),
      strat, "2024-01-02 18:00:00")
    assert(history(ctx, t).count(_._4 == "open") == 3)

    // day 3: k2 hard-deleted
    snap(ctx, t, Seq(
      ("k1", "a2", ts("2024-01-02 00:00:00")),
      ("k3", "c", ts("2024-01-02 00:00:00"))).toDF("_id", "payload", "updated_at"),
      strat, "2024-01-03 12:00:00")
    assert(history(ctx, t) == Set(
      ("k1", "a", "2024-01-01 00:00:00", "2024-01-02 00:00:00"),
      ("k1", "a2", "2024-01-02 00:00:00", "open"),
      ("k2", "b", "2024-01-01 00:00:00", "2024-01-03 12:00:00"),
      ("k3", "c", "2024-01-02 00:00:00", "open")))

    // day 4: deleted key re-appears -> fresh open row
    snap(ctx, t, Seq(
      ("k1", "a2", ts("2024-01-02 00:00:00")),
      ("k2", "b9", ts("2024-01-04 00:00:00")),
      ("k3", "c", ts("2024-01-02 00:00:00"))).toDF("_id", "payload", "updated_at"),
      strat, "2024-01-04 12:00:00")
    assert(history(ctx, t).contains(("k2", "b9", "2024-01-04 00:00:00", "open")))
    assert(history(ctx, t).size == 5)
  }

  test("bucketed snapshot: MERGE-equivalent bucket pruning + parity with full rewrite") {
    val ctx = freshCtx()
    val t = "scd2_bkt"
    val strat = Scd2Strategy.Timestamp("updated_at")
    def snapB(df: DataFrame, runTs: String): Unit =
      Scd2.snapshotBucketed(ctx, t, df, "_id", strat,
        invalidateHardDeletes = true, ts(runTs), numBuckets = 8)
    def bucketFiles(): Map[String, Set[String]] = {
      val dir = new java.io.File(ctx.warehouse.tablePath(t))
      dir.listFiles().filter(d => d.isDirectory && d.getName.startsWith(Scd2.BucketCol))
        .map(d => d.getName -> d.listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).toSet).toMap
    }
    def bucketOfKey(k: String): String = {
      val b = ctx.ref(t).filter($"_id" === k)
        .select(org.apache.spark.sql.functions.col(Scd2.BucketCol))
        .distinct().as[Int].collect()
      assert(b.length == 1); s"${Scd2.BucketCol}=${b.head}"
    }

    val day1 = Seq(
      ("k1", "a", ts("2024-01-01 00:00:00")), ("k2", "b", ts("2024-01-01 00:00:00")),
      ("k3", "c", ts("2024-01-01 00:00:00")), ("k4", "d", ts("2024-01-01 00:00:00")))
      .toDF("_id", "payload", "updated_at")
    snapB(day1, "2024-01-01 12:00:00")
    assert(history(ctx, t).size == 4)
    val afterDay1 = bucketFiles()

    // no-op increment: identical staged frame provably writes nothing
    snapB(day1, "2024-01-02 00:00:00")
    assert(bucketFiles() == afterDay1, "no-op run must not rewrite any bucket")

    // k1 changes alone: only k1's bucket partition is rewritten
    val day2 = Seq(
      ("k1", "a2", ts("2024-01-03 00:00:00")), ("k2", "b", ts("2024-01-01 00:00:00")),
      ("k3", "c", ts("2024-01-01 00:00:00")), ("k4", "d", ts("2024-01-01 00:00:00")))
      .toDF("_id", "payload", "updated_at")
    snapB(day2, "2024-01-03 12:00:00")
    val afterDay2 = bucketFiles()
    val k1b = bucketOfKey("k1")
    for ((b, files) <- afterDay1 if b != k1b)
      assert(afterDay2(b) == files, s"untouched bucket $b was rewritten")
    assert(afterDay2(k1b) != afterDay1(k1b))

    // k4 hard-deleted alone: only k4's bucket partition is rewritten
    val k4b = bucketOfKey("k4")
    val day3 = day2.filter($"_id" =!= "k4")
    snapB(day3, "2024-01-04 12:00:00")
    val afterDay3 = bucketFiles()
    for ((b, files) <- afterDay2 if b != k4b)
      assert(afterDay3(b) == files, s"untouched bucket $b was rewritten on hard delete")
    assert(history(ctx, t).contains(("k4", "d", "2024-01-01 00:00:00", "2024-01-04 12:00:00")))

    // parity: the full-rewrite path over the same staged sequence emits the
    // exact same history rows
    val ctx2 = freshCtx()
    Scd2.snapshot(ctx2, "scd2_full", day1, "_id", strat, true, ts("2024-01-01 12:00:00"))
    Scd2.snapshot(ctx2, "scd2_full", day1, "_id", strat, true, ts("2024-01-02 00:00:00"))
    Scd2.snapshot(ctx2, "scd2_full", day2, "_id", strat, true, ts("2024-01-03 12:00:00"))
    Scd2.snapshot(ctx2, "scd2_full", day3, "_id", strat, true, ts("2024-01-04 12:00:00"))
    assert(history(ctx, t) == history(ctx2, "scd2_full"))
  }

  test("check strategy on all columns: change detection without updated_at") {
    val ctx = freshCtx()
    val t = "scd2_check"
    val strat = Scd2Strategy.Check(Nil) // check_cols='all'

    snap(ctx, t, Seq(("k1", "a"), ("k2", "b")).toDF("_id", "payload"),
      strat, "2024-02-01 00:00:00", hardDeletes = false)
    snap(ctx, t, Seq(("k1", "a"), ("k2", "b2")).toDF("_id", "payload"),
      strat, "2024-02-02 00:00:00", hardDeletes = false)
    // k2 versioned at run ts; k1 untouched; hard deletes off -> nothing closes on absence
    snap(ctx, t, Seq(("k1", "a")).toDF("_id", "payload"),
      strat, "2024-02-03 00:00:00", hardDeletes = false)
    assert(history(ctx, t) == Set(
      ("k1", "a", "2024-02-01 00:00:00", "open"),
      ("k2", "b", "2024-02-01 00:00:00", "2024-02-02 00:00:00"),
      ("k2", "b2", "2024-02-02 00:00:00", "open")))
  }

  test("check strategy with explicit cols ignores other columns") {
    val ctx = freshCtx()
    val t = "scd2_check_cols"
    val strat = Scd2Strategy.Check(Seq("payload"))
    snap(ctx, t, Seq(("k1", "a", "noise1")).toDF("_id", "payload", "noise"),
      strat, "2024-03-01 00:00:00")
    // noise changes, payload doesn't -> no new version
    snap(ctx, t, Seq(("k1", "a", "noise2")).toDF("_id", "payload", "noise"),
      strat, "2024-03-02 00:00:00")
    assert(ctx.ref(t).count() == 1)
    // payload changes -> new version
    snap(ctx, t, Seq(("k1", "A", "noise2")).toDF("_id", "payload", "noise"),
      strat, "2024-03-03 00:00:00")
    assert(ctx.ref(t).count() == 2)
  }
}
