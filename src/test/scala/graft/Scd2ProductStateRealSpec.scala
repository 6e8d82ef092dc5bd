package graft

import graft.runtime._

/** The default-config mongo snapshot archetype executed VERBATIM from
  * /root/reference/snapshots/spark/b2b_mart/scd2_mongo_product_state.sql —
  * the shape most of the 34-file mongo snapshot family uses: timestamp
  * strategy over `MILLIS_TO_TS_MSK(utms)` with `invalidate_hard_deletes`
  * ABSENT, i.e. defaulting to FALSE. The semantics that distinguishes it
  * from the invalidating snapshots already on the roster: a key that
  * VANISHES from the source (mongo collection hard delete) must keep its
  * open row — `dbt_valid_to` stays NULL forever — while updates and
  * no-op re-reads behave exactly like the invalidating variant.
  * Three runs over a planted mongo mock; every validity range below is
  * hand-computed (MSK = UTC+3: 1709251200000 = 2024-03-01 00:00 UTC
  * renders as 03:00:00).
  */
class Scd2ProductStateRealSpec extends SparkSpec {
  import spark.implicits._

  private val t1 = 1709251200000L // 03:00 MSK
  private val t2 = 1709254800000L // 04:00 MSK
  private val t3 = 1709258400000L // 05:00 MSK

  private def doc(id: String, reject: Option[String], status: String, utms: Long): String = {
    val r = reject.map(s => s"'$s'").getOrElse("CAST(NULL AS STRING)")
    s"SELECT '$id' AS _id, $r AS r, '$status' AS s, CAST($utms AS BIGINT) AS utms"
  }

  test("REAL scd2_mongo_product_state.sql: timestamp strategy, hard deletes stay open") {
    val snap = SqlTemplater.snapshotModel(java.nio.file.Files.readString(
      java.nio.file.Paths.get(
        "/root/reference/snapshots/spark/b2b_mart/scd2_mongo_product_state.sql")))
    assert(snap.name == "scd2_mongo_product_state")
    // invalidate_hard_deletes is ABSENT in the file -> must parse as FALSE
    assert(snap.materialization == Materialization.Snapshot(
      "product_id", Scd2Strategy.Timestamp("update_ts_msk"),
      invalidateHardDeletes = false))

    // run 1: P1 pending, P2 approved, P3 rejected (with reason)
    var docs: Seq[String] = Seq(
      doc("P1", None, "pending", t1),
      doc("P2", None, "approved", t1),
      doc("P3", Some("bad_docs"), "rejected", t1))
    val ctx = freshCtx(vars = Map("run_ts" -> "2024-03-02 00:00:00"))
    ctx.sources.register("mongo", "b2b_product_product_states_daily_snapshot")(
      s => s.sql(docs.mkString("\nUNION ALL\n")))
    def run(at: String): Unit =
      new DagRunner(Seq(snap)).run(ctx.copy(vars = Map("run_ts" -> at)))
        .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    run("2024-03-02 00:00:00")
    assert(ctx.ref("scd2_mongo_product_state").count() == 3)

    // run 2: P1 advances (utms moves -> closed v1 + open v2); P2 is HARD
    // DELETED from the source; P3 unchanged (same utms -> no new version)
    docs = Seq(doc("P1", None, "approved", t2), docs(2))
    run("2024-03-03 00:00:00")

    val rows = ctx.ref("scd2_mongo_product_state")
      .selectExpr("product_id", "reject_reason", "status",
        "CAST(update_ts_msk AS STRING)",
        "CAST(dbt_valid_from AS STRING)", "CAST(dbt_valid_to AS STRING)")
      .as[(String, Option[String], String, String, String, Option[String])]
      .collect().toSet
    assert(rows == Set(
      // P1 v1 closed at v2's update_ts (timestamp strategy closes at the
      // NEW row's updated_at, not at run_ts)
      ("P1", None, "pending", "2024-03-01 03:00:00",
        "2024-03-01 03:00:00", Some("2024-03-01 04:00:00")),
      ("P1", None, "approved", "2024-03-01 04:00:00",
        "2024-03-01 04:00:00", None),
      // THE archetype's distinguishing row: P2 vanished from the source but
      // invalidate_hard_deletes defaults to false -> still open
      ("P2", None, "approved", "2024-03-01 03:00:00",
        "2024-03-01 03:00:00", None),
      ("P3", Some("bad_docs"), "rejected", "2024-03-01 03:00:00",
        "2024-03-01 03:00:00", None)), rows.toSeq.sortBy(r => (r._1, r._5)).mkString("\n"))

    // run 3: P2 REAPPEARS with a newer utms — the still-open row advances
    // normally (close old, open new); P1/P3 unchanged
    docs = Seq(doc("P1", None, "approved", t2), doc("P2", None, "pending", t3),
      doc("P3", Some("bad_docs"), "rejected", t1))
    run("2024-03-04 00:00:00")
    val p2 = ctx.ref("scd2_mongo_product_state")
      .where($"product_id" === "P2")
      .selectExpr("status", "CAST(dbt_valid_from AS STRING)", "CAST(dbt_valid_to AS STRING)")
      .as[(String, String, Option[String])].collect().toSet
    assert(p2 == Set(
      ("approved", "2024-03-01 03:00:00", Some("2024-03-01 05:00:00")),
      ("pending", "2024-03-01 05:00:00", None)), p2.toString)
    // P1 closed+open, P2 closed+open, P3 single open = 5 version rows
    assert(ctx.ref("scd2_mongo_product_state").count() == 5)
  }
}
