package graft

import graft.runtime._

/** Snapshot archetypes whose SOURCE is a ref'd MODEL (not a raw source) —
  * the two shapes the roster lacked — plus the check_cols='all' canonical
  * struct comparison, all executed VERBATIM from their reference files:
  *
  *  - snapshots/spark/merchant/scd2_mongo_joom_select_proposal.sql —
  *    TIMESTAMP strategy over `ref('joom_select_proposal')`, itself the
  *    VERBATIM models/spark/mongo/joom_select_proposal.sql view (TRANSFORM
  *    over array-of-struct price history, CASE-mapped enums, NAMED_STRUCT
  *    cancel_info): a two-node verbatim DAG. The SCD2 history must carry
  *    the nested array<struct> payloads through close/open untouched.
  *  - snapshots/spark/advertising/scd2_order_gross_profit_final_estimated.sql
  *    — CHECK strategy with check_cols='all' + invalidate_hard_deletes over
  *    `ref('gold_orders')`, with a `DISTRIBUTE BY ABS(HASH(order_id)) % 10`
  *    tail INSIDE the snapshot body.
  *  - snapshots/spark/referral_program/referral_bloggers_info.sql —
  *    check_cols='all' where a payload column is a STRUCT containing an
  *    ARRAY: change detection must use canonical struct comparison (equal
  *    nested values ⇒ NO new version; a nested array element change ⇒ a
  *    version).
  */
class Scd2RefSourcedRealSpec extends SparkSpec {
  import spark.implicits._

  private def snapOf(path: String): Model =
    SqlTemplater.snapshotModel(java.nio.file.Files.readString(
      java.nio.file.Paths.get(path)))

  test("REAL joom_select_proposal.sql + scd2_mongo_joom_select_proposal.sql: " +
       "timestamp snapshot over a ref'd verbatim model, struct payloads") {
    val modelSql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/mongo/joom_select_proposal.sql"))
    val model = SqlTemplater.sqlModelAuto("joom_select_proposal", modelSql)
    assert(model.materialization == Materialization.View)
    val snap = snapOf(
      "/root/reference/snapshots/spark/merchant/scd2_mongo_joom_select_proposal.sql")
    assert(snap.materialization == Materialization.Snapshot("proposal_id",
      Scd2Strategy.Timestamp("updated_time"), invalidateHardDeletes = false))
    assert(snap.fileFormat == "delta")
    assert(snap.deps == Seq("joom_select_proposal"))

    val ctx = freshCtx(vars = Map("run_ts" -> "2024-06-02 00:00:00"))
    // mongo daily snapshot rows: sh = status history (s enum, mps merchant
    // variant prices), tps = target prices, ci = cancel info (r/s enums)
    var rows: String = ""
    ctx.sources.register("mongo", "product_merchant_joom_select_proposals_daily_snapshot")(
      s => s.sql(rows))
    def run(at: String): Unit =
      new DagRunner(Seq(model, snap)).run(ctx.copy(vars = Map("run_ts" -> at)))
        .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    val p1v1 =
      """SELECT 'p1' AS _id, TIMESTAMP'2024-06-01 08:00:00' AS ct,
        |  TIMESTAMP'2024-06-01 09:00:00' AS ut, 'prod1' AS pid, 'm1' AS mid,
        |  ARRAY(NAMED_STRUCT('s', 1, 'ut', TIMESTAMP'2024-06-01 09:00:00',
        |    'mps', ARRAY(NAMED_STRUCT('vid', 'v1', 'p', '9.5')))) AS sh,
        |  ARRAY(NAMED_STRUCT('vid', 'v1', 'p', '10.25', 's', 'manual')) AS tps,
        |  CAST(NULL AS STRUCT<r: INT, s: INT>) AS ci,
        |  CAST(NULL AS TIMESTAMP) AS wbct""".stripMargin
    val p2 =
      """SELECT 'p2' AS _id, TIMESTAMP'2024-06-01 07:00:00' AS ct,
        |  TIMESTAMP'2024-06-01 07:30:00' AS ut, 'prod2' AS pid, 'm2' AS mid,
        |  ARRAY(NAMED_STRUCT('s', 3, 'ut', TIMESTAMP'2024-06-01 07:30:00',
        |    'mps', CAST(ARRAY() AS ARRAY<STRUCT<vid: STRING, p: STRING>>))) AS sh,
        |  CAST(ARRAY() AS ARRAY<STRUCT<vid: STRING, p: STRING, s: STRING>>) AS tps,
        |  NAMED_STRUCT('r', 3, 's', 2) AS ci,
        |  TIMESTAMP'2024-06-05 00:00:00' AS wbct""".stripMargin
    rows = s"$p1v1\nUNION ALL\n$p2"
    run("2024-06-02 00:00:00")

    // the ref'd VIEW itself: enum CASE mapping + DOUBLE price cast
    val v = ctx.ref("joom_select_proposal").where($"proposal_id" === "p1")
      .selectExpr("status_history[0].status",
        "status_history[0].merchant_variant_prices[0].price",
        "target_variant_prices[0].price_source").as[(String, Double, String)].head()
    assert(v == ("pending", 9.5, "manual"))
    val ci2 = ctx.ref("joom_select_proposal").where($"proposal_id" === "p2")
      .selectExpr("cancel_info.reason", "cancel_info.source").as[(String, String)].head()
    assert(ci2 == ("tooLongFulfillment", "joom"))
    assert(ctx.ref("scd2_mongo_joom_select_proposal").count() == 2)

    // run 2: p1's proposal advances (ut moves, status appends approved) —
    // the old version closes AT THE NEW updated_time; p2's ut is unchanged
    // so timestamp strategy opens nothing (and no hard-delete config means a
    // vanished row would stay open — p2 stays planted here)
    val p1v2 =
      """SELECT 'p1' AS _id, TIMESTAMP'2024-06-01 08:00:00' AS ct,
        |  TIMESTAMP'2024-06-02 10:00:00' AS ut, 'prod1' AS pid, 'm1' AS mid,
        |  ARRAY(NAMED_STRUCT('s', 1, 'ut', TIMESTAMP'2024-06-01 09:00:00',
        |    'mps', ARRAY(NAMED_STRUCT('vid', 'v1', 'p', '9.5'))),
        |    NAMED_STRUCT('s', 2, 'ut', TIMESTAMP'2024-06-02 10:00:00',
        |    'mps', ARRAY(NAMED_STRUCT('vid', 'v1', 'p', '9.0')))) AS sh,
        |  ARRAY(NAMED_STRUCT('vid', 'v1', 'p', '10.25', 's', 'manual')) AS tps,
        |  CAST(NULL AS STRUCT<r: INT, s: INT>) AS ci,
        |  CAST(NULL AS TIMESTAMP) AS wbct""".stripMargin
    rows = s"$p1v2\nUNION ALL\n$p2"
    run("2024-06-03 00:00:00")

    val h = ctx.ref("scd2_mongo_joom_select_proposal")
      .selectExpr("proposal_id", "size(status_history)",
        "status_history[size(status_history)-1].status",
        "CAST(dbt_valid_from AS STRING)", "CAST(dbt_valid_to AS STRING)")
      .as[(String, Int, String, String, Option[String])].collect().toSet
    assert(h == Set(
      ("p1", 1, "pending", "2024-06-01 09:00:00", Some("2024-06-02 10:00:00")),
      ("p1", 2, "approved", "2024-06-02 10:00:00", None),
      ("p2", 1, "cancelled", "2024-06-01 07:30:00", None)), h.toString)
    // nested struct payload survives the close untouched
    val closed = ctx.ref("scd2_mongo_joom_select_proposal")
      .where($"proposal_id" === "p1" && $"dbt_valid_to".isNotNull)
      .selectExpr("status_history[0].merchant_variant_prices[0].price")
      .as[Double].head()
    assert(closed == 9.5)
  }

  test("REAL scd2_order_gross_profit_final_estimated.sql: check_cols='all' " +
       "+ hard deletes over ref'd gold_orders, DISTRIBUTE BY in the body") {
    val snap = snapOf("/root/reference/snapshots/spark/advertising/" +
      "scd2_order_gross_profit_final_estimated.sql")
    assert(snap.materialization == Materialization.Snapshot("order_id",
      Scd2Strategy.Check(Nil), invalidateHardDeletes = true))
    assert(snap.deps == Seq("gold_orders"))

    // stand-in for the (separately verified) gold_orders model: the snapshot
    // only reads the four columns its body names
    var gold = Seq(("o1", "2024-06-01", 10.0, 12.0), ("o2", "2024-06-01", 5.0, 5.5))
    val goldStub = Model("gold_orders", ctx => {
      val s = ctx.spark; import s.implicits._
      gold.toDF("order_id", "order_date_msk",
        "order_gross_profit_final", "order_gross_profit_final_estimated")
    }, Materialization.Table())

    val ctx = freshCtx(vars = Map("run_ts" -> "2024-06-02 00:00:00"))
    def run(at: String): Unit =
      new DagRunner(Seq(goldStub, snap)).run(ctx.copy(vars = Map("run_ts" -> at)))
        .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    run("2024-06-02 00:00:00")
    assert(ctx.ref("scd2_order_gross_profit_final_estimated").count() == 2)

    // run 2: o1's estimate is re-stated (check-all detects the one changed
    // column), o2 leaves gold_orders → hard-deleted at run ts
    gold = Seq(("o1", "2024-06-01", 10.0, 13.0))
    run("2024-06-03 00:00:00")
    val h = ctx.ref("scd2_order_gross_profit_final_estimated")
      .selectExpr("order_id", "order_gross_profit_final_estimated",
        "CAST(dbt_valid_from AS STRING)", "CAST(dbt_valid_to AS STRING)")
      .as[(String, Double, String, Option[String])].collect().toSet
    assert(h == Set(
      ("o1", 12.0, "2024-06-02 00:00:00", Some("2024-06-03 00:00:00")),
      ("o1", 13.0, "2024-06-03 00:00:00", None),
      ("o2", 5.5, "2024-06-02 00:00:00", Some("2024-06-03 00:00:00"))), h.toString)
  }

  test("REAL referral_bloggers_info.sql: check_cols='all' canonical STRUCT " +
       "comparison (equal nested values open nothing; a nested array " +
       "element change opens a version)") {
    val snap = snapOf("/root/reference/snapshots/spark/referral_program/" +
      "referral_bloggers_info.sql")
    assert(snap.materialization == Materialization.Snapshot("user_id",
      Scd2Strategy.Check(Nil), invalidateHardDeletes = true))

    // `language` is planted as STRUCT<code, dialects ARRAY<STRING>> — the
    // verbatim body (`language AS language`) never constrains the type, and
    // check-all must compare it canonically, not by display string
    var rows: String = ""
    val ctx = freshCtx(vars = Map("run_ts" -> "2024-06-02 00:00:00"))
    ctx.sources.register("ads", "referral_bloggers")(s => s.sql(rows))
    def run(at: String): Unit =
      new DagRunner(Seq(snap)).run(ctx.copy(vars = Map("run_ts" -> at)))
        .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }
    def row(id: Long, code: String, dialects: String, name: String) =
      s"""SELECT ${id}L AS user_id, '$id@x.io' AS email,
         |  NAMED_STRUCT('code', '$code', 'dialects', ARRAY($dialects)) AS language,
         |  '$name' AS user_name, DATE'2024-01-01' AS created_at""".stripMargin

    rows = Seq(row(1, "en", "'us','gb'", "Ann"), row(2, "de", "'de'", "Ben"))
      .mkString("\nUNION ALL\n")
    run("2024-06-02 00:00:00")
    assert(ctx.ref("referral_bloggers_info").count() == 2)

    // run 2: byte-identical re-plant → canonical equality, NO new versions
    run("2024-06-03 00:00:00")
    val afterNoop = ctx.ref("referral_bloggers_info")
    assert(afterNoop.count() == 2, "identical structs must not open versions")
    assert(afterNoop.where($"dbt_valid_to".isNotNull).count() == 0)

    // run 3: u1's nested dialects array loses 'gb' → a version opens
    rows = Seq(row(1, "en", "'us'", "Ann"), row(2, "de", "'de'", "Ben"))
      .mkString("\nUNION ALL\n")
    run("2024-06-04 00:00:00")
    val h = ctx.ref("referral_bloggers_info")
      .selectExpr("user_id", "language.code", "size(language.dialects)",
        "CAST(dbt_valid_to AS STRING)")
      .as[(Long, String, Int, Option[String])].collect().toSet
    assert(h == Set(
      (1L, "en", 2, Some("2024-06-04 00:00:00")),
      (1L, "en", 1, None),
      (2L, "de", 1, None)), h.toString)
  }
}
