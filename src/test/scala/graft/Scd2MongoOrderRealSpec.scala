package graft

import graft.runtime._

/** The SCD2-over-`arrays_zip` archetype executed VERBATIM from its two
  * reference files, composed end-to-end:
  *
  *  - snapshots/spark/b2b_mart/scd2_orders_v2_snapshot.sql — timestamp
  *    strategy over the raw Mongo daily snapshot (`unique_key='_id'`,
  *    `updated_at=millis_to_ts_msk(utms)`, invalidate_hard_deletes);
  *  - models/spark/b2b_mart/scd2/scd2_mongo_order.sql — the downstream
  *    model: `explode(arrays_zip(state.statusHistory.status, …))` (line 31)
  *    feeding a min-substatus manufacturing roll-up, `element_at(…,
  *    array_position(…, array_max(…)))` last-status extraction, deep
  *    `roleSet.roles.*.moderatorId` struct access, and passthrough of all
  *    four dbt snapshot meta columns (dbt_scd_id / dbt_updated_at /
  *    dbt_valid_from / dbt_valid_to).
  *
  * Two snapshot runs over a planted Mongo mock; every output cell below is
  * hand-computed, including the SCD2 validity ranges.
  */
class Scd2MongoOrderRealSpec extends SparkSpec {
  import spark.implicits._

  // history timestamps (epoch millis); MSK = UTC+3, so 1709251200000
  // (2024-03-01 00:00 UTC) renders as 2024-03-01 03:00:00
  private val t10  = 1709251200000L // 03:00 MSK — status 10
  private val t20a = 1709254800000L // 04:00 MSK — status 20, subStatus 201
  private val t20b = 1709258400000L // 05:00 MSK — status 20, subStatus 202
  private val t30  = 1709262000000L // 06:00 MSK — status 30 (o2)
  private val t30b = 1709265600000L // 07:00 MSK — status 30 (o1 run 2)

  private def hist(entries: (Int, Option[Int], Long)*): String =
    entries.map { case (st, sub, ts) =>
      val subSql = sub.map(_.toString).getOrElse("CAST(NULL AS INT)")
      s"named_struct('status', $st, 'subStatus', $subSql, 'updatedTimeMs', CAST($ts AS BIGINT))"
    }.mkString("array(", ", ", ")")

  /** One raw Mongo order document with every column the snapshot selects. */
  private def mongoOrder(id: String, utms: Long, histSql: String,
                         tagsSql: String): String =
    s"""SELECT
       |  '$id' AS _id,
       |  'br-1' AS brokerId,
       |  CAST(0.05 AS DOUBLE) AS comissionRate,
       |  CAST($t10 AS BIGINT) AS ctms,
       |  named_struct('clientCcy', 'USD') AS currencies,
       |  named_struct('usd', CAST(1.0 AS DOUBLE)) AS currencyRates,
       |  'deal-$id' AS dealID,
       |  0 AS deliveryScheme,
       |  14 AS deliveryTimeDays,
       |  'order $id' AS descr,
       |  'F-$id' AS friendlyId,
       |  'i-$id' AS interactionId,
       |  'lh-1' AS linehaulChannelID,
       |  named_struct('sum', 100) AS otherPrices,
       |  named_struct('advancePercent', 50, 'clientCurrency', 'USD',
       |    'completePaymentAfter', 10, 'paymentChannel', 1, 'paymentType', 'wire',
       |    'paymentWithinDaysAdvance', 5, 'paymentWithinDaysComplete', 30) AS payment,
       |  'req-$id' AS popupReqId,
       |  named_struct('total', 100) AS prices,
       |  named_struct('roles', named_struct(
       |    'owner',       named_struct('moderatorId', 'own-$id'),
       |    'customs',     named_struct('moderatorId', 'cus-$id'),
       |    'logistician', named_struct('moderatorId', 'log-$id'),
       |    'bizDev',      named_struct('moderatorId', 'biz-$id'),
       |    'lawyer',      named_struct('moderatorId', 'law-$id'))) AS roleSet,
       |  named_struct('rejectReason', CAST(NULL AS STRING),
       |    'statusHistory', $histSql) AS state,
       |  $tagsSql AS tags,
       |  CAST($utms AS BIGINT) AS utms,
       |  named_struct('deviceId', 'dev-$id', 'Id', 'user-$id') AS csmr""".stripMargin

  test("REAL scd2_offer_products_snapshot.sql: explicit check_cols list + raw catalog body") {
    // check_cols = 5 named columns (not 'all'): a change OUTSIDE the list
    // must NOT open a new version (and the surviving row keeps the OLD
    // payload); the body reads mongo.* as a RAW catalog table and derives
    // created_time_msk = millis_to_ts_msk(ctms+1)
    val snap = SqlTemplater.snapshotModel(java.nio.file.Files.readString(
      java.nio.file.Paths.get(
        "/root/reference/snapshots/spark/b2b_mart/scd2_offer_products_snapshot.sql")))
    assert(snap.materialization == Materialization.Snapshot("offer_product_id",
      Scd2Strategy.Check(Seq("created_time_msk", "product_id", "offer_id",
        "disabled", "type")), invalidateHardDeletes = true))

    val ctx = freshCtx(vars = Map("run_ts" -> "2024-06-02 00:00:00"))
    val dbLoc = TempDirs.create("graft_mongodb2")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS mongo LOCATION '$dbLoc'")
    def plant(tm1: String, dis2: Boolean): Unit =
      spark.sql(
        s"""SELECT 'OP1' AS _id, 'P1' AS id, 'O1' AS offerId, '$tm1' AS trademark,
           |  'HS' AS hsCode, 'M1' AS manufacturerId, 'N' AS name, 'NI' AS nameInv,
           |  't' AS type, false AS disabled, 'L' AS link,
           |  named_struct('isCertificationRequired', true,
           |    'isAgencyRegistrationRequired', false, 'agencyName', 'AG') AS logisticFields,
           |  1717243200000L AS ctms
           |UNION ALL
           |SELECT 'OP2', 'P2', 'O1', 'TM', 'HS', 'M1', 'N2', 'NI2', 't',
           |  $dis2, 'L2',
           |  named_struct('isCertificationRequired', false,
           |    'isAgencyRegistrationRequired', false, 'agencyName', 'AG'),
           |  1717243200000L""".stripMargin)
        .write.mode("overwrite").option("path", s"$dbLoc/b2b_core_offer_products_daily_snapshot")
        .saveAsTable("mongo.b2b_core_offer_products_daily_snapshot")
    try {
      plant("TM", dis2 = false)
      def run(at: String): Unit =
        new DagRunner(Seq(snap)).run(ctx.copy(vars = Map("run_ts" -> at)))
          .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }
      run("2024-06-02 00:00:00")
      assert(ctx.ref("scd2_offer_products_snapshot").count() == 2)

      // run 2: OP1 changes only trademark (NOT in check_cols) -> no new
      // version, OLD payload survives; OP2 flips disabled (IS in the list)
      plant("TM-CHANGED", dis2 = true)
      run("2024-06-03 00:00:00")
      val h = ctx.ref("scd2_offer_products_snapshot")
        .selectExpr("offer_product_id", "trademark", "disabled",
          "CAST(created_time_msk AS STRING)", "CAST(dbt_valid_to AS STRING)")
        .as[(String, String, Boolean, String, Option[String])].collect().toSet
      assert(h == Set(
        ("OP1", "TM", false, "2024-06-01 15:00:00.001", None), // untouched
        ("OP2", "TM", false, "2024-06-01 15:00:00.001", Some("2024-06-03 00:00:00")),
        ("OP2", "TM", true, "2024-06-01 15:00:00.001", None)), h.toString)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS mongo CASCADE")
    }
  }

  test("REAL scd2_orders_v2_snapshot.sql + scd2_mongo_order.sql: two-run SCD2, arrays_zip roll-up") {
    val snapModel = SqlTemplater.snapshotModel(java.nio.file.Files.readString(
      java.nio.file.Paths.get(
        "/root/reference/snapshots/spark/b2b_mart/scd2_orders_v2_snapshot.sql")))
    assert(snapModel.name == "scd2_orders_v2_snapshot")
    assert(snapModel.materialization == Materialization.Snapshot(
      "_id", Scd2Strategy.Timestamp("update_ts_msk"), invalidateHardDeletes = true))

    val model = SqlTemplater.sqlModelAuto("scd2_mongo_order",
      java.nio.file.Files.readString(java.nio.file.Paths.get(
        "/root/reference/models/spark/b2b_mart/scd2/scd2_mongo_order.sql")))
    assert(model.deps.contains("scd2_orders_v2_snapshot"))

    // run 1: o1 mid-manufacturing, o2 never manufactured, o3 manufactured
    // with NULL subStatus (coalesce falls back to the status code)
    var docs: Seq[String] = Seq(
      mongoOrder("o1", t30, hist((10, None, t10), (20, Some(201), t20a),
        (20, Some(202), t20b)), "array('repeated_order')"),
      mongoOrder("o2", t20b, hist((10, None, t10), (30, Some(302), t30)),
        "array('fresh')"),
      mongoOrder("o3", t20a, hist((20, None, t20b)), "array('fresh')"))

    val ctx = freshCtx(vars = Map("run_ts" -> "2024-03-02 00:00:00"))
    ctx.sources.register("mongo", "b2b_core_orders_v2_daily_snapshot")(
      s => s.sql(docs.mkString("\nUNION ALL\n")))

    def run(at: String): Unit =
      new DagRunner(Seq(snapModel, model))
        .run(ctx.copy(vars = ctx.vars + ("run_ts" -> at)))
        .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }

    run("2024-03-02 00:00:00")
    assert(ctx.ref("scd2_mongo_order").count() == 3)

    // run 2: o1 advances to status 30 (utms moves -> new SCD2 version);
    // o2 / o3 unchanged (same utms -> no new version, NOT hard-deleted)
    docs = Seq(
      mongoOrder("o1", t30b, hist((10, None, t10), (20, Some(201), t20a),
        (20, Some(202), t20b), (30, Some(301), t30b)), "array('repeated_order')"),
      docs(1), docs(2))
    run("2024-03-03 00:00:00")

    val out = ctx.ref("scd2_mongo_order")
    assert(out.count() == 4) // o1 closed + o1 open + o2 + o3

    val rows = out.selectExpr(
      "order_id", "CAST(created_ts_msk AS STRING)", "CAST(update_ts_msk AS STRING)",
      "ccy", "delivery_time_days", "friendly_id", "device_id", "user_id",
      "owner_id", "lawyer_id", "last_order_status", "last_order_sub_status",
      "CAST(min_manufactured_ts_msk AS STRING)", "repeated_order",
      "CAST(dbt_valid_from AS STRING)", "CAST(dbt_valid_to AS STRING)")
      .as[(String, String, String, String, Int, String, String, String, String,
        String, Int, Option[Int], Option[String], Boolean, String, Option[String])]
      .collect().toSet

    // manufacturing roll-up, hand-tallied:
    //  o1: status-20 rows (201@04:00, 202@05:00) -> min sub 201 -> 04:00
    //  o2: no status-20 row -> NULL
    //  o3: single (NULL sub -> falls back to 20)@05:00 -> 05:00
    // last status = entry at array_max(updatedTimeMs) of the version's history
    assert(rows == Set(
      ("o1", "2024-03-01 03:00:00", "2024-03-01 06:00:00", "USD", 14, "F-o1",
        "dev-o1", "user-o1", "own-o1", "law-o1", 20, Some(202),
        Some("2024-03-01 04:00:00"), true,
        "2024-03-01 06:00:00", Some("2024-03-01 07:00:00")), // closed v1
      ("o1", "2024-03-01 03:00:00", "2024-03-01 07:00:00", "USD", 14, "F-o1",
        "dev-o1", "user-o1", "own-o1", "law-o1", 30, Some(301),
        Some("2024-03-01 04:00:00"), true,
        "2024-03-01 07:00:00", None),                        // open v2
      ("o2", "2024-03-01 03:00:00", "2024-03-01 05:00:00", "USD", 14, "F-o2",
        "dev-o2", "user-o2", "own-o2", "law-o2", 30, Some(302),
        None, false,
        "2024-03-01 05:00:00", None),
      ("o3", "2024-03-01 03:00:00", "2024-03-01 04:00:00", "USD", 14, "F-o3",
        "dev-o3", "user-o3", "own-o3", "law-o3", 20, None,
        Some("2024-03-01 05:00:00"), false,
        "2024-03-01 04:00:00", None)), rows.toSeq.sortBy(r => (r._1, r._15)).mkString("\n"))

    // dbt snapshot meta columns ride through the model verbatim:
    // dbt_updated_at mirrors dbt_valid_from; dbt_scd_id is unique per version
    val meta = out.selectExpr("dbt_scd_id",
      "dbt_updated_at = dbt_valid_from AS upd_eq").collect()
    assert(meta.forall(r => r.getString(0) != null && r.getString(0).length == 32))
    assert(meta.map(_.getString(0)).distinct.length == 4)
    assert(meta.forall(_.getBoolean(1)))
  }
}
