package graft

import org.apache.spark.sql.DataFrame
import graft.runtime._

/** A REAL three-model DAG of reference files, executed verbatim in one run:
  *
  *   key_payment_status.sql (literal dim)
  *     └─> production_stream_metrics.sql (705 LoC)
  *   fact_order_change.sql (443 LoC, from the operational-events source)
  *     └─> production_stream_metrics.sql
  *
  * production_stream_metrics explodes the merchant-order payment status
  * history, decodes it through the key dim, folds per-status MIN dates with
  * a first_value last-status window, unions a hand-maintained literal
  * backfill block (dd.MM.yyyy dates), and joins order status transitions
  * from fact_order_change — all semantics asserted on planted histories.
  * Run under the reference's non-ANSI dialect (to_date('') must yield NULL,
  * empty arrays index to NULL). */
class ProductionStreamRealSpec extends SparkSpec {
  import spark.implicits._

  private def file(p: String): String =
    java.nio.file.Files.readString(java.nio.file.Paths.get(
      s"/root/reference/models/spark/b2b_mart/$p"))

  /** operational_events mock: enough payload shape for fact_order_change
    * (prices/currencies all NULL — the explode chain keeps the rows), four
    * status-transition events across two orders. */
  private def operationalEvents: DataFrame = spark.sql(
    """SELECT
      |  concat('e', i) AS event_id,
      |  element_at(array(DATE'2024-03-10', DATE'2024-03-12', DATE'2024-03-20',
      |                   DATE'2024-03-11'), i) AS partition_date,
      |  CAST(element_at(array(DATE'2024-03-10', DATE'2024-03-12', DATE'2024-03-20',
      |                        DATE'2024-03-11'), i) AS STRING) || ' 10:00:00' AS event_ts_msk,
      |  'orderChangedByAdmin' AS type,
      |  named_struct(
      |    'orderId', IF(i <= 3, 'o1', 'o2'),
      |    'updatedTime', 1710064800000,
      |    'clientCurrency', 'USD',
      |    'reason', 'statusChange',
      |    'status', element_at(array('signing', 'manufacturing', 'shipping',
      |                               'manufacturing'), i),
      |    'subStatus', element_at(array('signingAndPayment', 'qc',
      |                                  CAST(NULL AS STRING), CAST(NULL AS STRING)), i),
      |    'currencies', CAST(NULL AS STRUCT<
      |      rates: MAP<STRING, STRUCT<exchangeRate: DOUBLE, markupRate: DOUBLE>>,
      |      companyRates: MAP<STRING, STRUCT<exchangeRate: DOUBLE, markupRate: DOUBLE>>>),
      |    'typedPricesOriginal', CAST(NULL AS ARRAY<STRUCT<
      |      type: STRING, tag: STRING, stagedPrices: ARRAY<STRUCT<
      |        stage: STRING, multiPrice: ARRAY<STRUCT<amount: DOUBLE, ccy: STRING>>>>>>),
      |    'otherPricesOriginal', CAST(NULL AS ARRAY<STRUCT<
      |      type: STRING, tag: STRING, stagedPrices: ARRAY<STRUCT<
      |        stage: STRING, multiPrice: ARRAY<STRUCT<amount: DOUBLE, ccy: STRING>>>>>>),
      |    'roleSet', named_struct('roles', named_struct(
      |      'owner', named_struct(
      |        'actualisationTime', named_struct('time', 1710000000000, 'type', 'auto'),
      |        'moderatorId', 'm1', 'roleType', 'admin'),
      |      'bizDev', named_struct(
      |        'actualisationTime', named_struct('time', CAST(NULL AS BIGINT),
      |          'type', CAST(NULL AS STRING)),
      |        'moderatorId', CAST(NULL AS STRING), 'roleType', CAST(NULL AS STRING)))),
      |    'gmv', named_struct('clientConvertedGMV', 100.0D, 'finalGMV', 100.0D,
      |      'finalGrossProfit', 10.0D, 'initialGrossProfit', 10.0D)
      |  ) AS payload
      |FROM (SELECT explode(sequence(1, 4)) AS i)""".stripMargin)

  /** merchant-order snapshot with planted payment histories (millis at UTC
    * midnight; MSK = UTC+3 keeps the calendar date). */
  private def merchantOrders: DataFrame = {
    def ms(day: Int): Long = 1710028800000L + day * 86400000L // 2024-03-10 + day
    spark.sql(
      s"""SELECT * FROM VALUES
         |  ('MO1', 'FM1', 'o1', 'm1', 10, 2, named_struct('paymentStatusHistory', array(
         |     named_struct('paymentStatus', 10, 'statusDate', ${ms(0)}L, 'utms', ${ms(0)}L),
         |     named_struct('paymentStatus', 20, 'statusDate', ${ms(1)}L, 'utms', ${ms(1)}L),
         |     named_struct('paymentStatus', 27, 'statusDate', ${ms(3)}L, 'utms', ${ms(3)}L),
         |     named_struct('paymentStatus', 80, 'statusDate', CAST(NULL AS BIGINT), 'utms', ${ms(15)}L)))),
         |  ('MO2', 'FM2', 'o2', 'm2', 5, 1, named_struct('paymentStatusHistory', array(
         |     named_struct('paymentStatus', 10, 'statusDate', ${ms(1)}L, 'utms', ${ms(1)}L),
         |     named_struct('paymentStatus', 20, 'statusDate', ${ms(2)}L, 'utms', ${ms(2)}L))))
         |  AS t(_id, friendlyId, orderId, merchantId, manDays, daysAfterQC, payment)""".stripMargin)
  }

  test("REAL 3-model DAG: key_payment_status + fact_order_change -> production_stream_metrics") {
    val ctx = freshCtx(vars = Map(
      "start_date_ymd" -> "2024-03-01", "end_date_ymd" -> "2024-04-01"))
    ctx.sources.register("b2b_mart", "operational_events")(_ => operationalEvents)
    ctx.sources.register("mongo", "b2b_core_merchant_orders_v2_daily_snapshot")(_ => merchantOrders)
    // fact_order is outside this slice: mock its current-state rows
    ctx.warehouse.createTable("fact_order", Seq(
      ("o1", "shipping", null, null), ("o2", "manufacturing", null, null))
      .toDF("order_id", "last_order_status", "last_order_sub_status", "ts")
      .selectExpr("order_id", "last_order_status", "last_order_sub_status",
        "CAST(ts AS TIMESTAMP) AS next_effective_ts_msk"))

    val models = Seq(
      SqlTemplater.sqlModelAuto("key_payment_status", file("key/key_payment_status.sql")),
      SqlTemplater.sqlModelAuto("fact_order_change", file("fact/fact_order_change.sql")),
      SqlTemplater.sqlModelAuto("production_stream_metrics", file("production_stream_metrics.sql")))
    assert(models.last.deps.toSet ==
      Set("key_payment_status", "fact_order_change", "fact_order"))

    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      for ((n, st) <- new DagRunner(models).run(ctx))
        assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)

    val out = ctx.ref("production_stream_metrics").cache()
    def row(mo: String) = out.filter($"merchant_order_id" === mo)
    def s(mo: String, c: String): String = {
      val v = row(mo).selectExpr(s"CAST($c AS STRING)").collect().head.getString(0)
      if (v == null) "null" else v
    }
    // MO1: full planted history decoded through the REAL key dim
    assert(s("MO1", "no_operations_started") == "2024-03-10")
    assert(s("MO1", "advance_payment_requested") == "2024-03-11")
    assert(s("MO1", "advance_payment_acquired") == "2024-03-13")
    assert(s("MO1", "merchant_acquired_payment") == "2024-03-25") // utms fallback
    assert(s("MO1", "last_payment_status") == "merchantAcquiredPayment")
    // order statuses flowed from the REAL fact_order_change output
    assert(s("MO1", "signing_and_payment") == "2024-03-10")
    assert(s("MO1", "manufacturing") == "2024-03-12")
    assert(s("MO1", "claim") == "shipping")     // shipping set, nothing later
    assert(s("MO1", "status") == "shipping")    // from the fact_order mock
    assert(s("MO1", "payment_type") == "advance")
    assert(s("MO2", "claim") == "manufacturing")
    assert(s("MO2", "merchant_acquired_payment") == "null")
    // the hand-maintained literal backfill block parses its dd.MM.yyyy dates
    val backfill = out.filter($"merchant_order_id" === "XN2QX_XE6J3")
      .selectExpr("CAST(advance_payment_requested AS STRING)").as[String].collect()
    assert(backfill.toSeq == Seq("2022-07-15"), backfill.mkString(","))
    out.unpersist()
  }
}
