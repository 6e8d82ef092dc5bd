package graft

import graft.runtime._

/** models/spark/b2b_mart/forecast_warehousing.sql executed VERBATIM — the
  * round-11 "occurrence-scoped type" gap model. Its load-bearing shape:
  * `packaging.phases` is a MAP whose value is an ARRAY OF STRUCTS, read
  * through VECTORIZED field extraction — `explode(phases)` under a
  * `packaging.*` star (:118-125), then `lateral view posexplode(value.l) n
  * as n, length` (:127) where `value.l` is the array-of-structs' extracted
  * l-column (an ARRAY), and `value.operationalProductId[n]` / `(value.w)[n]`
  * (:109-114) index the sibling extracted arrays by the posexplode POSITION
  * — while the very same leaf name `operationalProductId` is a plain SCALAR
  * field of the pickup snapshot's `boxes` element struct (:42, :134). Also
  * covered: the synthesized per-channel 'manufacturing' SLA row (:29-34),
  * the `||`-concat NOT IN dedup between pickup and order boxes (:159-161),
  * the milestone-map explode with value-non-null filter and a 3-column
  * USING join (:222-242), the status union + rn=1 latest-status pick
  * (:313-324), the `days`-alias shadowing case cascade over the SLA join
  * (:402-408), past/future day accumulation windows (:386-394), and the
  * rn=1 order-level MAX windows with `date_add(date_status, int(day_diff))`
  * prediction (:352-358).
  *
  * Hand-computed trace (single order o1, channel 'air', two box products):
  * the rn=1 status is 'shipping' (status_int 3000, date 2024-02-01); with
  * D = datediff(current_date, 2024-02-01): day_diff = D (only the shipping
  * SLA row is `future`), current_status_days = 549 + D (549 =
  * datediff(2024-02-01, 2022-08-01)), declared = 3 + D + 14 + 8 (all four
  * SLA rows are `past`; manufacturing contributes manufacturing_days 14,
  * psi its raw 8), and predicted_date_order = date_add(2024-02-01, D) =
  * current_date. current_date makes the model inherently clock-relative;
  * the spec computes the same D from the session clock. */
class ForecastWarehousingRealSpec extends SparkSpec {
  import spark.implicits._

  private def msOf(mskWall: String): Long =
    (java.time.Instant.parse(mskWall.replace(' ', 'T') + "Z").getEpochSecond - 10800L) * 1000L

  test("REAL forecast_warehousing.sql: map-of-array-of-struct phases, posexplode " +
       "position indexing, pickup-vs-order box dedup, SLA day cascade") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/b2b_mart/forecast_warehousing.sql"))
    val ctx = freshCtx(vars = Map("start_date_ymd" -> "2024-06-01"))

    // SLA grid for one channel; the model adds ('air','manufacturing',2050,0)
    ctx.warehouse.createTable("sla_days", Seq(
      ("air", "clientPayment", 2000, 3),
      ("air", "shipping", 3000, 10),
      ("air", "psi", 2065, 8))
      .toDF("linehaul_channel", "status", "status_int", "days"))

    // pickup snapshot: ONE live row; its boxes element struct carries the
    // SCALAR operationalProductId occurrence (product opA, dims 4×2×1)
    ctx.warehouse.createTable("scd2_pick_up_orders_snapshot", spark.sql(
      s"""SELECT 'pk1' AS _id, 'PK-1' AS friendlyId, 'o1' AS orderId,
         |  'mo1' AS merchOrdId,
         |  ${msOf("2024-01-20 12:00:00")}L AS arrivedDate,
         |  ${msOf("2024-01-18 12:00:00")}L AS pickUpDate,
         |  ${msOf("2024-01-17 12:00:00")}L AS plannedDate,
         |  ${msOf("2024-01-21 12:00:00")}L AS shippedDate,
         |  array(named_struct('operationalProductId', 'opA',
         |    'l', 4.0D, 'w', 2.0D, 'h', 1.0D, 'weight', 5.0D,
         |    'qty', 20, 'qtyPerBox', 10)) AS boxes,
         |  CAST(NULL AS TIMESTAMP) AS dbt_valid_to""".stripMargin))

    ctx.warehouse.createTable("fact_order", spark.sql(
      """SELECT 'u1' AS user_id, 'o1' AS order_id, 'O-1' AS friendly_id,
        |  TIMESTAMP('2024-01-10 00:00:00') AS created_ts_msk,
        |  TIMESTAMP('2022-08-01 00:00:00') AS min_manufactured_ts_msk,
        |  'lh1' AS linehaul_channel_id,
        |  CAST(NULL AS TIMESTAMP) AS next_effective_ts_msk""".stripMargin))

    ctx.warehouse.createTable("fact_customers",
      Seq(("u1", "DE")).toDF("user_id", "country"))
    ctx.warehouse.createTable("linehaul_channels",
      Seq(("lh1", "air")).toDF("id", "channel_type"))

    ctx.warehouse.createTable("fact_merchant_order", spark.sql(
      """SELECT 'o1' AS order_id, 'mo1' AS merchant_order_id,
        |  14 AS manufacturing_days, 'MO-1' AS friendly_id,
        |  CAST(NULL AS TIMESTAMP) AS next_effective_ts_msk""".stripMargin))

    ctx.warehouse.createTable("dim_deal_products",
      Seq(("o1", "op1", "DE")).toDF("order_id", "order_product_id", "country"))

    // milestone dates: only clientPayment + manufacturing non-null survive
    // the explode(map(...)) value-IS-NOT-NULL filter
    ctx.warehouse.createTable("jp_sla_production", spark.sql(
      """SELECT 'op1' AS order_product_id, 14 AS manufacturing_days,
        |  'o1' AS order_id, 'mo1' AS merchant_order_id,
        |  TIMESTAMP('2024-01-11 00:00:00') AS client_to_broker_payment_sent,
        |  CAST(NULL AS TIMESTAMP) AS advance_payment_requested,
        |  TIMESTAMP('2024-01-15 00:00:00') AS product_manufacturing,
        |  CAST(NULL AS TIMESTAMP) AS psi,
        |  CAST(NULL AS TIMESTAMP) AS psi_failed_time,
        |  CAST(NULL AS TIMESTAMP) AS remaining_payment_requested""".stripMargin))

    ctx.warehouse.createTable("fact_order_statuses_change", spark.sql(
      """SELECT 'o1' AS order_id, TIMESTAMP('2024-02-01 10:00:00') AS event_ts_msk,
        |  'shipping' AS sub_status, 'shipping' AS status""".stripMargin))

    // the ARRAY occurrence: phases = MAP<key, ARRAY<STRUCT{...}>>; field
    // extraction over the array vectorizes, so value.l IS an array for
    // posexplode and value.operationalProductId[n] indexes by position
    ctx.sources.register("mongo", "b2b_core_order_products_daily_snapshot")(s => s.sql(
      """SELECT 1L AS ctms, 'mo1' AS merchOrdId, 'p1' AS id,
        |  named_struct('phases', map('ph1', array(named_struct(
        |    'l', 2.0D, 'w', 1.0D, 'h', 0.5D, 'weight', 3.0D,
        |    'qty', 10, 'qtyPerBox', 5, 'operationalProductId', 'opA'
        |  )))) AS packaging""".stripMargin))

    val model = SqlTemplater.sqlModelAuto("forecast_warehousing", sql)
    assert(model.materialization.isInstanceOf[Materialization.IncrementalInsertOverwrite])
    assert(model.materialization.asInstanceOf[Materialization.IncrementalInsertOverwrite]
      .partitionBy == Seq("partition_date_msk"))
    assert(model.deps.toSet == Set("sla_days", "scd2_pick_up_orders_snapshot",
      "fact_order", "fact_customers", "linehaul_channels", "fact_merchant_order",
      "dim_deal_products", "jp_sla_production", "fact_order_statuses_change"))

    for ((n, st) <- new DagRunner(Seq(model)).run(ctx,
        selectors = Seq("forecast_warehousing")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val out = ctx.ref("forecast_warehousing")
    // D is clock-relative (the model reads current_date); recompute it the
    // same way from the session's UTC clock
    val d = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(2024, 2, 1),
      java.time.LocalDate.now(java.time.ZoneOffset.UTC))
    val today = java.time.LocalDate.now(java.time.ZoneOffset.UTC).toString

    val rows = out.selectExpr("order_id", "order_friendly_id", "channel_type",
      "CAST(order_created_time AS STRING)", "CAST(min_manufacturing_time AS STRING)",
      "merchant_order_id", "merchant_order_friendly_id", "manufacturing_days",
      "product_id", "pickup_id", "pickup_friendly_id", "status", "status_int",
      "CAST(date_status AS STRING)", "length", "width", "hight", "weight",
      "CAST(qty AS INT)", "CAST(qty_per_box AS INT)", "measures",
      "CAST(day_diff AS LONG)", "status_order", "status_int_order",
      "CAST(date_status_order AS STRING)", "CAST(day_diff_order AS LONG)",
      "CAST(predicted_date_order AS STRING)", "CAST(current_status_days AS LONG)",
      "CAST(current_status_declared_days AS LONG)", "country",
      "CAST(partition_date_msk AS STRING)")
      .collect().map(r => r.getString(8) -> r.toSeq).toMap

    assert(rows.size == 2, rows.keys.toString)
    // pickup-sourced box (product opA, pickup attached, dims 4×2×1)
    assert(rows("opA") == Seq("o1", "O-1", "air", "2024-01-10 00:00:00",
      "2022-08-01 00:00:00", "mo1", "MO-1", 14, "opA", "pk1", "PK-1",
      "shipping", 3000, "2024-02-01", 4.0, 2.0, 1.0, 5.0, 20, 10, 8.0e-6,
      d, "shipping", 3000, "2024-02-01", d, today, 549L + d, 25L + d,
      "DE", "2024-06-01"), rows("opA").toString)
    // order-sourced box (mongo id p1, no pickup, survives the ||-concat
    // NOT IN because 'mo1p1' is absent from the pickup set)
    assert(rows("p1") == Seq("o1", "O-1", "air", "2024-01-10 00:00:00",
      "2022-08-01 00:00:00", "mo1", "MO-1", 14, "p1", null, null,
      "shipping", 3000, "2024-02-01", 2.0, 1.0, 0.5, 3.0, 10, 5, 1.0e-6,
      d, "shipping", 3000, "2024-02-01", d, today, 549L + d, 25L + d,
      "DE", "2024-06-01"), rows("p1").toString)
  }
}
