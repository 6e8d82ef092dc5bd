package graft

import graft.runtime._

/** models/spark/b2b_mart/fact/fact_deals_with_requests.sql executed VERBATIM
  * — the 320-line VIEW whose negotiation gap starved 17 nodes in round 11,
  * now also proven directly on planted real-shaped fixtures. Semantics under
  * test: the 14-user literal Test blocklist overriding status (:22-37), the
  * 17-reason Cancelled status-group fold (:40-50), per-request variant
  * windows (`variantsCart` counts only positive-qty variants, :88-95),
  * micro-unit price scaling where `qty * ddpPerItem / 1e6` must read the RAW
  * column, not the same-select alias (:97-107 — Spark's lateral-column-alias
  * rule gives real input columns priority), the GROUP BY ALL deal rollup
  * with deferred-payment EXW splits (`exw*100/105` / `exw/105` into `other`,
  * :151-152), the sample-DDP fallback into `ddp` and the three-arm
  * `ddp_currency` MAX (:153-154), flag MAXes incl. the `standart OR all-false`
  * arm (:155-161), rn=1 latest order_change attach (:192-210), the
  * deal_type cascade ending in the BR/MX VIP rule gated on a `%sample%`
  * name (:255-262), ddp→USD via the currency-rate date join (:281, :320),
  * and the per-user deal sequence window (:315). A second input-priority
  * subtlety: the Cancelled fold's `status IN (...)` (:41) reads the RAW
  * status column, NOT the blocklist-rewritten alias defined four lines
  * above it — a blocklisted user's deal keeps its real status group.
  *
  * Fixture: D1 (BR, deferred, one request with a priced variant + a
  * zero-total sample variant) lands VIP with other=20, exw=1000, ddp=50,
  * ddp_currency USD, ddp_usd 55; D2 (MX, name contains 'sample', status
  * Other) folds to Cancelled/Other-type with all-null request aggregates;
  * D3's user is the blocklist entry → status Test → Cancelled. Date,
  * RU-country and closed-SCD2 rows are filtered (:66-68). */
class FactDealsWithRequestsRealSpec extends SparkSpec {
  import spark.implicits._

  test("REAL fact_deals_with_requests.sql: Test blocklist, cancelled fold, " +
       "deferred exw split, sample ddp fallback, VIP cascade, usd join") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/b2b_mart/fact/fact_deals_with_requests.sql"))
    val ctx = freshCtx()

    def deal(id: String, user: String, name: String, pay: String, friendly: String,
             country: String, status: String, created: String, order: String,
             nextEff: String) =
      s"""SELECT '$id' AS deal_id, '$user' AS user_id, '$name' AS deal_name,
         |  '$pay' AS payment_method, '$friendly' AS issue_friendly_id,
         |  '$country' AS country, false AS self_service, false AS ss_customer,
         |  '$status' AS status, 100 AS status_int,
         |  CAST(NULL AS STRING) AS reject_reason,
         |  TIMESTAMP('$created') AS created_ts_msk, $order AS order_id,
         |  'ow1' AS owner_id, TIMESTAMP('2024-05-02 09:00:00') AS owner_ts,
         |  'ow@x' AS owner_email, CAST(NULL AS STRING) AS reject_reason_comment,
         |  1000.0D AS estimated_gmv, false AS small_batch, 'PC' AS promo_code,
         |  5.0D AS promo_code_discount, 'pct' AS promo_code_type,
         |  $nextEff AS next_effective_ts_msk""".stripMargin
    val nullTs = "CAST(NULL AS TIMESTAMP)"
    ctx.warehouse.createTable("fact_deals", spark.sql(Seq(
      deal("D1", "u1", "My Deal", "deferred", "DL-1", "BR", "InProgress",
        "2024-05-01 10:00:00", "'o1'", nullTs),
      deal("D2", "u1", "sample pack", "upfront", "DL-2", "MX", "Other",
        "2024-06-01 10:00:00", "CAST(NULL AS STRING)", nullTs),
      deal("D3", "6050ddece1fffe0006ee7d80", "x", "upfront", "DL-3", "MX",
        "InProgress", "2024-06-02 10:00:00", "CAST(NULL AS STRING)", nullTs),
      deal("D4", "u4", "too old", "upfront", "DL-4", "MX", "InProgress",
        "2024-03-01 10:00:00", "CAST(NULL AS STRING)", nullTs),
      deal("D5", "u5", "ru", "upfront", "DL-5", "RU", "InProgress",
        "2024-05-01 10:00:00", "CAST(NULL AS STRING)", nullTs),
      deal("D6", "u6", "closed", "upfront", "DL-6", "MX", "InProgress",
        "2024-05-01 10:00:00", "CAST(NULL AS STRING)",
        "TIMESTAMP('2024-05-02 00:00:00')")).mkString("\nUNION ALL\n")))

    ctx.warehouse.createTable("fact_customer_requests", spark.sql(
      """SELECT 'cr1' AS customer_request_id, 'D1' AS deal_id, false AS manual,
        |  true AS standart_deal, false AS rfq_deal, false AS sample,
        |  'cat' AS category_name, CAST(NULL AS TIMESTAMP) AS next_effective_ts_msk""".stripMargin))

    // v1: priced (total 30, EUR); v2: zero-total sample (sample_ddp 20, USD)
    ctx.warehouse.createTable("fact_customer_requests_variants", spark.sql(
      """SELECT 'cr1' AS customer_request_id, 'p1' AS sub_product_id,
        |  '10' AS expectedQuantity, 1 AS sample_type,
        |  2000000L AS ddpPerItem, 105000000L AS exwPerItem,
        |  1000000L AS taxBasePerItem, 3000000L AS totalPerItem,
        |  'EUR' AS totalPerItem_ccy, CAST(NULL AS LONG) AS sampleDDPPrice,
        |  CAST(NULL AS STRING) AS sampleDDPPrice_ccy
        |UNION ALL
        |SELECT 'cr1', 'p2', '5', 0, 0L, 0L, 0L, 0L, 'XXX', 4000000L, 'USD'""".stripMargin))

    ctx.warehouse.createTable("dim_deal_products",
      Seq(("D1", "p1"), ("D1", "p2"), ("D1", "p3")).toDF("deal_id", "product_id"))
    ctx.warehouse.createTable("fact_deals_statuses",
      spark.sql("SELECT 'D1' AS deal_id, DATE'2024-05-20' AS current_status_date"))

    ctx.warehouse.createTable("fact_order", spark.sql(
      """SELECT 'o1' AS order_id, TIMESTAMP('2024-05-03 08:00:00') AS created_ts_msk,
        |  'O-1' AS friendly_id, CAST(NULL AS TIMESTAMP) AS next_effective_ts_msk""".stripMargin))
    ctx.warehouse.createTable("fact_order_statuses",
      Seq(("o1", "manufacturing")).toDF("order_id", "current_status"))
    // two change events; rn=1 must pick the 05-05 row
    ctx.warehouse.createTable("fact_order_change", spark.sql(
      """SELECT 'o1' AS order_id, TIMESTAMP('2024-05-04 00:00:00') AS event_ts_msk,
        |  111.0D AS total_confirmed_price, 11.0D AS final_gross_profit,
        |  10.0D AS initial_gross_profit, 'm1' AS owner_moderator_id, 222.0D AS final_gmv
        |UNION ALL
        |SELECT 'o1', TIMESTAMP('2024-05-05 00:00:00'), 333.0D, 33.0D, 30.0D, 'm2', 444.0D""".stripMargin))

    ctx.warehouse.createTable("fact_marketing_deals_interactions", spark.sql(
      """SELECT 'u1' AS user_id, 'D1' AS deal_id,
        |  TIMESTAMP('2024-04-20 12:00:00') AS visit_ts_msk,
        |  DATE'2024-04-20' AS visit_date, 'c' AS utm_campaign, 's' AS utm_source,
        |  'm' AS utm_medium, 'src' AS source, 't' AS type,
        |  DATE'2024-04-15' AS first_visit_date, 'fc' AS first_utm_campaign,
        |  'fs' AS first_utm_sourceas, 'fm' AS first_utm_medium,
        |  'fsrc' AS first_source, 'ft' AS first_type,
        |  7L AS number_of_interactions""".stripMargin))

    ctx.warehouse.createTable("gmv_by_sources", spark.sql(
      """SELECT 'o1' AS order_id, 555.0D AS gmv_initial,
        |  5.0D AS initial_gross_profit, 6.0D AS final_gross_profit, 't1' AS t""".stripMargin))

    ctx.warehouse.createTable("dim_pair_currency_rate", spark.sql(
      """SELECT 'USD' AS currency_code, 'USD' AS currency_code_to,
        |  1.1D AS rate, DATE'2024-05-01' AS effective_date""".stripMargin))

    val model = SqlTemplater.sqlModelAuto("fact_deals_with_requests", sql)
    assert(model.materialization == Materialization.View)
    assert(model.deps.toSet == Set("fact_deals", "fact_customer_requests",
      "fact_customer_requests_variants", "dim_deal_products", "fact_deals_statuses",
      "fact_order", "fact_order_statuses", "fact_order_change",
      "fact_marketing_deals_interactions", "gmv_by_sources", "dim_pair_currency_rate"))

    for ((n, st) <- new DagRunner(Seq(model)).run(ctx,
        selectors = Seq("fact_deals_with_requests")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val out = ctx.ref("fact_deals_with_requests")
    val rows = out.selectExpr("deal_id", "deal_friendly_id", "user_id",
      "deal_status", "deal_status_group", "deal_type",
      "CAST(count_customer_requests AS LONG)",
      "CAST(count_customer_requests_variants AS LONG)", "CAST(qty AS LONG)",
      "other", "exw", "ddp", "ddp_currency", "ddp_usd",
      "with_onlineReview", "with_sampleDelivery", "is_standart", "is_rfq",
      "is_sample", "is_manual", "is_small_batch", "CAST(products AS LONG)",
      "CAST(current_status_date AS STRING)", "CAST(order_created_date AS STRING)",
      "order_friendly_id", "order_current_status", "total_confirmed_price",
      "owner_moderator_id", "final_gmv", "gmv_initial", "initial_gross_profit",
      "final_gross_profit", "t_gmv", "utm_campaign", "first_utm_sourceas",
      "CAST(count_visits AS LONG)", "CAST(number_user_deal AS INT)")
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(rows.keySet == Set("D1", "D2", "D3"),
      s"D4 (date), D5 (RU), D6 (closed) must be filtered: ${rows.keySet}")

    // D1: deferred split (other 10+1050/105=20, exw 1050·100/105=1000),
    // sample fallback ddp 30+20=50, MAX currency USD, ×1.1 → 55; VIP (BR,
    // name without 'sample'); latest order_change row; finance from
    // gmv_by_sources; first deal of u1
    assert(rows("D1") == Seq("D1", "DL-1", "u1", "InProgress", "InProgress",
      "VIP", 1L, 2L, 15L, 20.0, 1000.0, 50.0, "USD", 55.0,
      1, 1, 1, 0, 0, 0, 0, 3L, "2024-05-20", "2024-05-03", "O-1",
      "manufacturing", 333.0, "m2", 444.0, 555.0, 5.0, 6.0, "t1",
      "c", "fs", 7L, 1), rows("D1").toString)
    // D2: status Other folds to Cancelled; MX + 'sample' in name → Other
    // type; no requests → null aggregates, flags 0; second deal of u1
    assert(rows("D2") == Seq("D2", "DL-2", "u1", "Other", "Cancelled",
      "Other", 0L, 0L, null, null, null, null, null, null,
      0, 0, 0, 0, 0, 0, 0, null, null, null, null, null, null, null, null,
      null, null, null, null, null, null, null, 2), rows("D2").toString)
    // D3: blocklisted user → status rewritten to Test — but the
    // status-group CASE reads the RAW `status` input column (real columns
    // outrank same-select aliases), so the group stays InProgress
    assert(rows("D3")(3) == "Test", rows("D3").toString)
    assert(rows("D3")(4) == "InProgress", rows("D3").toString)
    assert(rows("D3")(5) == "VIP", rows("D3").toString)
  }
}
