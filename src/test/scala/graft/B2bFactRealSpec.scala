package graft

import graft.runtime._

/** Five more reference models executed VERBATIM, picked by ref() fan-in
  * (fact_order is the corpus's most-referenced model at 31 inbound refs)
  * and by archetype coverage:
  *
  *  - models/spark/b2b_mart/fact/fact_order.sql — view over an SCD2
  *    snapshot joined to a MIN(IF(...)) status roll-up, NOT IN row filter,
  *    CASE decodings of delivery_scheme / payment_channel;
  *  - models/spark/b2b_mart/dim/dim_user_admin.sql — SELECT DISTINCT over
  *    the open SCD2 slice, `||` string concat;
  *  - models/spark/b2b_mart/fact/fact_interactions_utm.sql — reads a RAW
  *    schema-qualified table name (b2b_mart.scd2_interactions_snapshot —
  *    no ref/source), map_from_entries + explode into key/value rows;
  *  - models/spark/b2b_mart/fact/fact_quotes_variants.sql — double LATERAL
  *    VIEW EXPLODE (products → variants), nested struct/array access
  *    variant.attributes.value[0];
  *  - models/spark/mart/link_device_user.sql — source passthrough view
  *    (the BigQuery-export shape).
  */
class B2bFactRealSpec extends SparkSpec {
  import spark.implicits._

  private def refSql(rel: String): String =
    java.nio.file.Files.readString(java.nio.file.Paths.get(
      s"/root/reference/models/spark/$rel"))

  test("REAL fact_order.sql: SCD2 join, manufacturing roll-up, CASE decodes") {
    val ctx = freshCtx()
    // status history: o1 reaches manufacturing twice (MIN wins), o2 never
    ctx.warehouse.createTable("fact_order_statuses_change", Seq(
      ("o1", "pending", "2024-03-01 08:00:00"),
      ("o1", "manufacturing", "2024-03-02 09:00:00"),
      ("o1", "manufacturing", "2024-03-03 10:00:00"),
      ("o2", "pending", "2024-03-01 11:00:00"))
      .toDF("order_id", "status", "ts")
      .selectExpr("order_id", "status", "CAST(ts AS TIMESTAMP) AS event_ts_msk"))
    ctx.warehouse.createTable("scd2_mongo_order", spark.sql(
      """SELECT 'o1' AS order_id, '2024-02-28 12:00:00' AS created_ts_msk,
        |  'USD' AS ccy, 14 AS delivery_time_days, 'F1' AS friendly_id,
        |  'r1' AS request_id, 'lh1' AS linehaul_channel_id, 'dev1' AS device_id,
        |  'u1' AS user_id, CAST(NULL AS STRING) AS reject_reason,
        |  'own1' AS owner_id, 'cus1' AS customs_id, 'log1' AS logistician_id,
        |  'biz1' AS biz_dev_id, 'law1' AS lawyer_id,
        |  'manufacturing' AS last_order_status, 'qc' AS last_order_sub_status,
        |  'first order' AS order_description, 0 AS delivery_scheme,
        |  1 AS payment_channel, '2024-02-28 12:00:00' AS dbt_valid_from,
        |  CAST(NULL AS STRING) AS dbt_valid_to
        |UNION ALL
        |SELECT 'o2', '2024-03-01 09:30:00', 'EUR', 7, 'F2', 'r2', 'lh2',
        |  'dev2', 'u2', 'late', 'own2', 'cus2', 'log2', 'biz2', 'law2',
        |  'pending', NULL, 'second order', 1, 2,
        |  '2024-03-01 09:30:00', '2024-03-05 00:00:00'
        |UNION ALL
        |SELECT '660e4db2549ee70ee636f730', '2024-03-02 00:00:00', 'USD', 1,
        |  'F3', 'r3', 'lh3', 'dev3', 'u3', NULL, 'own3', 'cus3', 'log3',
        |  'biz3', 'law3', 'pending', NULL, 'duplicated copy', 0, 1,
        |  '2024-03-02 00:00:00', NULL""".stripMargin))

    val model = SqlTemplater.sqlModelAuto("fact_order",
      refSql("b2b_mart/fact/fact_order.sql"))
    assert(model.materialization == Materialization.View)
    assert(model.meta("priority_weight") == "150")
    val dag = new DagRunner(Seq(model))
    for ((n, st) <- dag.run(ctx, selectors = Seq("fact_order")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val out = ctx.ref("fact_order")
    // the hard-coded copy-order id is filtered out
    assert(out.count() == 2)
    val rows = out.selectExpr("order_id", "CAST(created_ts_msk AS STRING)",
      "user_ccy", "CAST(min_manufactured_ts_msk AS STRING)", "delivery_scheme",
      "payment_channel", "CAST(next_effective_ts_msk AS STRING)")
      .as[(String, String, String, Option[String], String, String, Option[String])]
      .collect().toSet
    assert(rows == Set(
      ("o1", "2024-02-28 12:00:00", "USD", Some("2024-03-02 09:00:00"),
        "DAP", "Internet projects", None),
      ("o2", "2024-03-01 09:30:00", "EUR", None,
        "EXW", "CIA", Some("2024-03-05 00:00:00"))), rows.toString)
  }

  test("REAL dim_user_admin.sql: open SCD2 slice, DISTINCT, || concat") {
    val ctx = freshCtx()
    ctx.warehouse.createTable("scd2_mongo_admin_users", Seq(
      // current version + an exact duplicate (DISTINCT must collapse them)
      ("a1", "ann@x.io", "Ann", "Lee", "en", "ops", "2024-01-01 00:00:00", None),
      ("a1", "ann@x.io", "Ann", "Lee", "en", "ops", "2024-01-01 00:00:00", None),
      // a1's closed historical version: filtered by dbt_valid_to IS NULL
      ("a1", "ann@old.io", "Ann", "Li", "en", "ops", "2023-06-01 00:00:00",
        Some("2024-01-01 00:00:00")),
      ("a2", "bob@x.io", "Bob", "Roy", "de", "legal", "2024-02-01 00:00:00", None))
      .toDF("admin_id", "email", "fn", "ln", "language", "one_role", "cts", "vt")
      .selectExpr("admin_id", "email", "fn", "ln", "language", "one_role",
        "CAST(cts AS TIMESTAMP) AS created_ts_msk",
        "CAST(vt AS TIMESTAMP) AS dbt_valid_to"))

    val model = SqlTemplater.sqlModelAuto("dim_user_admin",
      refSql("b2b_mart/dim/dim_user_admin.sql"))
    assert(model.materialization == Materialization.View)
    val dag = new DagRunner(Seq(model))
    for ((n, st) <- dag.run(ctx, selectors = Seq("dim_user_admin")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val rows = ctx.ref("dim_user_admin")
      .selectExpr("admin_id", "email", "name", "role")
      .as[(String, String, String, String)].collect().toSet
    assert(rows == Set(
      ("a1", "ann@x.io", "Ann Lee", "ops"),
      ("a2", "bob@x.io", "Bob Roy", "legal")), rows.toString)
  }

  test("REAL fact_interactions_utm.sql: raw catalog name, map explode") {
    val ctx = freshCtx()
    // the model reads b2b_mart.scd2_interactions_snapshot as a bare
    // schema-qualified name (no ref/source) — it must resolve through the
    // session catalog, so plant a real external table there
    val dbLoc = TempDirs.create("graft_b2bdb")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS b2b_mart LOCATION '$dbLoc'")
    try {
      spark.sql(
        """SELECT 'i1' AS _id, 'u1' AS uid, 'google' AS source, 'ad' AS type,
          |  'c1' AS campaign, 'wf1' AS websiteForm, 'click' AS interactionType,
          |  false AS incorrectAttribution, false AS incorrectUtm,
          |  array(named_struct('key', 'utm_source', 'value', 'google'),
          |        named_struct('key', 'utm_medium', 'value', 'cpc')) AS utmLabels
          |UNION ALL
          |SELECT 'i2', 'u2', 'fb', 'organic', 'c2', 'wf2', 'form', true, false,
          |  array(named_struct('key', 'utm_campaign', 'value', 'x'))
          |UNION ALL
          |SELECT 'i3', 'u3', 'tw', 'ad', 'c3', 'wf3', 'click', false, true,
          |  CAST(array() AS ARRAY<STRUCT<key: STRING, value: STRING>>)"""
          .stripMargin)
        .write.mode("overwrite").option("path", s"$dbLoc/scd2_interactions_snapshot")
        .saveAsTable("b2b_mart.scd2_interactions_snapshot")

      val model = SqlTemplater.sqlModelAuto("fact_interactions_utm",
        refSql("b2b_mart/fact/fact_interactions_utm.sql"))
      assert(model.materialization == Materialization.Table())
      val dag = new DagRunner(Seq(model))
      for ((n, st) <- dag.run(ctx, selectors = Seq("fact_interactions_utm")))
        assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

      val rows = ctx.ref("fact_interactions_utm")
        .selectExpr("interaction_id", "user_id", "source", "website_form",
          "incorrect_attribution", "utm_label", "utm_value")
        .as[(String, String, String, String, Boolean, String, String)]
        .collect().toSet
      // i3's empty label map explodes to nothing (no _OUTER in the model)
      assert(rows == Set(
        ("i1", "u1", "google", "wf1", false, "utm_source", "google"),
        ("i1", "u1", "google", "wf1", false, "utm_medium", "cpc"),
        ("i2", "u2", "fb", "wf2", true, "utm_campaign", "x")), rows.toString)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS b2b_mart CASCADE")
    }
  }

  test("REAL fact_quotes_variants.sql: double lateral explode, nested access") {
    val ctx = freshCtx()
    ctx.sources.register("mongo", "b2b_core_quotes_daily_snapshot")(s => s.sql(
      """SELECT 'q1' AS _id, 'd1' AS dealId, array(
        |  named_struct(
        |    'productId', 'P1', 'customerRequestID', 'CR1',
        |    'productName', 'Widget',
        |    'variants', array(
        |      named_struct('variantId', 'V1',
        |        'attributes', array(named_struct('value', 'red'),
        |                            named_struct('value', 'XL')),
        |        'quantity', 5,
        |        'ddpPerItem', named_struct('amount', 2.5D, 'ccy', 'USD'),
        |        'exwTotalPrice', named_struct('amount', 10.0D, 'ccy', 'USD'),
        |        'totalPrice', named_struct('amount', 12.5D, 'ccy', 'USD')),
        |      named_struct('variantId', 'V2',
        |        'attributes', array(named_struct('value', 'blue')),
        |        'quantity', 3,
        |        'ddpPerItem', named_struct('amount', 1.0D, 'ccy', 'EUR'),
        |        'exwTotalPrice', named_struct('amount', 3.0D, 'ccy', 'EUR'),
        |        'totalPrice', named_struct('amount', 4.0D, 'ccy', 'EUR')))),
        |  named_struct(
        |    'productId', 'P2', 'customerRequestID', 'CR2',
        |    'productName', 'Gadget',
        |    'variants', array(
        |      named_struct('variantId', 'V3',
        |        'attributes', CAST(array() AS ARRAY<STRUCT<value: STRING>>),
        |        'quantity', 7,
        |        'ddpPerItem', named_struct('amount', 0.5D, 'ccy', 'USD'),
        |        'exwTotalPrice', named_struct('amount', 3.5D, 'ccy', 'USD'),
        |        'totalPrice', named_struct('amount', 4.2D, 'ccy', 'USD'))))
        |) AS products""".stripMargin))

    val model = SqlTemplater.sqlModelAuto("fact_quotes_variants",
      refSql("b2b_mart/fact/fact_quotes_variants.sql"))
    assert(model.materialization == Materialization.Table())
    assert(model.meta("priority_weight") == "150")
    val dag = new DagRunner(Seq(model))
    for ((n, st) <- dag.run(ctx, selectors = Seq("fact_quotes_variants")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val rows = ctx.ref("fact_quotes_variants")
      .selectExpr("quote_id", "deal_id", "product_id", "product_name",
        "variant_id", "sub_name", "quantity", "ddp_per_item",
        "total_price_ccy")
      .as[(String, String, String, String, String, Option[String], Int,
           Double, String)].collect().toSet
    assert(rows == Set(
      // sub_name = attributes.value[0]: first attribute's value
      ("q1", "d1", "P1", "Widget", "V1", Some("red"), 5, 2.5, "USD"),
      ("q1", "d1", "P1", "Widget", "V2", Some("blue"), 3, 1.0, "EUR"),
      // empty attributes array: value[0] is NULL, row still present
      ("q1", "d1", "P2", "Gadget", "V3", None, 7, 0.5, "USD")), rows.toString)
  }

  test("REAL link_device_user.sql: source passthrough export view") {
    val ctx = freshCtx()
    ctx.sources.register("default", "link_device_user")(s => {
      import s.implicits._
      Seq(("dev1", "u1"), ("dev2", "u2")).toDF("device_id", "user_id")
    })
    val model = SqlTemplater.sqlModelAuto("link_device_user",
      refSql("mart/link_device_user.sql"))
    assert(model.materialization == Materialization.View)
    assert(model.meta("bigquery_load") == "true" &&
      model.meta("bigquery_overwrite") == "true")
    val dag = new DagRunner(Seq(model))
    for ((n, st) <- dag.run(ctx, selectors = Seq("link_device_user")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")
    val rows = ctx.ref("link_device_user")
      .as[(String, String)].collect().toSet
    assert(rows == Set(("dev1", "u1"), ("dev2", "u2")))
  }
}
