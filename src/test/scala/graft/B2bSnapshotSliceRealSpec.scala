package graft

import java.nio.file.{Files, Paths}

import graft.runtime._

/** SCD2 inside a DATA-BEARING multi-model DAG: a b2b_mart mini-slice of 5
  * verbatim reference nodes — THREE snapshot nodes (two default-config
  * timestamp strategies + one with `invalidate_hard_deletes=True`), the
  * `sat_product_state` view that exposes their validity ranges as
  * effective/next_effective timestamps, and `ss_assortment_products`, the
  * downstream table that consumes all three snapshots' CURRENT rows
  * (`dbt_valid_to IS NULL` — the as-of-now read) — composed into ONE
  * DagRunner DAG over planted mongo fixtures and run TWICE: the second run
  * advances one product's state and hard-deletes another product, and every
  * `dbt_valid_from`/`dbt_valid_to` cell on the tail is hand-pinned
  * (MSK = UTC+3: 1709251200000 = 2024-03-01 00:00 UTC renders 03:00:00).
  *
  * Files (read from /root/reference at test runtime):
  *   snapshots/spark/b2b_mart/scd2_mongo_product_state.sql
  *   snapshots/spark/b2b_mart/scd2_mongo_product_certification_states.sql
  *   snapshots/spark/b2b_mart/scd2_published_products_snapshot.sql
  *   models/spark/b2b_mart/sat/sat_product_state.sql
  *   models/spark/b2b_mart/ss_assortment/ss_assortment_products.sql
  */
class B2bSnapshotSliceRealSpec extends SparkSpec {
  import spark.implicits._

  private val ref = "/root/reference"
  private def readSql(p: String): String = Files.readString(Paths.get(s"$ref/$p"))

  private val t1 = 1709251200000L // 2024-03-01 03:00 MSK
  private val t2 = 1709254800000L // 2024-03-01 04:00 MSK

  private def stateDoc(id: String, reject: Option[String], status: Int, utms: Long): String = {
    val r = reject.map(s => s"'$s'").getOrElse("CAST(NULL AS STRING)")
    s"SELECT '$id' AS _id, $r AS r, $status AS s, CAST($utms AS BIGINT) AS utms"
  }

  private def pubDoc(id: String, merchant: String, cat: Long, utms: Long): String =
    s"""SELECT '$id' AS _id, CAST($cat AS BIGINT) AS categoryId,
       |  CAST($t1 AS BIGINT) AS createdTimeMs, CAST($utms AS BIGINT) AS updatedTimeMs,
       |  '$merchant' AS merchantId, 'desc-$id' AS origDescription,
       |  array('http://img/$id/1') AS origExtraImageUrls,
       |  'http://img/$id/main' AS origMainImageUrl, 'name-$id' AS origName,
       |  'http://src/$id' AS origUrl, 'sku-$id' AS sku, 'store-$id' AS storeId,
       |  CAST(NULL AS STRING) AS dangerousKind""".stripMargin

  test("REAL b2b snapshot slice: 3 SCD2 nodes + sat view + assortment consumer, " +
    "full + advance, validity ranges hand-pinned") {
    val macros = CorpusSweep.loadMacros(Paths.get(s"$ref/macros"))
    val ctx = freshCtx(vars = Map("run_ts" -> "2024-03-02 00:00:00")).copy(macros = macros)

    // ---- mutable mongo fixtures (run 2 rebinds them) ----------------------
    // product states: PP1 active, PP2 active; PP3 has NO state row (the
    // assortment's LEFT JOIN must emit NULL status for it)
    var stateDocs = Seq(
      stateDoc("PP1", None, 1, t1),
      stateDoc("PP2", None, 1, t1))
    // published products: PP1 (internal merchant), PP2 (the ali1688 magic
    // merchant id), PP3 (unknown merchant -> 'other')
    var pubDocs = Seq(
      pubDoc("PP1", "M1", 2L, t1),
      pubDoc("PP2", "66054380c33acc34a54a56d0", 5L, t1),
      pubDoc("PP3", "M2", 5L, t1))

    ctx.sources.register("mongo", "b2b_product_product_states_daily_snapshot")(
      s => s.sql(stateDocs.mkString("\nUNION ALL\n")))
    ctx.sources.register("mongo", "b2b_product_published_products_daily_snapshot")(
      s => s.sql(pubDocs.mkString("\nUNION ALL\n")))
    ctx.sources.register("mongo", "b2b_product_product_certification_states_daily_snapshot")(
      s => s.sql(
        s"""SELECT 'C1' AS _id, 'PP1' AS pId,
           |  map('BR', named_struct(
           |    'cert', named_struct('c', 1, 'r', 'certOk'),
           |    'reg', named_struct('l', 2, 'r', 'noReg', 'ma', array('agencyA')))) AS cs,
           |  CAST($t1 AS BIGINT) AS ctms, CAST($t1 AS BIGINT) AS utms""".stripMargin))
    ctx.sources.register("mongo", "b2b_product_product_appendixes_daily_snapshot")(s => {
      import s.implicits._
      Seq(("PP1", null: String, "ali-cat-1", "BrandX"),
          ("PP2", "ali1688/ALI9", "ali-cat-2", "BrandY"))
        .toDF("_id", "extId", "m1688cat", "brand")
        .selectExpr("_id", "extId", "named_struct('categoryId', m1688cat) AS m1688", "brand")
    })
    ctx.sources.register("productsmatching", "joom_1688_product_variant_matches")(s => {
      import s.implicits._
      Seq(("ALI9", "J1")).toDF("ali_1688_product_id", "joom_product_id")
    })
    ctx.sources.register("b2b_mart", "merchants")(s => {
      import s.implicits._
      Seq(("M1", true), ("M2", false)).toDF("merchant_id", "is_internal")
    })
    ctx.sources.register("mart", "category_levels")(s =>
      s.range(0, 10).selectExpr("id AS category_id", "concat('cat', id) AS name",
        "named_struct('name', concat('L1-', id), 'id', concat('l1-', id)) AS level_1_category",
        "named_struct('name', concat('L2-', id), 'id', concat('l2-', id)) AS level_2_category",
        "named_struct('name', concat('L3-', id), 'id', concat('l3-', id)) AS level_3_category",
        "named_struct('name', concat('L4-', id), 'id', concat('l4-', id)) AS level_4_category",
        "named_struct('name', concat('L5-', id), 'id', concat('l5-', id)) AS level_5_category"))

    // ---- the 5 verbatim nodes --------------------------------------------
    val snapState = SqlTemplater.snapshotModel(
      readSql("snapshots/spark/b2b_mart/scd2_mongo_product_state.sql"), macros)
    val snapCert = SqlTemplater.snapshotModel(
      readSql("snapshots/spark/b2b_mart/scd2_mongo_product_certification_states.sql"), macros)
    val snapPub = SqlTemplater.snapshotModel(
      readSql("snapshots/spark/b2b_mart/scd2_published_products_snapshot.sql"), macros)
    assert(snapState.materialization.isInstanceOf[Materialization.Snapshot])
    assert(snapPub.materialization == Materialization.Snapshot(
      "_id", Scd2Strategy.Timestamp("update_ts_msk"), invalidateHardDeletes = true))
    val satView = SqlTemplater.sqlModelAuto("sat_product_state",
      readSql("models/spark/b2b_mart/sat/sat_product_state.sql"), macros, ctx.vars)
    val assortment = SqlTemplater.sqlModelAuto("ss_assortment_products",
      readSql("models/spark/b2b_mart/ss_assortment/ss_assortment_products.sql"),
      macros, ctx.vars)

    val dag = new DagRunner(Seq(snapState, snapCert, snapPub, satView, assortment))
    def runAll(at: String): Unit =
      for ((n, st) <- dag.run(ctx.copy(vars = Map("run_ts" -> at))))
        assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    // ---- run 1: FULL -------------------------------------------------------
    runAll("2024-03-02 00:00:00")
    assert(ctx.ref("scd2_mongo_product_state").count() == 2)
    assert(ctx.ref("scd2_published_products_snapshot").count() == 3)

    val a1 = ctx.ref("ss_assortment_products")
      .selectExpr("product_id", "status", "reject_reason", "merchant_type",
        "is_ali1688_product", "has_certification", "has_registration",
        "certification_reason", "brand", "ali1688_category_id",
        "sort_array(ali1688_product_id)", "sort_array(joom_product_id)",
        "level_2_category_name", "CAST(created_ts_msk AS STRING)")
      .as[(String, Option[String], Option[String], String, Boolean, Option[Boolean],
           Option[Boolean], Option[String], Option[String], Option[String],
           Seq[String], Seq[String], Option[String], String)]
      .collect().toSet
    assert(a1 == Set(
      ("PP1", Some("Active"), None, "internal", false, Some(true), Some(false),
        Some("certOk"), Some("BrandX"), Some("ali-cat-1"), Seq(), Seq(),
        Some("L2-2"), "2024-03-01 03:00:00"),
      ("PP2", Some("Active"), None, "external", true, None, None,
        None, Some("BrandY"), Some("ali-cat-2"), Seq("ALI9"), Seq("J1"),
        Some("L2-5"), "2024-03-01 03:00:00"),
      // no state row and no appendix-derived matching row -> NULL arms
      ("PP3", None, None, "other", false, None, None,
        None, None, None, null, null, Some("L2-5"), "2024-03-01 03:00:00")),
      a1.toSeq.sortBy(_._1).mkString("\n"))

    // ---- run 2: PP1's state ADVANCES (1 -> 3 at t2), PP3 is HARD-DELETED
    // from published products (invalidate_hard_deletes=True must CLOSE it,
    // unlike product_state's default which keeps deletes open) -------------
    stateDocs = Seq(
      stateDoc("PP1", Some("badQualityImage2"), 3, t2),
      stateDoc("PP2", None, 1, t1))
    pubDocs = pubDocs.take(2)
    runAll("2024-03-03 00:00:00")

    // snapshot tail: hand-pinned validity chains
    val st = ctx.ref("scd2_mongo_product_state")
      .selectExpr("product_id", "status",
        "CAST(dbt_valid_from AS STRING)", "CAST(dbt_valid_to AS STRING)")
      .as[(String, Int, String, Option[String])].collect().toSet
    assert(st == Set(
      // PP1 v1 closed at v2's updated_at (timestamp strategy), not run_ts
      ("PP1", 1, "2024-03-01 03:00:00", Some("2024-03-01 04:00:00")),
      ("PP1", 3, "2024-03-01 04:00:00", None),
      ("PP2", 1, "2024-03-01 03:00:00", None)), st.toSeq.sortBy(r => (r._1, r._3)).mkString("\n"))

    val pub = ctx.ref("scd2_published_products_snapshot")
      .selectExpr("_id", "CAST(dbt_valid_from AS STRING)", "CAST(dbt_valid_to AS STRING)")
      .as[(String, String, Option[String])].collect().toSet
    assert(pub == Set(
      ("PP1", "2024-03-01 03:00:00", None),
      ("PP2", "2024-03-01 03:00:00", None),
      // the invalidating strategy closes the vanished key AT RUN_TS
      ("PP3", "2024-03-01 03:00:00", Some("2024-03-03 00:00:00"))),
      pub.toSeq.sortBy(_._1).mkString("\n"))

    // sat view: TIMESTAMP(dbt_valid_from/to) re-derived from the advanced
    // snapshot — the DAG's SCD2-range consumer
    val sat = ctx.ref("sat_product_state")
      .selectExpr("product_id", "status", "reject_reason",
        "CAST(effective_ts_msk AS STRING)", "CAST(next_effective_ts_msk AS STRING)")
      .as[(String, Int, Option[String], String, Option[String])].collect().toSet
    assert(sat == Set(
      ("PP1", 1, None, "2024-03-01 03:00:00", Some("2024-03-01 04:00:00")),
      ("PP1", 3, Some("badQualityImage2"), "2024-03-01 04:00:00", None),
      ("PP2", 1, None, "2024-03-01 03:00:00", None)), sat.toSeq.sortBy(r => (r._1, r._4)).mkString("\n"))

    // assortment tail: the closed PP3 row is gone (dbt_valid_to IS NULL),
    // PP1 reads the NEW current state, and the camelCase reject reason is
    // re-spaced by the verbatim regexp chain: 'badQualityImage2' ->
    // 'B' + 'ad quality image 2'
    val a2 = ctx.ref("ss_assortment_products")
      .selectExpr("product_id", "status", "reject_reason")
      .as[(String, Option[String], Option[String])].collect().toSet
    assert(a2 == Set(
      ("PP1", Some("Rejected"), Some("Bad quality image 2")),
      ("PP2", Some("Active"), None)), a2.toSeq.sortBy(_._1).mkString("\n"))
  }
}
