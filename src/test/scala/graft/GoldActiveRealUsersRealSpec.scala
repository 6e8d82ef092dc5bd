package graft

import java.time.LocalDate

import graft.runtime._

/** models/spark/gold/gold_active_real_users.sql executed VERBATIM — the
  * real-file twin of the retention macro (q49/q50 / active_devices prove the
  * macro; this file adds the identity-graph surface): per-user day roll-up of
  * gold_active_devices with the gmv-weighted country/platform adjustment
  * (SUM(SUM(..)) OVER nested agg + FIRST_VALUE slice vote, :76-97), the
  * new/regular/reactivated previous-activity classifier (:143-165), and the
  * UNIX_DATE RANGE-FOLLOWING retention family rd1/rd3/rd7/rd14, rw1–rw4,
  * churned_14/28, converted_next_w1/w2 (:167-229) — every flag hand-computed
  * on planted days that CROSS A MONTH BOUNDARY (D0 = a month's last day,
  * D0+1 the next month's first: UNIX_DATE frames must be immune to calendar
  * seams). The model is CURRENT_DATE()-anchored, so planted days are
  * relative to LocalDate.now(), far enough back that every retention gate
  * IF(DATEDIFF(CURRENT_DATE()-1, date_msk) >= k, …) is open and
  * deterministic on any run date. */
/** Device-day grain of gold_active_devices — only the columns the model
  * reads. Top-level: Spark can't encode a case class nested in the suite. */
case class GarusDev(
    real_user_id: String, date_msk: String, country_code: String,
    app_language: String, legal_entity: String, app_entity: String,
    real_user_segment: String, join_date_msk: String,
    is_product_opened: Boolean, is_product_added_to_cart: Boolean,
    is_product_purchased: Boolean, is_product_to_favourites: Boolean,
    is_cart_opened: Boolean, is_checkout_started: Boolean,
    is_checkout_payment_method_selected: Boolean, is_checkout_delivery_selected: Boolean,
    gmv_per_day_initial: Double, gmv_per_day_final: Double,
    order_gross_profit_per_day_final_estimated: Double,
    order_gross_profit_per_day_final: Double,
    ecgp_per_day_initial: Double, ecgp_per_day_final: Double,
    number_of_orders: Long, is_payer: Boolean, is_converted: Boolean)

class GoldActiveRealUsersRealSpec extends SparkSpec {
  import spark.implicits._
  private type Dev = GarusDev
  private val Dev = GarusDev

  test("REAL gold_active_real_users.sql: retention flags across a month boundary") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/models/spark/gold/gold_active_real_users.sql"))

    // D0 = the LAST day of the month ~100 days ago ⇒ D0 ∈ [today-100, today-70];
    // D0+1 crosses into the next month; D0+28 ≤ today-42 keeps every
    // CURRENT_DATE()-gated window open (and churned_28 at D0+25 decidable).
    val t100 = LocalDate.now().minusDays(100)
    val d0 = t100.withDayOfMonth(t100.lengthOfMonth)
    def d(off: Int): String = d0.plusDays(off).toString
    val u1join = d(0)
    val u2join = d0.minusDays(50).toString

    val devs = Seq(
      // u1 @ D0: TWO device rows in different countries — FR carries 3× the
      // gmv, so the gmv-weighted vote must pick FR over DE
      Dev("u1", d(0), "DE", "de", "JoomLtd", "joom", "shopper", u1join,
        true, false, true, false, false, false, false, false,
        10.0, 8.0, 2.0, 1.5, 1.0, 0.8, 1L, true, false),
      Dev("u1", d(0), "FR", "de", "JoomLtd", "joom", "shopper", u1join,
        true, true, true, false, false, false, false, false,
        30.0, 25.0, 5.0, 4.0, 3.0, 2.5, 2L, true, false),
      // u1 @ D0+1 (next month's first day), D0+7 (converted), D0+25
      Dev("u1", d(1), "DE", "de", "JoomLtd", "joom", "shopper", u1join,
        true, false, false, false, false, false, false, false,
        0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0L, false, false),
      Dev("u1", d(7), "DE", "de", "JoomLtd", "joom", "shopper", u1join,
        true, false, true, false, false, false, false, false,
        5.0, 5.0, 1.0, 1.0, 0.5, 0.5, 1L, true, true),
      Dev("u1", d(25), "DE", "de", "JoomLtd", "joom", "shopper", u1join,
        true, false, false, false, false, false, false, false,
        0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0L, false, false),
      // u2: joined 50 days before its only planted day -> 'reactivated';
      // country ZZ is not in gold_countries -> 'Other' fallbacks
      Dev("u2", d(0), "ZZ", "ru", "JoomLtd", "joom", "basic", u2join,
        true, false, true, false, false, false, false, false,
        7.0, 7.0, 1.0, 1.0, 0.7, 0.7, 1L, true, false))

    val ctx = freshCtx()
    ctx.warehouse.createTable("gold_active_devices", devs.toDF()
      .withColumn("date_msk", $"date_msk".cast("date"))
      .withColumn("join_date_msk", $"join_date_msk".cast("date")))
    ctx.warehouse.createTable("gold_countries", Seq(
      ("DE", "DE", "Western Europe", "priority"),
      ("FR", "FR", "Western Europe", "priority"))
      .toDF("country_code", "top_country_code", "region_name", "country_priority_type"))

    val model = SqlTemplater.sqlModelAuto("gold_active_real_users", sql)
    assert(model.materialization == Materialization.IncrementalInsertOverwrite(
      Seq("date_msk"), OnSchemaChange.Ignore))
    assert(model.deps.toSet == Set("gold_active_devices", "gold_countries"))
    assert(model.meta("full_reload_on") == "6")

    for ((n, st) <- new DagRunner(Seq(model)).run(ctx, selectors = Seq("gold_active_real_users")))
      assert(st.isInstanceOf[RunStatus.Success], s"$n: $st")

    val out = ctx.ref("gold_active_real_users")
    assert(out.count() == 5, out.select("date_msk", "real_user_id").collect().mkString(";"))

    // identity / slice / aggregate columns
    val slices = out.selectExpr("CAST(date_msk AS STRING)", "real_user_id",
      "country_code", "top_country_code", "region_name", "country_priority_type",
      "CAST(join_date_msk AS STRING)", "is_new_real_user", "real_user_lifetime",
      "previous_activity_real_user_group", "prev_date_msk_lag", "next_date_msk_lag",
      "gmv_per_day_initial", "number_of_orders", "is_payer", "is_converted")
      .as[(String, String, String, String, String, String, String, Boolean, Int,
           String, Int, Option[Int], Double, Long, Boolean, Boolean)].collect().toSet
    assert(slices == Set(
      // u1@D0: FR wins the gmv vote (30 > 10); sums span both device rows
      (d(0), "u1", "FR", "FR", "Western Europe", "priority", u1join,
        true, 0, "new", 0, Some(1), 40.0, 3L, true, false),
      (d(1), "u1", "DE", "DE", "Western Europe", "priority", u1join,
        false, 1, "regular", 1, Some(6), 0.0, 0L, false, false),
      (d(7), "u1", "DE", "DE", "Western Europe", "priority", u1join,
        false, 7, "regular", 6, Some(18), 5.0, 1L, true, true),
      (d(25), "u1", "DE", "DE", "Western Europe", "priority", u1join,
        false, 25, "regular", 18, None, 0.0, 0L, false, false),
      (d(0), "u2", "ZZ", "Other", "Other", "Other", u2join,
        false, 50, "reactivated", 50, None, 7.0, 1L, true, false)), slices.toString)

    // the retention family — the RANGE-FOLLOWING frames over UNIX_DATE
    val ret = out.selectExpr("CAST(date_msk AS STRING)", "real_user_id",
      "is_rd1", "is_rd3", "is_rd7", "is_rd14",
      "is_rw1", "is_rw2", "is_rw3", "is_rw4",
      "is_churned_14", "is_churned_28", "is_converted_next_w1", "is_converted_next_w2")
      .as[(String, String, Boolean, Boolean, Boolean, Boolean,
           Boolean, Boolean, Boolean, Boolean, Boolean, Boolean,
           Option[Boolean], Option[Boolean])].collect().toSet
    assert(ret == Set(
      // D0: next-day (month seam!) and day-7 hits; rw4 hit via D0+25
      (d(0), "u1", true, false, true, false, true, false, false, true,
        false, false, Some(true), None),
      // D0+1: only rw1 (D0+7 at lag 6) and rw4 (D0+25 at lag 24) hit
      (d(1), "u1", false, false, false, false, true, false, false, true,
        false, false, Some(true), None),
      // D0+7: next activity is 18 days out -> inside rw3's [15,21] frame,
      // churned_14 but not _28; empty MAX frames -> NULL conversion flags
      (d(7), "u1", false, false, false, false, false, false, true, false,
        true, false, None, None),
      // D0+25: tail day, no following activity at all
      (d(25), "u1", false, false, false, false, false, false, false, false,
        true, true, None, None),
      (d(0), "u2", false, false, false, false, false, false, false, false,
        true, true, None, None)), ret.toString)
  }
}
