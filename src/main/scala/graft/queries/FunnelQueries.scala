package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sequential conversion funnel — the reference's funnel family
  * (reference: models/spark/b2b_mart/key/interactions_funnel.sql,
  * models/spark/onfy/conversion_funnel_new.sql,
  * models/spark/base/active_devices_funnel.sql): per user, the first signup,
  * the first view strictly after it, the first purchase strictly after that —
  * then stage conversion counts.
  *
  * Three conditional-aggregation passes over the (already user-partitioned)
  * events; each stage joins the previous stage's per-user anchor back to the
  * events on user_id — all equi-joins, no window blowup.
  */
object FunnelQueries {

  def q57Funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), expr("ts_ns div 1000000000").as("es"))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("es")).as("signup_es"))
    val s2 = e.filter(col("event_type") === "view")
      .join(s1, Seq("user_id"))
      .filter(col("es") > col("signup_es"))
      .groupBy(col("user_id")).agg(min(col("es")).as("view_es"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("es") > col("view_es"))
      .groupBy(col("user_id")).agg(min(col("es")).as("purchase_es"))
    val users = e.select(col("user_id")).distinct()
    users
      .join(s1, Seq("user_id"), "left")
      .join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_users"),
        count(col("signup_es")).as("n_signup"),
        count(col("view_es")).as("n_view_after_signup"),
        count(col("purchase_es")).as("n_purchase_after_view"),
        round(count(col("purchase_es")).cast("double")
          / count(col("signup_es")).cast("double"), 6).as("full_funnel_rate"))
  }

  val q57Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS es FROM events),
      |s1 AS (
      |  SELECT user_id, MIN(es) AS signup_es FROM e WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, MIN(es) AS view_es
      |  FROM e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE event_type = 'view' AND es > signup_es GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, MIN(es) AS purchase_es
      |  FROM e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE event_type = 'purchase' AND es > view_es GROUP BY 1),
      |u AS (SELECT DISTINCT user_id FROM e)
      |SELECT COUNT(*) AS n_users,
      |  COUNT(signup_es) AS n_signup,
      |  COUNT(view_es) AS n_view_after_signup,
      |  COUNT(purchase_es) AS n_purchase_after_view,
      |  ROUND(CAST(COUNT(purchase_es) AS DOUBLE) / CAST(COUNT(signup_es) AS DOUBLE), 6)
      |    AS full_funnel_rate
      |FROM u
      |LEFT JOIN s1 ON u.user_id = s1.user_id
      |LEFT JOIN s2 ON u.user_id = s2.user_id
      |LEFT JOIN s3 ON u.user_id = s3.user_id""".stripMargin
}
