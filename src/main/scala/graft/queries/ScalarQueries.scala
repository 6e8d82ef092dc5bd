package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TimeFunctions

/** Scalar-function families from SURVEY.md §2.7 + generators from §2.6 +
  * the millis_to_ts(_msk) registered functions from §2.8. */
object ScalarQueries {

  /** Date-spine generation: EXPLODE(SEQUENCE(d1, d2)) (reference:
    * models/spark/onfy/stock_monitoring.sql:16). */
  def q17DateSpine(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val bounds = o.agg(min(to_date(col("o_orderdate"))).as("lo"),
      max(to_date(col("o_orderdate"))).as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("d"))
    val active = o.select(to_date(col("o_orderdate")).as("d")).distinct()
      .withColumn("has_orders", lit(1))
    spine.join(active, Seq("d"), "left")
      .groupBy(date_format(col("d"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_days"),
        sum(coalesce(col("has_orders"), lit(0))).as("n_order_days"))
  }

  val q17Oracle: String =
    """WITH bounds AS (
      |  SELECT MIN(CAST(o_orderdate AS DATE)) AS lo, MAX(CAST(o_orderdate AS DATE)) AS hi FROM orders),
      |spine AS (
      |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM bounds),
      |active AS (
      |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS d, 1 AS has_orders FROM orders)
      |SELECT strftime(spine.d, '%Y-%m') AS month, COUNT(*) AS n_days,
      |  CAST(SUM(COALESCE(has_orders, 0)) AS BIGINT) AS n_order_days
      |FROM spine LEFT JOIN active ON spine.d = active.d
      |GROUP BY 1""".stripMargin

  /** POSEXPLODE pair generation with j > i (reference:
    * models/spark/onfy/onfy_product_analogues.sql:73-80). */
  def q18WordPairs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val words = d.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("i", "w")))
      .filter(col("w") =!= "")
    val a = words.toDF("doc_id", "i", "w1")
    val b = words.toDF("doc_id", "j", "w2")
    a.join(b, Seq("doc_id"))
      .filter(col("j") > col("i"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_cooccur"))
      .where(col("n_cooccur") >= 20)
  }

  val q18Oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |w AS (
      |  SELECT doc_id, i, ws[i] AS w FROM t,
      |  LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) g
      |  WHERE ws[i] <> '')
      |SELECT a.w AS w1, b.w AS w2, COUNT(*) AS n_cooccur
      |FROM w a JOIN w b ON a.doc_id = b.doc_id AND a.i < b.i
      |GROUP BY 1, 2 HAVING COUNT(*) >= 20""".stripMargin

  /** String-function battery (reference: SURVEY.md §2.7 String family). */
  def q19Strings(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
    p.select(
      col("p_partkey"),
      upper(col("p_name")).as("name_upper"),
      expr("split_part(p_name, ' ', 1)").as("first_word"),
      concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
      lpad(col("p_size").cast("string"), 3, "0").as("size_pad"),
      substring(col("p_type"), 1, 3).as("type3"),
      length(col("p_name")).as("name_len"),
      translate(col("p_brand"), "#", "-").as("brand_tr"),
      regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
      instr(col("p_name"), "widget").as("pos_widget"),
      concat(col("p_name"), lit("/"), col("p_brand")).as("name_slash_brand"),
      trim(concat(lit("  "), col("p_name"), lit("  "))).as("name_trim"),
      expr("conv(hex(p_partkey), 16, 10)").as("key_roundtrip"))
  }

  val q19Oracle: String =
    """SELECT p_partkey,
      |  upper(p_name) AS name_upper,
      |  split_part(p_name, ' ', 1) AS first_word,
      |  concat_ws('-', p_brand, p_type) AS brand_type,
      |  lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_pad,
      |  substring(p_type, 1, 3) AS type3,
      |  CAST(length(p_name) AS INT) AS name_len,
      |  translate(p_brand, '#', '-') AS brand_tr,
      |  COALESCE(regexp_extract(p_brand, '([0-9]+)', 1), '') AS brand_num,
      |  CAST(COALESCE(instr(p_name, 'widget'), 0) AS INT) AS pos_widget,
      |  p_name || '/' || p_brand AS name_slash_brand,
      |  trim('  ' || p_name || '  ') AS name_trim,
      |  CAST(p_partkey AS VARCHAR) AS key_roundtrip
      |FROM part""".stripMargin

  /** Date/time-function battery (reference: SURVEY.md §2.7 Date/time family).
    * DuckDB mappings: dayofweek is 0-based Sunday there vs 1-based in Spark;
    * months_between is taken on month-truncated dates so both engines see an
    * integer month count. */
  def q20Datetime(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    o.select(
      col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
      datediff(to_date(lit("1999-01-01")), to_date(col("o_orderdate"))).as("days_to_99"),
      date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
      months_between(date_trunc("month", col("o_orderdate")), to_date(lit("1995-01-01")))
        .cast("int").as("months_since_95"),
      date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
      dayofweek(col("o_orderdate")).cast("int").as("dow"),
      date_format(col("o_orderdate"), "EEEE").as("weekday_name"),
      date_format(date_add(col("o_orderdate"), 45), "yyyy-MM-dd").as("plus45d"),
      year(col("o_orderdate")).cast("int").as("yr"),
      quarter(col("o_orderdate")).cast("int").as("qtr"),
      unix_timestamp(col("o_orderdate").cast("timestamp")).as("epoch_sec"))
  }

  val q20Oracle: String =
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m') AS order_month,
      |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS days_to_99,
      |  strftime(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS plus3m,
      |  CAST(date_diff('month', DATE '1995-01-01', date_trunc('month', o_orderdate)) AS INT) AS months_since_95,
      |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
      |  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow,
      |  dayname(o_orderdate) AS weekday_name,
      |  strftime(CAST(o_orderdate AS DATE) + 45, '%Y-%m-%d') AS plus45d,
      |  CAST(year(o_orderdate) AS INT) AS yr,
      |  CAST(quarter(o_orderdate) AS INT) AS qtr,
      |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_sec
      |FROM orders""".stripMargin

  /** JSON extraction: GET_JSON_OBJECT + FROM_JSON with DDL schema (reference:
    * models/spark/b2b_mart/dashboards/purchasing_and_production_report/
    * procurement_orders.sql:244-257; models/spark/b2b_mart/merchant/
    * merchant_funnel.sql:45). */
  def q21Json(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    e.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k1"),
        from_json(col("props"), lit("k BIGINT")).getField("k").as("k2"))
      .groupBy(col("event_type"))
      .agg(sum(col("k1")).as("sum_k"), max(col("k2")).as("max_k"),
        count(col("k1")).as("n_with_k"))
  }

  val q21Oracle: String =
    """SELECT event_type,
      |  CAST(SUM((props->>'$.k')::BIGINT) AS BIGINT) AS sum_k,
      |  MAX((props->>'$.k')::BIGINT) AS max_k,
      |  COUNT((props->>'$.k')::BIGINT) AS n_with_k
      |FROM events GROUP BY 1""".stripMargin

  /** Higher-order array functions: TRANSFORM/FILTER/EXISTS/AGGREGATE,
    * SORT_ARRAY, ARRAY_DISTINCT, ARRAY_JOIN, SLICE (reference: SURVEY.md §2.7
    * Array family; models/spark/onfy/onfy_product_analogues.sql:40-53). */
  def q22ArrayHof(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val words = filter(split(col("text"), " "), w => w =!= "")
    d.select(
      col("doc_id"),
      size(words).as("n_words"),
      size(filter(words, w => length(w) > 4)).as("n_long_words"),
      exists(words, w => w === "spark").as("has_spark"),
      array_join(transform(slice(sort_array(array_distinct(words)), 1, 3), w => upper(w)), ",")
        .as("first3_upper"),
      aggregate(words, lit(0), (acc, w) => acc + length(w)).as("total_chars"))
  }

  val q22Oracle: String =
    """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws FROM documents)
      |SELECT doc_id,
      |  CAST(len(ws) AS INT) AS n_words,
      |  CAST(len(list_filter(ws, w -> length(w) > 4)) AS INT) AS n_long_words,
      |  list_contains(ws, 'spark') AS has_spark,
      |  array_to_string(list_transform(list_sort(list_distinct(ws))[1:3], w -> upper(w)), ',') AS first3_upper,
      |  CAST(list_sum(list_transform(ws, w -> length(w))) AS INT) AS total_chars
      |FROM t""".stripMargin

  /** Map construction + access: MAP_FROM_ENTRIES over collected structs,
    * ELEMENT_AT, SIZE (reference: models/spark/b2b_mart/key/
    * interactions_funnel.sql:48, models/spark/gold/gold_orders.sql:70,90). */
  def q23MapStruct(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val perType = e.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    perType.groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt")))).as("m"))
      .select(
        col("user_id"),
        coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"),
        coalesce(element_at(col("m"), "error"), lit(0L)).as("n_error"),
        size(col("m")).as("n_types"))
  }

  val q23Oracle: String =
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
      |  CAST(COUNT(DISTINCT event_type) AS INT) AS n_types
      |FROM events GROUP BY 1""".stripMargin

  /** millis_to_ts_msk / millis_to_ts — the reference's server-registered UDFs
    * (SURVEY.md §2.8; 191 + 38 call sites), exercised through the SQL
    * registration path: MSK naive +3h shift moves date boundaries. */
  def q24MskDates(spark: SparkSession, dir: String): DataFrame = {
    TimeFunctions.register(spark)
    Tables(spark, dir, "events").createOrReplaceTempView("events")
    spark.sql(
      """SELECT to_date(millis_to_ts_msk(ts_ns div 1000000)) AS msk_date,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  count_if(to_date(millis_to_ts_msk(ts_ns div 1000000))
        |           <> to_date(millis_to_ts(ts_ns div 1000000))) AS n_shifted
        |FROM events GROUP BY 1""".stripMargin)
      .withColumn("msk_date", date_format(col("msk_date"), "yyyy-MM-dd"))
  }

  val q24Oracle: String =
    """SELECT strftime(CAST(epoch_ms(epoch_ns(ts) // 1000000 + 10800000) AS DATE), '%Y-%m-%d') AS msk_date,
      |  COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(count_if(CAST(epoch_ms(epoch_ns(ts) // 1000000 + 10800000) AS DATE)
      |           <> CAST(epoch_ms(epoch_ns(ts) // 1000000) AS DATE)) AS BIGINT) AS n_shifted
      |FROM events GROUP BY 1""".stripMargin
}
