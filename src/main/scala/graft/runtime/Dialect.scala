package graft.runtime

import org.apache.spark.sql.SparkSession

/** The engine's SQL dialect contract.
  *
  * The reference corpus (423 models, 54 snapshots) was authored against
  * dbt-spark 1.7 executing on a Spark 3.x Thrift server
  * (reference: .github/workflows/dbt-jobs-pr-tests.yaml:40,
  * production/profiles/profiles.yml:1-18), where `spark.sql.ansi.enabled`
  * defaults to FALSE — it flipped to true in Spark 4.0. The corpus relies on
  * the non-ANSI behaviors throughout:
  *
  *   - out-of-bounds array index yields NULL, not INVALID_ARRAY_INDEX — e.g.
  *     `variant.attributes.value[0]` over possibly-empty arrays
  *     (reference: models/spark/b2b_mart/fact/fact_quotes_variants.sql:19;
  *     42 model files use literal `[i]` indexing);
  *   - division by zero yields NULL, not DIVIDE_BY_ZERO — e.g.
  *     conversion-rate expressions dividing by a COUNT(DISTINCT) that is 0 on
  *     empty slices (reference:
  *     models/spark/search/success_by_relevance/search_success_aggregated.sql:26-27);
  *   - an invalid cast (`CAST('abc' AS INT)`) yields NULL, not CAST_INVALID_INPUT.
  *
  * Every session that executes model SQL must pin this dialect; a query that
  * runs under ANSI instead silently carries different error/NULL semantics
  * than production. Mains and specs apply [[Dialect.apply]] on the builder;
  * the runtime additionally calls [[Dialect.pin]] at execution entry points
  * as a safety net for sessions the engine did not build (ANSI is a runtime
  * SQLConf, so a live set is effective).
  */
object Dialect {
  val settings: Map[String, String] = Map(
    "spark.sql.ansi.enabled" -> "false")

  /** Apply the dialect to a session builder (mains, specs). */
  def apply(b: SparkSession.Builder): SparkSession.Builder =
    settings.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  /** Pin the dialect on a live session (runtime entry points). */
  def pin(spark: SparkSession): Unit =
    settings.foreach { case (k, v) => spark.conf.set(k, v) }
}
