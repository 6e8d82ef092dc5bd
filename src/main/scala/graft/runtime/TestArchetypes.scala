package graft.runtime

import org.apache.spark.sql.functions._

/** The reference's four singular-test archetypes as reusable builders
  * (reference: SURVEY.md §5; tests/spark/b2b_mart/
  * procurement_order_id_duplicates_check.sql:1-4 — duplicates;
  * tests/spark/pulse/brand_name_fraction_null_check.sql — fractional nulls;
  * tests/spark/pulse/categories_gmv_by_month_check.sql:1-17 — volume bands
  * with date gating; tests/spark/pulse/product_tracker_items_in_cube.sql —
  * referential containment). A test passes iff its query returns 0 rows.
  */
object TestArchetypes {

  /** Duplicate-key check: GROUP BY keys HAVING COUNT(*) > 1. */
  def dupKeyCheck(model: String, keys: Seq[String]): SingularTest =
    SingularTest(s"${model}_dup_${keys.mkString("_")}", ctx =>
      ctx.ref(model).groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n")).where(col("n") > 1))

  /** Absolute null check: any null in `column` fails. */
  def nullCheck(model: String, column: String): SingularTest =
    SingularTest(s"${model}_null_$column", ctx =>
      ctx.ref(model).where(col(column).isNull))

  /** Fractional null check: fails when null share of `column` exceeds
    * `maxFraction` (emits one offending row with the observed fraction). */
  def nullFractionCheck(model: String, column: String, maxFraction: Double): SingularTest =
    SingularTest(s"${model}_nullfrac_${column}_gt$maxFraction", ctx =>
      ctx.ref(model)
        .agg((count_if(col(column).isNull).cast("double") / count(lit(1)))
          .as("null_fraction"))
        .where(col("null_fraction") > maxFraction))

  /** Volume/drift band: fails for groups whose metric leaves [lo, hi].
    * `gate` reproduces the reference's date-gating (e.g. only fail in the
    * first days of a month); pass `lit(true)` for ungated. */
  def volumeBandCheck(name: String, model: String, groupCol: String,
                      metric: org.apache.spark.sql.Column,
                      lo: Double, hi: Double,
                      gate: org.apache.spark.sql.Column = lit(true)): SingularTest =
    SingularTest(name, ctx =>
      ctx.ref(model).groupBy(col(groupCol)).agg(metric.as("metric"))
        .where((col("metric") < lo || col("metric") > hi) && gate))

  /** Referential containment: child keys that do not exist in the parent. */
  def referentialCheck(childModel: String, childKey: String,
                       parentModel: String, parentKey: String): SingularTest =
    SingularTest(s"${childModel}_${childKey}_in_${parentModel}", ctx =>
      ctx.ref(childModel).select(col(childKey)).distinct()
        .join(ctx.ref(parentModel).select(col(parentKey)).distinct(),
          col(childKey) === col(parentKey), "left_anti"))
}
