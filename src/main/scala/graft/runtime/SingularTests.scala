package graft.runtime

import org.apache.spark.sql.DataFrame

/** Singular data tests: a test is a query; it PASSES iff it returns zero rows
  * (reference: 25 tests under tests/spark/;
  * tests/spark/b2b_mart/procurement_order_id_duplicates_check.sql:1-4 —
  * duplicate keys; tests/spark/pulse/brand_name_fraction_null_check.sql —
  * fractional null thresholds; tests/spark/pulse/categories_gmv_by_month_check.sql:1-17
  * — volume drift bands with date gating).
  */
final case class SingularTest(name: String, build: Ctx => DataFrame,
                              tags: Set[String] = Set.empty)

object SingularTests {

  final case class TestResult(name: String, offendingRows: Long, error: Option[String]) {
    def passed: Boolean = offendingRows == 0 && error.isEmpty
  }

  def run(ctx: Ctx, tests: Seq[SingularTest]): Seq[TestResult] =
    tests.map { t =>
      try TestResult(t.name, t.build(ctx).count(), None)
      catch { case e: Exception => TestResult(t.name, -1, Some(e.getMessage)) }
    }

  /** SQL-text test (same templating surface as SQL models). */
  def sqlTest(name: String, sql: String, tags: Set[String] = Set.empty): SingularTest =
    SingularTest(name, ctx => SqlTemplater.runSql(ctx, name, sql), tags)
}

/** Generic (column-level) schema tests — dbt's four standard generics as
  * engine extensions (the reference uses only singular tests, so these are
  * extension scope: same pass-iff-zero-rows contract, composable with
  * [[SingularTests.run]]). Each builder returns a SingularTest whose query
  * selects the OFFENDING rows, so failures are inspectable, not just counted.
  *
  * Scale note: every generic compiles to one partial-aggregated groupBy or
  * broadcast-able anti-join over the single tested column — never a full-row
  * shuffle.
  */
object GenericTests {
  import org.apache.spark.sql.functions._

  /** dbt `unique`: offending rows = values appearing more than once. */
  def unique(model: String, column: String): SingularTest =
    SingularTest(s"${model}_${column}_unique", ctx =>
      ctx.ref(model).groupBy(col(column)).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1))

  /** dbt `not_null`. */
  def notNull(model: String, column: String): SingularTest =
    SingularTest(s"${model}_${column}_not_null", ctx =>
      ctx.ref(model).filter(col(column).isNull).select(col(column)))

  /** dbt `accepted_values`. NULLs pass (dbt semantics: pair with not_null). */
  def acceptedValues(model: String, column: String, values: Seq[Any]): SingularTest =
    SingularTest(s"${model}_${column}_accepted_values", ctx =>
      ctx.ref(model)
        .filter(col(column).isNotNull && !col(column).isin(values: _*))
        .groupBy(col(column)).agg(count(lit(1)).as("n")))

  /** dbt `relationships`: every non-null child value must exist in the
    * parent column (referential integrity; anti-join, broadcast-able when
    * the parent key set is dimension-sized). */
  def relationships(model: String, column: String,
                    toModel: String, toColumn: String): SingularTest =
    SingularTest(s"${model}_${column}_relationships_${toModel}", ctx => {
      val parent = ctx.ref(toModel).select(col(toColumn).as("__parent_key")).distinct()
      ctx.ref(model).filter(col(column).isNotNull)
        .join(parent, col(column) === col("__parent_key"), "left_anti")
        .select(col(column))
    })
}
