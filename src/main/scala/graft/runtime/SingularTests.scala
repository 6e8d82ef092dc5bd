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
