package graft

import java.nio.file.Paths

import graft.runtime.{CorpusSweep, DagRunner, Model}

/** Selector parity against the REAL reference manifest. DagRunner's
  * changed-only closure (`fillGaps`) was previously gated only on synthetic
  * DAGs; this spec builds the full 423-model ref-graph from the actual
  * corpus (rendered refs, the same edges `dbt ls` would put in the
  * manifest) and pins the selected set for a 3-changed-node dev-loop edit
  * against the closure hand-computed per the reference's
  * `fill_gaps_between_nodes` (infra/dbtjoom/find.py:18-46): a node joins
  * the selection iff it lies on a dependency path between two changed
  * nodes.
  *
  * Hand verification of the pinned set (each edge read in the model file):
  *   fact_user_points_transactions (mart)  -> user_points_transactions
  *     (dashboards/user_points_transactions.sql refs it)
  *   user_points_transactions -> bloggers  (core/bloggers/bloggers.sql)
  *   bloggers -> gold_orders               (gold/gold_orders.sql)
  *   gold_orders -> dsa_orders             (dsa/dsa_orders.sql)
  * Changing {fact_user_points_transactions, gold_orders, dsa_orders} (three
  * domain dirs: mart, gold, dsa) must therefore fill the two gap nodes
  * user_points_transactions + bloggers and NOTHING else.
  */
class SelectorManifestParitySpec extends SparkSpec {

  private lazy val runner: DagRunner = {
    val sweep = CorpusSweep.sweep(spark,
      Paths.get("/root/reference/models"), Paths.get("/root/reference/macros"))
    // manifest view: name + ref edges only (no build bodies are executed);
    // dedup by name the same way the EXECUTE phase does (unique-named nodes)
    val models = sweep.passed.groupBy(_.name).values.map(_.head).toSeq
      .map(r => Model(r.name, build = _ => null, deps = r.refs))
    new DagRunner(models)
  }

  test("changed-only fill-gaps closure on the real manifest matches the " +
    "hand-computed find.py set") {
    val changed = Set("fact_user_points_transactions", "gold_orders", "dsa_orders")
    val got = runner.fillGaps(changed)
    val expected = changed ++ Set("user_points_transactions", "bloggers")
    assert(got == expected,
      s"fill-gaps diverged:\n extra=${(got -- expected).toSeq.sorted}\n " +
        s"missing=${(expected -- got).toSeq.sorted}")
  }

  test("a changed pair with no connecting path fills no gaps") {
    // two leaf-ish nodes in unrelated domains: selection stays exactly the
    // changed set (find.py adds a path only when one target reaches another)
    val changed = Set("dsa_products", "bloggers")
    assert(runner.fillGaps(changed) == changed)
  }
}
