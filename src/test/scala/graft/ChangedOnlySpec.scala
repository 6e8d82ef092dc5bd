package graft

import java.nio.file.{Files, Path, Paths}

import graft.runtime.{CorpusExecute, CorpusSweep}

/** Gates CHANGED-ONLY EXECUTION end-to-end — the reference's primary dev
  * loop (`run.sh --changed-only`: run only changed models + all transitive
  * children, reuse everything else's tables from the previous deploy;
  * infra/dbtjoom/find.py:9-15, infra/get_tables_to_copy_from_prod.py).
  *
  * Test 1 runs the full loop on a small on-disk corpus with a PERSISTENT
  * warehouse: cold deploy → edit one mid-DAG model → changed-only rerun.
  * Asserts the executed set is exactly the edit's descendant closure, that
  * every other node is reused (tables from disk, views re-registered), and
  * that the re-executed nodes' output schemas are identical to a
  * from-scratch full deploy of the edited corpus.
  *
  * Test 2 pins the subset computation itself (descendantClosure over
  * corpusGraph — the same edges run() executes with) on the REAL reference
  * manifest, with hand-verified members (each edge read in the model file).
  */
class ChangedOnlySpec extends SparkSpec {

  // ---- end-to-end on a synthetic corpus -----------------------------------

  /** 6 nodes: b's edit must re-run {b, c} only; a, d are reused from disk,
    * v (a VIEW — no on-disk materialization) is re-registered, and e (a
    * table reading THROUGH the re-registered view) is reused from disk.
    *   a(table) ─→ b(table) ─→ c(table)
    *   d(table) ─→ v(view) ─→ e(table)
    */
  private def writeCorpus(dir: Path, bReads: String): Unit = {
    val models = dir.resolve("models"); Files.createDirectories(models)
    Seq("macros", "seeds", "snapshots").foreach(d => Files.createDirectories(dir.resolve(d)))
    Files.writeString(models.resolve("co_a.sql"),
      """{{ config(schema='probe', materialized='table', file_format='parquet') }}
        |SELECT a.order_id, a.amount FROM {{ source('co_db', 'raw_a') }} AS a
        |""".stripMargin)
    Files.writeString(models.resolve("co_b.sql"),
      s"""{{ config(schema='probe', materialized='table', file_format='parquet') }}
         |SELECT b.user_id, $bReads, t.amount
         |FROM {{ source('co_db', 'raw_b') }} AS b
         |JOIN {{ ref('co_a') }} AS t ON b.user_id = t.order_id
         |""".stripMargin)
    Files.writeString(models.resolve("co_c.sql"),
      """{{ config(schema='probe', materialized='table', file_format='parquet') }}
        |SELECT user_id FROM {{ ref('co_b') }}
        |""".stripMargin)
    Files.writeString(models.resolve("co_d.sql"),
      """{{ config(schema='probe', materialized='table', file_format='parquet') }}
        |SELECT d.k1, d.k2 FROM {{ source('co_db', 'raw_d') }} AS d
        |""".stripMargin)
    Files.writeString(models.resolve("co_v.sql"),
      """{{ config(schema='probe', materialized='view', file_format='parquet') }}
        |SELECT k1 FROM {{ ref('co_d') }}
        |""".stripMargin)
    Files.writeString(models.resolve("co_e.sql"),
      """{{ config(schema='probe', materialized='table', file_format='parquet') }}
        |SELECT k1 FROM {{ ref('co_v') }}
        |""".stripMargin)
  }

  test("END-TO-END changed-only execution: one-model edit executes only its " +
    "descendant closure, reuses the rest from the persistent warehouse") {
    val corpus = Paths.get(graft.runtime.TempDirs.create("graft_co_e2e").toString)
    val cache = corpus.resolve("cache/synth.parquet")
    val wh = corpus.resolve("warehouse")
    def go(c: Path, changedOnly: Boolean = false,
           whDir: Option[Path] = Some(wh)): CorpusExecute.Report =
      CorpusExecute.run(spark,
        corpus.resolve("models"), corpus.resolve("macros"),
        corpus.resolve("snapshots"), corpus.resolve("seeds"),
        cacheOverride = Some(c), changedOnly = changedOnly,
        warehouseDir = whDir)
    def byStatus(r: CorpusExecute.Report, st: String): Set[String] =
      r.items.filter(_.status == st).map(_.name).toSet
    val all = Set("co_a", "co_b", "co_c", "co_d", "co_v", "co_e")

    writeCorpus(corpus, "b.city")
    // changed-only on a COLD cache degrades to the full run (no change
    // detector yet) — nothing is reused
    val cold = go(cache, changedOnly = true)
    assert(byStatus(cold, "executed") == all, cold.describe)
    assert(byStatus(cold, "reused").isEmpty)

    // the dev-loop edit: co_b now reads region, not city
    writeCorpus(corpus, "b.region")
    val inc = go(cache, changedOnly = true)
    assert(byStatus(inc, "executed") == Set("co_b", "co_c"), inc.describe)
    assert(byStatus(inc, "reused") == Set("co_a", "co_d", "co_v", "co_e"),
      inc.describe)
    // view vs table reuse are distinguishable in the report detail
    assert(inc.items.find(_.name == "co_v").exists(
      _.detail == "changed-only:view-reregistered"))
    assert(inc.items.find(_.name == "co_e").exists(
      _.detail == "changed-only:on-disk"))
    // the re-negotiated source schema reflects the edit
    assert(inc.sourceCatalog(("co_db", "raw_b")).fieldNames.map(_.toLowerCase)
      .toSet.contains("region"))

    // equivalence bar: a from-scratch FULL deploy of the edited corpus into
    // a fresh warehouse must produce identical output schemas on the
    // re-executed nodes (0-row corpus semantics: the schema IS the output)
    val wh2 = corpus.resolve("warehouse_full")
    val full = go(corpus.resolve("cache2/synth.parquet"), whDir = Some(wh2))
    assert(byStatus(full, "executed") == all, full.describe)
    val whA = new graft.runtime.Warehouse(spark, wh.toString)
    val whB = new graft.runtime.Warehouse(spark, wh2.toString)
    for (n <- Seq("co_b", "co_c", "co_a", "co_d", "co_e")) {
      val sa = whA.read(n).schema.map(f => (f.name.toLowerCase, f.dataType))
      val sb = whB.read(n).schema.map(f => (f.name.toLowerCase, f.dataType))
      assert(sa == sb, s"$n: changed-only output schema $sa != full deploy $sb")
    }

    // third run, nothing edited: NOTHING executes — the whole corpus reuses
    val noop = go(cache, changedOnly = true)
    assert(byStatus(noop, "executed").isEmpty, noop.describe)
    assert(byStatus(noop, "reused") == all, noop.describe)
  }

  test("macro edit invalidates exactly its callers' closure (macro-granular " +
    "env invalidation)") {
    val corpus = Paths.get(graft.runtime.TempDirs.create("graft_co_macro").toString)
    val cache = corpus.resolve("cache/synth.parquet")
    val wh = corpus.resolve("warehouse")
    def go(changedOnly: Boolean): CorpusExecute.Report = CorpusExecute.run(spark,
      corpus.resolve("models"), corpus.resolve("macros"),
      corpus.resolve("snapshots"), corpus.resolve("seeds"),
      cacheOverride = Some(cache), changedOnly = changedOnly,
      warehouseDir = Some(wh))
    def byStatus(r: CorpusExecute.Report, st: String): Set[String] =
      r.items.filter(_.status == st).map(_.name).toSet

    writeCorpus(corpus, "b.city")
    def writeMacro(body: String): Unit =
      Files.writeString(corpus.resolve("macros/util.sql"),
        s"{% macro pick_flag(t) %}$body{% endmacro %}\n")
    writeMacro("{{ t }}.flag_v1")
    // co_b now calls the macro; co_c stays its plain downstream
    Files.writeString(corpus.resolve("models").resolve("co_b.sql"),
      """{{ config(schema='probe', materialized='table', file_format='parquet') }}
        |SELECT b.user_id, {{ pick_flag('b') }} AS flag, t.amount
        |FROM {{ source('co_db', 'raw_b') }} AS b
        |JOIN {{ ref('co_a') }} AS t ON b.user_id = t.order_id
        |""".stripMargin)
    val cold = go(changedOnly = true) // cold cache: degrades to full
    assert(byStatus(cold, "executed").size == 6, cold.describe)
    assert(cold.sourceCatalog(("co_db", "raw_b")).fieldNames
      .map(_.toLowerCase).toSet.contains("flag_v1"))

    // the macro edit: only co_b renders it, so only {co_b, co_c} re-run
    writeMacro("{{ t }}.flag_v2")
    val inc = go(changedOnly = true)
    assert(byStatus(inc, "executed") == Set("co_b", "co_c"), inc.describe)
    assert(byStatus(inc, "reused") == Set("co_a", "co_d", "co_v", "co_e"),
      inc.describe)
    assert(inc.sourceCatalog(("co_db", "raw_b")).fieldNames
      .map(_.toLowerCase).toSet.contains("flag_v2"))

    // seeds/vars stay whole-cache: touching a seed file still cold-starts
    Files.writeString(corpus.resolve("seeds/some_seed.csv"), "id\n1\n")
    val seedEdit = go(changedOnly = true)
    assert(byStatus(seedEdit, "reused").isEmpty,
      "a seed edit must invalidate the whole cache (core env)")
  }

  test("nodesUsingMacros closes over macro-in-macro calls") {
    import graft.runtime.SqlTemplater.MacroDef
    val macros = Map(
      "leaf_fmt" -> MacroDef(Seq("x"), "CAST({{ x }} AS STRING)"),
      "mid_wrap" -> MacroDef(Seq("x"), "UPPER(leaf_fmt(x = {{ x }}))"),
      "unrelated" -> MacroDef(Nil, "1"))
    def node(name: String, sql: String) =
      CorpusExecute.Node(name, "model", sql, Nil, () => null)
    val nodes = Seq(
      node("uses_leaf", "SELECT {{ leaf_fmt(x = 'a') }} FROM t"),
      node("uses_mid", "SELECT {{ mid_wrap(x = 'a') }} FROM t"),
      node("uses_none", "SELECT 1"),
      // leaf_fmt as a SUBSTRING of another identifier must not match
      node("uses_similar", "SELECT my_leaf_fmt(a) FROM t"))
    assert(CorpusExecute.nodesUsingMacros(Set("leaf_fmt"), macros, nodes) ==
      Set("uses_leaf", "uses_mid"))
    assert(CorpusExecute.nodesUsingMacros(Set("unrelated"), macros, nodes) ==
      Set.empty)
    assert(CorpusExecute.nodesUsingMacros(Set.empty, macros, nodes) == Set.empty)
  }

  // ---- subset computation pinned on the real manifest ---------------------

  private lazy val refGraph: Seq[CorpusExecute.Node] = {
    val base = Paths.get("/root/reference")
    val macros = CorpusSweep.loadMacros(base.resolve("macros"))
    CorpusExecute.corpusGraph(spark, base.resolve("models"),
      base.resolve("macros"), base.resolve("snapshots"), base.resolve("seeds"),
      macros, CorpusSweep.defaultVars ++ Map(
        "run_ts" -> "2025-10-01 00:00:00", "run_dow" -> "1")).nodes
  }

  test("changed-only subset on the real manifest: the user_points_transactions " +
    "edit closure, hand-verified members") {
    val closure = CorpusExecute.descendantClosure(refGraph,
      Set("user_points_transactions"))
    // hand-verified dependency chain (each edge read in the model file):
    //   user_points_transactions -> bloggers (core/bloggers/bloggers.sql
    //     refs it) -> gold_orders (gold/gold_orders.sql) -> dsa_orders
    //     (dsa/dsa_orders.sql)
    for (m <- Seq("user_points_transactions", "bloggers", "gold_orders",
        "dsa_orders"))
      assert(closure.contains(m), s"missing hand-verified member $m")
    // its UPSTREAM must not be selected: fact_user_points_transactions is a
    // dependency of user_points_transactions, not a dependent
    assert(!closure.contains("fact_user_points_transactions"),
      "upstream node leaked into the descendant closure")
    // r16's measured dev-loop edit re-negotiated exactly this closure
    assert(closure.size == 37, s"closure size drifted: ${closure.size} " +
      s"(members=${closure.toSeq.sorted.mkString(",")})")
  }

  test("changed-only subset: an edit on a leaf node selects only itself") {
    val leaves = refGraph.filter(n =>
      CorpusExecute.descendantClosure(refGraph, Set(n.name)) == Set(n.name))
    assert(leaves.nonEmpty, "real manifest has no leaf nodes?")
    // dsa_orders is hand-verified terminal: no model refs or raw-reads it
    assert(CorpusExecute.descendantClosure(refGraph, Set("dsa_orders")) ==
      Set("dsa_orders"))
  }
}
