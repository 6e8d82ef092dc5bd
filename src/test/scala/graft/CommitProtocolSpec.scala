package graft

import java.nio.file.{Files, Paths}
import graft.runtime._

/** [[TableCommitProtocol.PointerSwap]] — the object-store commit path:
  * immutable version directories published by an atomic single-FILE pointer
  * swap, never a directory rename. The whole warehouse resolves physical
  * access through the protocol, so the same pipelines run unchanged on
  * either protocol; these specs pin that equivalence and the no-rename
  * invariant itself. */
class CommitProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def pointerCtx(): Ctx = {
    val wh = new Warehouse(spark, TempDirs.create("graft_ps"),
      identity, new TableCommitProtocol.PointerSwap)
    Ctx(spark, wh, SourceRegistry.overDir(spark, "/root/testdata/sf0.001"))
  }

  test("PointerSwap: replace publishes a version dir + pointer; logical dir never renamed onto") {
    val ctx = pointerCtx()
    val wh = ctx.warehouse
    wh.createTable("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    assert(wh.read("t").count() == 2)

    wh.replaceTable("t", Seq((1, "a2"), (3, "c")).toDF("id", "v"))
    val rows1 = wh.read("t").as[(Int, String)].collect().toSet
    assert(rows1 == Set((1, "a2"), (3, "c")))
    val logical = Paths.get(wh.tablePath("t"))
    // the publish was a pointer flip: data lives in t.__v1, the pointer
    // file names it, and nothing was ever renamed onto the logical path
    assert(!Files.exists(logical), "logical dir must not exist after a pointer-swap replace")
    assert(Files.readString(logical.resolveSibling("t.__current")).trim == "t.__v1")
    assert(Files.exists(logical.resolveSibling("t.__v1")))

    wh.replaceTable("t", Seq((9, "z")).toDF("id", "v"))
    assert(wh.read("t").as[(Int, String)].collect().toSet == Set((9, "z")))
    assert(Files.readString(logical.resolveSibling("t.__current")).trim == "t.__v2")
    assert(Files.exists(logical.resolveSibling("t.__v2")))
    assert(!Files.exists(logical.resolveSibling("t.__v1")), "replaced version is retired")

    // canonical schema + exists + in-place ops all resolve through the pointer
    assert(wh.tableExists("t"))
    assert(wh.canonicalSchema("t").map(_.fieldNames.toSeq) == Some(Seq("id", "v")))
    wh.append("t", Seq((10, "y")).toDF("id", "v"))
    assert(wh.read("t").as[(Int, String)].collect().toSet == Set((9, "z"), (10, "y")))
  }

  test("PointerSwap: orphan version dir and corrupt pointer don't wedge future publishes") {
    val ctx = pointerCtx()
    val wh = ctx.warehouse
    wh.createTable("t", Seq((1, "a")).toDF("id", "v"))
    wh.replaceTable("t", Seq((2, "b")).toDF("id", "v")) // -> t.__v1
    val logical = Paths.get(wh.tablePath("t"))

    // simulate a crash between the version-dir move and the pointer flip:
    // an orphan dir exists at the next version number
    Files.createDirectories(logical.resolveSibling("t.__v2"))
    wh.replaceTable("t", Seq((3, "c")).toDF("id", "v")) // must NOT collide
    assert(wh.read("t").as[(Int, String)].collect().toSet == Set((3, "c")))
    assert(Files.readString(logical.resolveSibling("t.__current")).trim == "t.__v3")
    assert(!Files.exists(logical.resolveSibling("t.__v2")), "orphan retired")

    // corrupt pointer: publish still succeeds and self-heals the pointer
    Files.writeString(logical.resolveSibling("t.__current"), "t.__v")
    wh.replaceTable("t", Seq((4, "d")).toDF("id", "v"))
    assert(wh.read("t").as[(Int, String)].collect().toSet == Set((4, "d")))
    assert(Files.readString(logical.resolveSibling("t.__current")).trim == "t.__v4")
  }

  test("PointerSwap: SCD2 snapshot history identical to the rename protocol") {
    def history(ctx: Ctx): Set[(String, String, Option[String])] = {
      var rows = Seq(("k1", "v1", 1000L), ("k2", "w1", 1000L))
      val model = Model("snap", c => {
        import c.spark.implicits._
        rows.toDF("_id", "payload", "utms")
          .selectExpr("_id", "payload", "CAST(utms / 1000 AS TIMESTAMP) AS updated_at")
      }, Materialization.Snapshot("_id", Scd2Strategy.Timestamp("updated_at"),
        invalidateHardDeletes = true))
      def run(at: String): Unit =
        new DagRunner(Seq(model)).run(ctx.copy(vars = Map("run_ts" -> at)))
          .foreach { case (n, st) => assert(st.isInstanceOf[RunStatus.Success], s"$n: $st") }
      run("2024-02-01 00:00:00")
      rows = Seq(("k1", "v2", 2000L)) // k1 changes, k2 hard-deleted
      run("2024-03-01 00:00:00")
      ctx.ref("snap").selectExpr("_id", "payload",
        "CAST(dbt_valid_to AS STRING)")
        .as[(String, String, Option[String])].collect().toSet
    }
    val viaPointer = history(pointerCtx())
    val viaRename = history(freshCtx(vars = Map("run_ts" -> "2024-02-01 00:00:00")))
    assert(viaPointer == viaRename, s"$viaPointer vs $viaRename")
    assert(viaPointer.exists { case (id, p, to) => id == "k1" && p == "v2" && to.isEmpty })
  }
}
