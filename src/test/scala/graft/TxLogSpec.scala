package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.plans.TxLog

/** The transaction-log table format: commit atomicity (version claims),
  * snapshot isolation via tombstones + vacuum retention, time travel,
  * checkpoint-bounded replay, dynamic-partition overwrite semantics, and
  * manifest-driven partition pruning. */
class TxLogSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable() =
    Paths.get(graft.runtime.TempDirs.create("graft_txlog_spec")).resolve("t")

  private def df(rows: (Int, String, Double)*) =
    rows.toSeq.toDF("id", "part", "value")

  test("overwrite/append/overwritePartitions replay to the expected live set") {
    val t = freshTable()
    TxLog.overwrite(t, df((1, "a", 1.0), (2, "b", 2.0)), Seq("part"))
    TxLog.append(t, df((3, "a", 3.0)))
    // replace partition b only; a untouched
    TxLog.overwritePartitions(t, df((9, "b", 9.0)), Seq("part"))
    val live = TxLog.read(spark, t).select($"id", $"part", $"value")
      .as[(Int, String, Double)].collect().toSet
    assert(live == Set((1, "a", 1.0), (3, "a", 3.0), (9, "b", 9.0)))
    // a partition absent from the incoming frame is never touched
    TxLog.overwritePartitions(t, df((7, "c", 7.0)), Seq("part"))
    val live2 = TxLog.read(spark, t).select($"id").as[Int].collect().toSet
    assert(live2 == Set(1, 3, 9, 7))
  }

  test("time travel: every historical version stays readable until vacuumed") {
    val t = freshTable()
    TxLog.overwrite(t, df((1, "a", 1.0)), Seq("part"))          // v0
    TxLog.append(t, df((2, "b", 2.0)))                          // v1
    TxLog.overwrite(t, df((5, "c", 5.0)), Seq("part"))          // v2
    assert(TxLog.read(spark, t, asOf = 0L).count() == 1)
    assert(TxLog.read(spark, t, asOf = 1L).count() == 2)
    assert(TxLog.read(spark, t).count() == 1)
    assert(TxLog.snapshot(t).version == 2L)
    assert(TxLog.history(t).map(_._1) == Seq(0L, 1L, 2L))
  }

  test("version claim is atomic: a pre-claimed version forces retry, not corruption") {
    val t = freshTable()
    TxLog.overwrite(t, df((1, "a", 1.0)), Seq("part")) // v0
    // simulate a concurrent writer that claimed v1 with its own commit:
    // an empty action list is a valid (no-op) commit
    Files.createDirectories(t.resolve("_txlog"))
    Files.writeString(t.resolve("_txlog").resolve(f"${1L}%020d.json"), "")
    // this writer read v0, tries to commit v1, loses, re-reads v1, lands v2
    TxLog.append(t, df((2, "a", 2.0)))
    assert(TxLog.snapshot(t).version == 2L)
    assert(TxLog.read(spark, t).count() == 2)
  }

  test("tombstoned files survive for older-snapshot readers until vacuum") {
    val t = freshTable()
    TxLog.overwrite(t, df((1, "a", 1.0)), Seq("part"))
    val v0Files = TxLog.snapshot(t).files.map(f => t.resolve(f.path))
    TxLog.overwrite(t, df((2, "b", 2.0)), Seq("part")) // tombstones v0's files
    assert(v0Files.forall(Files.exists(_)), "tombstoned bytes must remain until vacuum")
    assert(TxLog.read(spark, t, asOf = 0L).select($"id").as[Int].head() == 1)
    // retention window still open: nothing reclaimed
    assert(TxLog.vacuum(t, retentionMs = 60 * 60 * 1000L) == 0)
    assert(v0Files.forall(Files.exists(_)))
    // retention elapsed: tombstones reclaimed, live files untouched
    assert(TxLog.vacuum(t, retentionMs = -1L) == v0Files.size)
    assert(v0Files.forall(!Files.exists(_)))
    assert(TxLog.read(spark, t).select($"id").as[Int].head() == 2)
  }

  test("orphans from a crashed writer are reclaimed by vacuum, never made live") {
    val t = freshTable()
    TxLog.overwrite(t, df((1, "a", 1.0)), Seq("part"))
    // a crashed writer left a staged-but-never-committed file in data/
    val orphan = t.resolve("data").resolve("deadbeef-orphan.parquet")
    Files.writeString(orphan, "not really parquet")
    assert(TxLog.read(spark, t).count() == 1, "orphan must not be visible to readers")
    assert(TxLog.vacuum(t, retentionMs = -1L) == 1)
    assert(!Files.exists(orphan))
  }

  test("checkpoint bounds replay and yields the identical snapshot") {
    val t = freshTable()
    TxLog.overwrite(t, df((0, "a", 0.0)), Seq("part"))
    for (i <- 1 to 12) TxLog.append(t, df((i, "a", i.toDouble)))
    val cps = Files.list(t.resolve("_txlog")).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (cps.hasNext) names += cps.next().getFileName.toString
    assert(names.exists(_.endsWith(".checkpoint.json")), "expected a checkpoint at v10")
    // snapshot resolved through the checkpoint equals the full live set
    assert(TxLog.read(spark, t).count() == 13)
    assert(TxLog.snapshot(t).files.size == TxLog.snapshot(t, 12L).files.size)
  }

  test("compaction coalesces the live set, preserves rows and old snapshots") {
    val t = freshTable()
    TxLog.overwrite(t, df((0, "a", 0.0)), Seq("part"))
    for (i <- 1 to 8) TxLog.append(t, df((i, "a", i.toDouble)))
    val before = TxLog.snapshot(t)
    assert(before.files.size >= 9, s"appends should accumulate files: ${before.files.size}")
    val v = TxLog.compact(spark, t, targetFiles = 1)
    val after = TxLog.snapshot(t)
    assert(after.files.size < before.files.size,
      s"compaction must shrink the file count: ${before.files.size} -> ${after.files.size}")
    assert(TxLog.read(spark, t).select($"id").as[Int].collect().toSet == (0 to 8).toSet)
    // pre-compaction snapshot still readable (tombstones, not deletes)
    assert(TxLog.read(spark, t, asOf = v - 1).count() == 9)
  }

  test("manifest partition pruning reads only the requested partition's files") {
    val t = freshTable()
    TxLog.overwrite(t, df((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)), Seq("part"))
    val snap = TxLog.snapshot(t)
    val pruned = snap.files.filter(_.partitionValues.get("part").contains("b"))
    assert(pruned.nonEmpty && pruned.size < snap.files.size,
      "partitioned write must produce per-partition files")
    val rows = TxLog.read(spark, t, partitionFilter = _.get("part").contains("b"))
    assert(rows.select($"id").as[Int].collect().toSeq == Seq(2))
  }
}
