package graft

import org.apache.spark.sql.functions._
import graft.ops.Sessionize
import graft.streaming.Streaming

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming session_window matches batch sessionization per user") {
    // batch sessions at micros precision (same clock the stream sees)
    val batch = Sessionize(
      Tables(spark, dir, "events").withColumn("us", expr("ts_ns div 1000")),
      "user_id", "ts_ns", "us", 1800L * 1000000)
      .groupBy($"user_id").agg(countDistinct($"session_num").as("n_sessions"))
      .as[(Long, Long)].collect().toMap

    val streamed = Streaming.runToMemory(
      Streaming.sessionAggs(Streaming.eventsStream(spark, dir)), "sess_out")
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"))
      .as[(Long, Long)].collect().toMap

    assert(streamed == batch,
      s"streaming vs batch session counts differ: ${streamed.toSeq.sorted} vs ${batch.toSeq.sorted}")
  }

  test("mapGroupsWithState running counts match batch aggregates") {
    val out = Streaming.statefulUserCounts(Streaming.eventsStream(spark, dir))
    runStatefulAssertions(out)
  }

  private def runStatefulAssertions(out: org.apache.spark.sql.DataFrame): Unit = {
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("state_out").start()
    try q.processAllAvailable() finally q.stop()
    // last update per user = final state
    val got = spark.table("state_out")
      .groupBy($"user_id")
      .agg(max($"n_events").as("n"), min($"first_ts_ns").as("f"))
      .as[(Long, Long, Long)].collect().toSet
    val expected = Tables(spark, dir, "events")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), min($"ts_ns").as("f"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("stateful counts TTL expires idle keys; fresh state after expiry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val out = Streaming.statefulUserCounts(
      in.toDF().toDF("user_id", "ts_ns"), stateTtl = Some("1 milliseconds"))
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("ttl_out").start()
    // processing-time timers schedule batches forever, so processAllAvailable
    // never settles under a TTL — poll the sink instead
    def rows = spark.table("ttl_out").as[(Long, Long, Long)].collect().toSeq
    def await(cond: => Boolean): Unit = {
      val deadline = System.currentTimeMillis + 60000
      while (!cond && System.currentTimeMillis < deadline) Thread.sleep(100)
      assert(cond, rows.toString)
    }
    try {
      in.addData((1L, 100L))
      await(rows.contains((1L, 1L, 100L)))
      Thread.sleep(500) // let key 1's 1ms TTL lapse; timer batches fire it
      in.addData((1L, 300L)) // key 1 must restart fresh, not resume at n=2
      await(rows.contains((1L, 1L, 300L)))
      // the state really was dropped, not carried (no (1, 2, _) row anywhere)
      assert(!rows.exists(r => r._1 == 1L && r._2 == 2L), rows.toString)
    } finally q.stop()
  }

  test("streaming exact dedup keeps exactly one row per batch content group") {
    val streamed = Streaming.runToMemory(
      Streaming.dedupStream(Streaming.documentsStream(spark, dir)),
      "dedup_out", outputMode = "append")
    val batchGroups = Tables(spark, dir, "documents")
      .select(graft.ops.Dedup.contentKey($"text")).distinct()
      .as[String].collect().toSet
    val streamedKeys = streamed.select($"content_sha").as[String].collect().toSeq
    assert(streamedKeys.size == streamedKeys.toSet.size, "stream emitted duplicate keys")
    assert(streamedKeys.toSet == batchGroups, "stream/batch content groups differ")
  }

  test("foreachBatch upsert sink merges each micro-batch by key (CDC shape)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ctx = freshCtx()
    val input = MemoryStream[(Long, String, Int, Long)]
    val stream = input.toDF().toDF("id", "part_col", "v", "seq")
    val q = Streaming.upsertSink(stream, ctx.warehouse, "cdc_fact",
      Seq("id"), "seq", Seq("part_col"))
    try {
      // batch 1: initial inserts (incl. two versions of id=2 — latest seq wins)
      input.addData((1L, "p1", 10, 1L), (2L, "p1", 20, 2L), (2L, "p1", 21, 3L),
        (3L, "p2", 30, 4L))
      q.processAllAvailable()
      assert(ctx.warehouse.read("cdc_fact").select($"id", $"part_col", $"v")
        .as[(Long, String, Int)].collect().toSet ==
        Set((1L, "p1", 10), (2L, "p1", 21), (3L, "p2", 30)))
      // batch 2: update id=1, move id=3 across partitions, insert id=4
      input.addData((1L, "p1", 11, 5L), (3L, "p1", 33, 6L), (4L, "p3", 40, 7L))
      q.processAllAvailable()
      assert(ctx.warehouse.read("cdc_fact").select($"id", $"part_col", $"v")
        .as[(Long, String, Int)].collect().toSet ==
        Set((1L, "p1", 11), (2L, "p1", 21), (3L, "p1", 33), (4L, "p3", 40)))
    } finally q.stop()
  }

  test("tumbling-window counts conserve totals") {
    val out = Streaming.runToMemory(
      Streaming.minuteCounts(Streaming.eventsStream(spark, dir)), "win_out")
    val streamTotal = out.agg(sum($"n")).as[Long].head()
    val batchTotal = Tables(spark, dir, "events").count()
    assert(streamTotal == batchTotal)
  }
}
