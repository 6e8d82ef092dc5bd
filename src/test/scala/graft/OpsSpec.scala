package graft

import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoin, Sessionize}

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("as-of backward join picks latest right <= left, per key") {
    val left = Seq(
      ("u1", 100L, "l1"), ("u1", 205L, "l2"), ("u1", 50L, "l0"),
      ("u2", 100L, "l3")).toDF("k", "t", "lv")
    val right = Seq(
      ("u1", 100L, "r@100"), ("u1", 200L, "r@200"),
      ("u3", 1L, "r-other")).toDF("k", "t", "rv")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t")
      .select($"lv", $"r_rv", $"r_t").as[(String, Option[String], Option[Long])]
      .collect().toSet
    assert(out == Set(
      ("l0", None, None),              // before any right row
      ("l1", Some("r@100"), Some(100L)), // equal time matches (<=)
      ("l2", Some("r@200"), Some(200L)), // latest earlier row wins
      ("l3", None, None)))             // no right rows for u2
  }

  test("sessionize splits on strict gap > threshold") {
    val e = Seq(
      ("u1", 0L), ("u1", 1700L), ("u1", 3500L), // gaps 1700,1800 -> same session
      ("u1", 5301L),                            // gap 1801 -> new session
      ("u2", 10L)).toDF("k", "es")
    val out = Sessionize(e, "k", "es", "es", 1800L)
      .select($"k", $"es", $"session_num").as[(String, Long, Long)].collect().toSet
    assert(out == Set(
      ("u1", 0L, 1L), ("u1", 1700L, 1L), ("u1", 3500L, 1L),
      ("u1", 5301L, 2L), ("u2", 10L, 1L)))
  }

  test("driver entry point returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries smoke: every SparkEntry query runs and returns rows at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    for ((name, fn) <- SparkEntry.queries) {
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
