package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based cross-checks of the scale-shaped operators against naive
  * per-row reference implementations on randomized small inputs. */
object OpsProperties extends Properties("graft.ops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val rowGen = for {
    k <- Gen.choose(0, 3)
    t <- Gen.choose(0L, 50L)
    id <- Gen.choose(0L, 1000L)
  } yield (s"k$k", t, id)

  private val sideGen = Gen.listOfN(25, rowGen)

  property("asOfJoin.backward == naive latest-right-at-or-before") = forAll(sideGen, sideGen) {
    (leftRows, rightRowsRaw) =>
      import spark.implicits._
      // right must be unique per (key, t): keep max id
      val rightRows = rightRowsRaw.groupBy(r => (r._1, r._2))
        .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toSeq
      val leftUnique = leftRows.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) }
      val left = leftUnique.toDF("k", "t", "lid")
      val right = rightRows.toDF("k", "t", "rid")
      val got = graft.ops.AsOfJoin.backward(left, right, Seq("k"), "t", "t")
        .select($"lid", $"r_rid").as[(Long, Option[Long])].collect().toMap
      val expected = leftUnique.map { case (k, t, lid) =>
        val cand = rightRows.filter(r => r._1 == k && r._2 <= t)
        lid -> (if (cand.isEmpty) None
                else Some(cand.maxBy(r => (r._2, r._3))._3))
      }.toMap
      got == expected
  }

  property("asOfJoin.backwardSalted == backward for random inputs, splits, thresholds") =
    forAll(sideGen, sideGen, Gen.choose(2, 6), Gen.oneOf(1L, 3L, 10L)) {
      (leftRows, rightRowsRaw, splits, hotThreshold) =>
      import spark.implicits._
      val rightRows = rightRowsRaw.groupBy(r => (r._1, r._2))
        .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toSeq
      val leftUnique = leftRows.zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) }
      val left = leftUnique.toDF("k", "t", "lid")
      val right = rightRows.toDF("k", "t", "rid")
      val base = graft.ops.AsOfJoin.backward(left, right, Seq("k"), "t", "t")
        .select($"lid", $"r_rid", $"r_t").as[(Long, Option[Long], Option[Long])]
        .collect().toSet
      // hotThreshold=1 chunks EVERY key; 10 usually mixes hot and cold
      val salted = graft.ops.AsOfJoin.backwardSalted(left, right, Seq("k"), "t", "t",
          splits = splits, hotThreshold = hotThreshold, detectSample = 1.0)
        .select($"lid", $"r_rid", $"r_t").as[(Long, Option[Long], Option[Long])]
        .collect().toSet
      base == salted
    }

  private val evGen = Gen.listOfN(30, for {
    k <- Gen.choose(0, 2)
    t <- Gen.choose(0L, 200L)
  } yield (s"u$k", t))

  property("sessionize == naive gap fold") = forAll(evGen, Gen.choose(1L, 40L)) {
    (rows, gap) =>
      import spark.implicits._
      // unique order key per row to make ordering deterministic under ties
      val uniq = rows.zipWithIndex.map { case ((k, t), i) => (k, t * 1000 + i, t) }
      val df = uniq.toDF("k", "ord", "es")
      val got = graft.ops.Sessionize(df, "k", "ord", "es", gap)
        .select($"k", $"ord", $"session_num").as[(String, Long, Long)]
        .collect().map { case (k, o, s) => (k, o) -> s }.toMap
      val expected = uniq.groupBy(_._1).flatMap { case (k, rs) =>
        val sorted = rs.sortBy(_._2)
        var sess = 0L; var prev = Option.empty[Long]
        sorted.map { case (_, ord, es) =>
          if (prev.isEmpty || es - prev.get > gap) sess += 1
          prev = Some(es)
          (k, ord) -> sess
        }
      }
      got == expected
  }

  private val edgeGen = Gen.listOfN(20, for {
    a <- Gen.choose(0L, 15L)
    b <- Gen.choose(0L, 15L)
    if a != b
  } yield (math.min(a, b), math.max(a, b)))

  property("dupGroups == naive union-find components") = forAll(edgeGen) { edges0 =>
    import spark.implicits._
    val edges = if (edges0.nonEmpty) edges0 else List((0L, 1L))
    val pairs = edges.toDF("id_a", "id_b")
    val got = graft.ops.Dedup.dupGroups(pairs)
      .as[(Long, Long)].collect().toMap
    // naive union-find over the same edges (smaller root wins, so the final
    // root of every component is its minimum element)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(v => v -> find(v)).toMap
    got == expected
  }

  property("dupGroupsTwoPhase == dupGroups (large/small-star vs min-label)") =
    forAll(edgeGen) { edges0 =>
      import spark.implicits._
      val edges = if (edges0.nonEmpty) edges0 else List((0L, 1L))
      val pairs = edges.toDF("id_a", "id_b")
      val a = graft.ops.Dedup.dupGroups(pairs).as[(Long, Long)].collect().toMap
      val b = graft.ops.Dedup.dupGroupsTwoPhase(pairs).as[(Long, Long)].collect().toMap
      a == b
    }

  // ---- macro param binding (the templater's Jinja-value semantics) ----

  private val ident = Gen.choose('a', 'z').flatMap(c =>
    Gen.listOfN(5, Gen.alphaNumChar).map(cs => (c :: cs).mkString))
  private val sqlArg = Gen.oneOf(
    ident,                                      // bare splice (a column)
    ident.map(i => s"COALESCE($i, 0)"),         // expression splice
    ident.map(i => s"'$i'"))                    // quoted string value

  property("macro binding: standalone splice = value; expression keeps quoting") =
    forAll(ident, sqlArg) { (p0, arg) =>
      val p = "p_" + p0 // avoid colliding with SQL text in the body
      val defs = runtime.SqlTemplater.parseMacros(
        s"{% macro m($p) %}SELECT {{ $p }} AS v, {% if $p == '$p0' %}1{% else %}0{% endif %} AS hit{% endmacro %}")
      val out = runtime.SqlTemplater.expandMacros(s"{{ m($arg) }}", defs)
      val value = if (arg.startsWith("'")) arg.substring(1, arg.length - 1) else arg
      // standalone {{ p }} spliced the VALUE (quotes stripped)
      val spliceOk = out.startsWith(s"SELECT $value AS v,")
      // the {% if %} context kept the RAW arg: quoted args stay string
      // literals there (== compares values); unquoted args are names, which
      // this engine treats strictly (unknown name = render error, not
      // silently-Undefined like Python Jinja)
      val branchOk =
        if (arg.startsWith("'")) {
          val branch = runtime.Jinja.render(out.substring(out.indexOf(",") + 1),
            runtime.Jinja.Env(Map.empty, isIncremental = false)).trim
          branch == (if (value == p0) "1 AS hit" else "0 AS hit")
        } else
          scala.util.Try(runtime.Jinja.render(out.substring(out.indexOf(",") + 1),
            runtime.Jinja.Env(Map.empty, isIncremental = false))).isFailure
      spliceOk && branchOk
    }
}
