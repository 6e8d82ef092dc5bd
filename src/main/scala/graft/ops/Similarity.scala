package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (BASELINE.json north star). All vector math is pure Column expressions
  * (`zip_with` + `aggregate`) in double precision — codegen'd, no UDFs.
  *
  * Scale design: brute force is the exactness baseline (queries broadcast,
  * one pass over the corpus, top-k via per-query window). The IVF variant is
  * the 100TB path: corpus partitioned by nearest coarse centroid, queries
  * probe `nProbe` cells, so each query scans corpus/|C|·nProbe instead of
  * everything; recall measured against brute force in the spec.
  */
object Similarity {

  /** Left-to-right double dot product of two float/double array columns,
    * backed by the codegen'd [[graft.functions.VecDot]] expression (register
    * per session; all public entry points below do). Identical results to the
    * `aggregate(zip_with(...))` composition, ~10× less per-pair overhead.
    * Inside [[withComposableDot]] the definitional composition is built
    * instead — the dual-formulation gate for every op in this file. */
  def dot(a: Column, b: Column): Column =
    if (composableDotFlag.get)
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    else graft.functions.VectorFunctions.vecDot(a, b)

  private val composableDotFlag = new ThreadLocal[Boolean] {
    override def initialValue: Boolean = false
  }

  /** Build the plans inside `f` with the composable `aggregate(zip_with(...))`
    * dot product instead of the native VecDot expression. Same fold order,
    * same double math — bit-identical results, ~10× slower per pair; only the
    * dual-formulation Verify gate and specs should use it. (The flag guards
    * driver-side Column CONSTRUCTION, so a thread-local is sound.) */
  def withComposableDot[T](f: => T): T = {
    composableDotFlag.set(true)
    try f finally composableDotFlag.set(false)
  }

  private def registered(df: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession); df
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Pair cosine from a fresh dot and per-side precomputed norms. Produces
    * bit-identical doubles to [[cosine]] (same expression structure) while
    * doing one array pass per pair instead of three — the norms are computed
    * once per row before the pair join. */
  private def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Exact top-k neighbors per query vector (queries must be small enough to
    * broadcast; ties broken by neighbor id). Excludes self-matches. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registered(corpus)
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("qv"), col("cv"), col("qn"), col("cn")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine_sim"))
  }

  /** IVF-style ANN: assign corpus to nearest of `centroids` (broadcast),
    * queries probe their `nProbe` closest cells, exact search within cells.
    * Deterministic: centroids are caller-provided (e.g. a fixed id sample —
    * a k-means refinement drops in without changing the query shape). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              k: Int, nProbe: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registered(corpus)
    // centroids are by definition broadcast-small; holding them as driver
    // metadata (k·d doubles) turns cell assignment into an inline codegen'd
    // expression — a narrow map op, zero shuffle — instead of a
    // crossJoin + per-row window
    val cents = centsOf(centroids, idCol, vecCol)

    def assign(df: DataFrame, id: String, v: String, n: String, keep: Int): DataFrame =
      df.select(col(id), col(v), col(n),
        explode(nearestCents(col(v), col(n), cents, keep)).as("nc"))
        .select(col(id), col(v), col(n), col("nc").getField("cent_id").as("cent_id"))

    val corpusCells = assign(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
        .withColumn("cn", norm(col("cv"))), "neighbor_id", "cv", "cn", 1)
    val queryCells = assign(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
        .withColumn("qn", norm(col("qv"))), "query_id", "qv", "qn", nProbe)

    val scored = queryCells.join(corpusCells, Seq("cent_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("qv"), col("cv"), col("qn"), col("cn")).as("cos"))
      .groupBy(col("query_id"), col("neighbor_id")).agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine_sim"))
  }

  /** A centroid held on the driver between Lloyd rounds: id, coordinates
    * (double), and the precomputed norm. k·d doubles of METADATA — the same
    * thing MLlib's KMeans collects each iteration; row data never leaves the
    * executors. */
  private final case class Cent(id: Long, v: Seq[Double], n: Double)

  private def centsOf(df: DataFrame, idCol: String, vecCol: String): Seq[Cent] =
    df.select(col(idCol).cast("long"), col(vecCol)).collect().toSeq.map { r =>
      // float arrays (parquet embeddings) widen exactly; double arrays pass through
      val v = r.getSeq[Any](1).map {
        case f: Float => f.toDouble
        case d: Double => d
        case n: Number => n.doubleValue()
      }
      // same left-to-right fold as norm(dot(v,v)) on the executor side
      Cent(r.getLong(0), v, math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x)))
    }.sortBy(_.id)

  /** The `keep` nearest centroids for a vector column, best first, ties by
    * ascending centroid id — as ONE inline expression (array_sort of
    * (−cos, id) structs + slice), replacing a crossJoin + window shuffle:
    * assignment becomes a map-side narrow op, which is what lets Lloyd run
    * one shuffle per round and IVF assignment run zero. The centroid matrix
    * enters the plan as a SINGLE typedLit of (id, coords, norm) structs and
    * the per-centroid cosine is a lambda over it — the generated code is
    * identical across Lloyd rounds (only the literal's reference changes),
    * so janino compiles the assignment exactly once per session. */
  private def nearestCents(v: Column, n: Column, cents: Seq[Cent], keep: Int): Column = {
    val centArr = typedLit(cents.map(c => (c.id, c.v, c.n)))
    slice(array_sort(transform(centArr, c =>
      struct((-cosinePre(v, c.getField("_2"), n, c.getField("_3"))).as("negc"),
        c.getField("_1").as("cent_id")))), 1, keep)
  }

  /** Deterministic Lloyd (k-means) refinement of IVF centroids. Assignment
    * to the nearest centroid is an inline codegen'd expression over the
    * driver-held centroid metadata (see [[Cent]] — k·d doubles, the part
    * MLlib also keeps on the driver); the element-wise mean per cell is a
    * single groupBy(cell) with d parallel sums — one map-side-combined
    * shuffle of k·d doubles per round. Empty cells drop out (k shrinks).
    * Plugs straight into [[ivfTopK]].
    *
    * Runs TO CONVERGENCE: stops as soon as no centroid coordinate moved by
    * more than `tol` between rounds (`iters` is the safety cap, like
    * Dedup.dupGroups' maxIter). Movement is driver arithmetic over the
    * collected k·d means — no extra job. Centroid literals re-enter each
    * round's plan fresh, so there is no growing iterative lineage to
    * checkpoint; the points relation is cached once since every round
    * rescans it. */
  def kmeansCentroids(vecs: DataFrame, init: DataFrame, iters: Int = 10,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      tol: Double = 1e-4): DataFrame = {
    registered(vecs)
    val spark = vecs.sparkSession
    val points = vecs.select(col(idCol).as("pid"), col(vecCol).as("pv"))
      .withColumn("pn", norm(col("pv"))).cache()
    var cents = centsOf(init, idCol, vecCol)
    val dims = cents.headOption.map(_.v.size).getOrElse(0)
    var round = 0
    var moved = Double.MaxValue
    // r18 hygiene (guide §5 "unpersist when done"): release the Lloyd scan
    // cache even when a round throws — at 100 TB a leaked cache pins
    // executor storage past the query (r17 VERDICT item 6)
    try {
    while (round < iters && moved > tol) {
      round += 1
      val assigned = points.select(
        nearestCents(col("pv"), col("pn"), cents, 1)(0).getField("cent_id").as("cent_id"),
        col("pv"))
      // element-wise mean per cell as d parallel SUM aggregates + a count —
      // ONE hash aggregate with map-side combine (shuffle: k rows × d cols)
      // and ONE job per Lloyd round, vs the posexplode formulation's n·d
      // exploded rows through two shuffles. sum/count is the same arithmetic
      // Spark's Average performs.
      val sums = (0 until dims).map(d => sum(col("pv")(d).cast("double")).as(s"s$d"))
      val rows = assigned.groupBy(col("cent_id"))
        .agg(count(lit(1)).as("cnt"), sums: _*)
        .collect()
      val prev = cents.map(c => c.id -> c.v).toMap
      cents = rows.toSeq.map { r =>
        val cnt = r.getLong(1).toDouble
        val v = (0 until dims).map(d => r.getDouble(2 + d) / cnt)
        Cent(r.getLong(0), v, math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x)))
      }.sortBy(_.id)
      // max coordinate movement this round (vanished cells count as converged
      // for the cells that remain — k may shrink, which is Lloyd's behavior)
      moved = cents.iterator.flatMap(c => prev.get(c.id).map(p =>
        c.v.zip(p).map { case (a, b) => math.abs(a - b) }.max)).maxOption.getOrElse(0.0)
    }
    } finally points.unpersist()
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      cents.map(c => org.apache.spark.sql.Row(c.id, c.v)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(idCol, org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(vecCol,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))))
  }

  /** IVF centroid training over a BOUNDED uniform sample: collect at most
    * `sampleSize` vectors (deterministic xxhash64 order, ties by id) and run
    * Lloyd to convergence on the driver. This is the FAISS/PQ index-build
    * convention — coarse quantizers are trained on a fixed-size sample, not
    * the corpus — and it is the 100TB shape: the training set is CONSTANT in
    * corpus size (sampleSize·d doubles, same order as the k·d centroid
    * metadata [[centsOf]] already collects), one TakeOrdered job total, and
    * the full corpus is only ever touched by [[ivfTopK]]'s single
    * assignment pass. [[kmeansCentroids]] remains the fully-distributed
    * Lloyd for when the training set must exceed driver memory; identical
    * update arithmetic (mean per cell, same tol/iters contract).
    * Determinism: sample membership, init order, and every Lloyd update are
    * pure functions of (ids, vectors). */
  def kmeansOnSample(vecs: DataFrame, init: DataFrame, sampleSize: Int = 4096,
                     iters: Int = 25, idCol: String = "vec_id",
                     vecCol: String = "embedding", tol: Double = 1e-4): DataFrame = {
    registered(vecs)
    val spark = vecs.sparkSession
    val sample = vecs
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleSize)
      .collect().map(r => r.getSeq[Any](1).map {
        case f: Float => f.toDouble
        case d: Double => d
        case n: Number => n.doubleValue()
      }.toArray)
    var cents = centsOf(init, idCol, vecCol)
    var round = 0
    var moved = Double.MaxValue
    while (round < iters && moved > tol && cents.nonEmpty) {
      round += 1
      // assign each sample point to the nearest centroid by cosine (ties to
      // the lowest centroid id — the same order nearestCents sorts by)
      val sums = scala.collection.mutable.Map.empty[Long, (Array[Double], Long)]
      sample.foreach { p =>
        val pn = math.sqrt(p.foldLeft(0.0)((a, x) => a + x * x))
        val best = cents.minBy(c => (-dotD(p, c.v) / (pn * c.n), c.id))
        val (acc, cnt) = sums.getOrElseUpdate(best.id, (new Array[Double](p.length), 0L))
        var i = 0; while (i < p.length) { acc(i) += p(i); i += 1 }
        sums(best.id) = (acc, cnt + 1)
      }
      val prev = cents.map(c => c.id -> c.v).toMap
      cents = sums.toSeq.map { case (id, (acc, cnt)) =>
        val v = acc.toSeq.map(_ / cnt)
        Cent(id, v, math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x)))
      }.sortBy(_.id)
      moved = cents.iterator.flatMap(c => prev.get(c.id).map(p =>
        c.v.zip(p).map { case (a, b) => math.abs(a - b) }.max)).maxOption.getOrElse(0.0)
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      cents.map(c => org.apache.spark.sql.Row(c.id, c.v)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(idCol, org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(vecCol,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))))
  }

  private def dotD(a: Array[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Exact embedding near-duplicate pairs above a cosine threshold, as a
    * block-tiled self-join: ids hash into `numBlocks` blocks, each unordered
    * block pair (i <= j) is one tile, and every row is replicated to the
    * tiles its block touches, so candidate generation is a plain equi-join
    * on the tile key. Exact all-pairs similarity is inherently O(n²)
    * comparisons; the engineering question is whether that lands as ONE
    * cartesian task or as B(B+1)/2 uniformly sized tiles of 2n/B rows each.
    * This is the latter: shuffle volume (B+1)·n rows, per-task memory
    * bounded by the tile, no CartesianProduct / BroadcastNestedLoopJoin
    * node (plan-pinned in ScaleSpec). Pick B ≈ 2·sqrt(cluster cores) so
    * tiles outnumber slots.
    *
    * Why not LSH candidates here: no fixed hyperplane family gives
    * *provable* recall at cosine >= τ for τ as low as 0.4 — an adversarial
    * pair at angle arccos(τ) can straddle every one of a fixed set of
    * hyperplanes, so sign-bucket candidates (however multi-probed) cannot
    * guarantee the bit-exact output this operator promises, and prefix /
    * pivot filters provably prune ~nothing on dense low-dimension
    * embeddings at this τ. [[signBucketNearDup]] is the approximate 100TB
    * path; this is the exact one. */
  def embeddingNearDupExact(vecs: DataFrame, threshold: Double,
                            idCol: String = "vec_id", vecCol: String = "embedding",
                            numBlocks: Int = 16): DataFrame = {
    registered(vecs)
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", norm(col("v")))
      .withColumn("blk", pmod(xxhash64(col("id")), lit(numBlocks)).cast("int"))
    // a row in block p sits on the left of tiles (p, p..B-1) and on the
    // right of tiles (0..p, p): pair (a∈i, b∈j), i<j meets exactly once in
    // tile (i,j); same-block pairs meet twice in the diagonal tile and are
    // halved by the id order filter. dot/norm products are commutative
    // bit-exact, so which side a vector lands on never changes the cosine.
    val lhs = base.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na"),
      col("blk").as("ti"), explode(sequence(col("blk"), lit(numBlocks - 1))).as("tj"))
    val rhs = base.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"),
      explode(sequence(lit(0), col("blk"))).as("ti"), col("blk").as("tj"))
    lhs.join(rhs, Seq("ti", "tj"))
      .filter(col("ti") =!= col("tj") || col("id_a") < col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        cosinePre(col("va"), col("vb"), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine_sim"))
  }

  /** Random-hyperplane LSH near-dup: bucket by the sign pattern of `nBits`
    * deterministic pseudo-random projections; only same-bucket pairs are
    * verified — the equi-join candidate pattern that survives 100TB.
    *
    * `tables` independent projection tables are OR-ed (a pair is a candidate
    * if ANY table buckets it together): per-pair recall rises from p^b to
    * 1-(1-p^b)^L where p = 1-θ/π. At τ=0.35, nBits=4: one table ≈ 0.14,
    * eight ≈ 0.71 — the standard recall/cost dial for sign LSH. Candidates
    * are deduped on the pair key BEFORE the cosine verify, so each surviving
    * pair pays the dot product once regardless of how many tables found it. */
  def signBucketNearDup(vecs: DataFrame, threshold: Double, nBits: Int = 8,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        tables: Int = 1): DataFrame =
    signBucketNearDupFromBuckets(vecs,
      signBuckets(vecs, nBits, idCol, vecCol, tables), threshold, idCol, vecCol)

  /** The sign-bucket signature relation `(id, t, b)` of [[signBucketNearDup]]
    * — split out so the q56 oracle can stage it as parquet. */
  def signBuckets(vecs: DataFrame, nBits: Int = 8,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  tables: Int = 1): DataFrame = {
    registered(vecs)
    // deterministic "random" plane component: hash(bit, dim) mapped to
    // [-1, 1) — evaluated ONCE on the driver through the very same xxhash64
    // expression the per-row formulation used, so the plane matrix (and
    // therefore every bucket) is bit-identical to hashing inline. Projecting
    // with [[dot]] against the literal plane replaces ~nBits·tables·d hash
    // evaluations and two intermediate arrays PER ROW with plain
    // multiply-adds — the difference between an expression-tree signature
    // and a matrix product.
    val dims = vecs.limit(1)
      .select(size(col(vecCol))).collect().headOption.map(_.getInt(0)).getOrElse(0)
    def planeComponentValue(bit: Int, dim: Int): Double = {
      import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
      // new XxHash64(children) pins the same default seed (42) the
      // `xxhash64` SQL function uses
      val h = new XxHash64(Seq(Literal(bit), Literal(dim))).eval().asInstanceOf[Long]
      (((h % 2000000L) + 2000000L) % 2000000L).toDouble / 1000000.0 - 1.0
    }
    // table t uses planes t*nBits .. t*nBits+nBits-1, so t=0 with tables=1
    // reproduces the single-table signature exactly
    val tableBuckets = (0 until tables).map { t =>
      val sigBits = (0 until nBits).map { j =>
        val plane = (0 until dims).map(d => planeComponentValue(t * nBits + j, d))
        val proj = dot(col("v"), typedLit(plane))
        when(proj > 0, lit(1L << j)).otherwise(lit(0L))
      }
      struct(lit(t).as("t"), sigBits.reduce(_ bitwiseOR _).as("b"))
    }
    vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), explode(array(tableBuckets: _*)).as("bucket"))
      .select(col("id"), col("bucket").getField("t").as("t"),
        col("bucket").getField("b").as("b"))
  }

  /** The candidate-join + cosine-verify stage of [[signBucketNearDup]] over
    * an ALREADY COMPUTED bucket relation `(id, t, b)` — split out so the q56
    * oracle can stage Spark's sign buckets as parquet and have DuckDB replay
    * the entire downstream pipeline (bucket self-join, pair dedup, cosine
    * threshold) hash-exact; only the hyperplane projection itself stays
    * un-oracled (it keeps the composable-dot dual-formulation gate).
    *
    * Candidate generation and dedup run over (id, t, b) ONLY — the vectors
    * re-attach after the pair-key dedup, so the bucket self-join and the
    * dropDuplicates shuffle move 16-byte id pairs, not 2·d-element arrays
    * per candidate. At 100 TB candidates ≫ corpus, so this is the
    * difference between shuffling terabytes of vectors and gigabytes of
    * ids; the two re-attach joins are plain equi-joins on id (broadcast
    * when the corpus side is small). */
  def signBucketNearDupFromBuckets(vecs: DataFrame, sigs: DataFrame,
                                   threshold: Double,
                                   idCol: String = "vec_id",
                                   vecCol: String = "embedding"): DataFrame = {
    registered(vecs)
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", norm(col("v")))
    val s = sigs.select(col("id"), col("t"), col("b"))
    val pairs = s.toDF("id_a", "t", "b")
      .join(s.toDF("id_b", "t", "b"), Seq("t", "b"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .join(base.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        cosinePre(col("va"), col("vb"), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine_sim"))
  }
}
