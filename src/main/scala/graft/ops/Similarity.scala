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
    val cents = broadcast(centroids.select(col(idCol).as("cent_id"), col(vecCol).as("cent_v"))
      .withColumn("cent_n", norm(col("cent_v"))))

    def assign(df: DataFrame, id: String, v: String, n: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(col(id)).orderBy(col("cent_cos").desc, col("cent_id"))
      df.crossJoin(cents)
        .select(col(id), col(v), col(n),
          cosinePre(col(v), col("cent_v"), col(n), col("cent_n")).as("cent_cos"), col("cent_id"))
        .withColumn("cr", row_number().over(w))
        .filter(col("cr") <= keep)
        .drop("cent_cos", "cr")
    }

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

  /** Deterministic Lloyd (k-means) refinement of IVF centroids — pure
    * DataFrame ops, no driver-side math: assign to nearest centroid, then
    * element-wise mean per cell via posexplode + groupBy(cell, dim). Empty
    * cells drop out (k shrinks). Plugs straight into [[ivfTopK]].
    *
    * Runs TO CONVERGENCE: stops as soon as no centroid coordinate moved by
    * more than `tol` between rounds (`iters` is the safety cap, like
    * Dedup.dupGroups' maxIter). The per-round movement check is one
    * broadcast-join + max aggregate — a single driver scalar of control
    * flow, no data collected. `localCheckpoint` truncates the growing
    * iterative lineage (the same trap dupGroups guards against); the points
    * relation is cached once since every round rescans it. */
  def kmeansCentroids(vecs: DataFrame, init: DataFrame, iters: Int = 10,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      tol: Double = 1e-4): DataFrame = {
    registered(vecs)
    val points = vecs.select(col(idCol).as("pid"), col(vecCol).as("pv"))
      .withColumn("pn", norm(col("pv"))).cache()
    var cents = init.select(col(idCol).as("cent_id"), col(vecCol).as("cent_v"))
      .localCheckpoint()
    var round = 0
    var moved = Double.MaxValue
    while (round < iters && moved > tol) {
      round += 1
      val c = broadcast(cents.withColumn("cent_n", norm(col("cent_v"))))
      val w = Window.partitionBy(col("pid")).orderBy(col("cc").desc, col("cent_id"))
      val assigned = points.crossJoin(c)
        .select(col("pid"), col("pv"),
          cosinePre(col("pv"), col("cent_v"), col("pn"), col("cent_n")).as("cc"),
          col("cent_id"))
        .withColumn("r", row_number().over(w)).filter(col("r") === 1)
      val next = assigned
        .select(col("cent_id"), posexplode(col("pv")).as(Seq("dim", "x")))
        .groupBy(col("cent_id"), col("dim")).agg(avg(col("x").cast("double")).as("m"))
        .groupBy(col("cent_id"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cent_id"),
          transform(col("dm"), s => s.getField("m")).as("cent_v"))
        .localCheckpoint()
      // max coordinate movement this round (vanished cells count as converged
      // for the cells that remain — k may shrink, which is Lloyd's behavior)
      val mv = next.join(cents.select(col("cent_id"), col("cent_v").as("prev_v")), Seq("cent_id"))
        .select(aggregate(
          zip_with(col("cent_v"), col("prev_v"), (a, b) => abs(a - b.cast("double"))),
          lit(0.0), (acc, x) => greatest(acc, x)).as("mv"))
        .agg(max(col("mv"))).head()
      moved = if (mv.isNullAt(0)) 0.0 else mv.getDouble(0)
      cents = next
    }
    points.unpersist()
    cents.withColumnRenamed("cent_id", idCol).withColumnRenamed("cent_v", vecCol)
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
                        tables: Int = 1): DataFrame = {
    registered(vecs)
    // deterministic "random" plane component: hash(bit, dim) mapped to [-1, 1)
    def planeComponent(bit: Int, dim: Column): Column =
      (pmod(xxhash64(lit(bit), dim), lit(2000000L)).cast("double") / 1000000.0) - 1.0
    // table t uses planes t*nBits .. t*nBits+nBits-1, so t=0 with tables=1
    // reproduces the single-table signature exactly
    val tableBuckets = (0 until tables).map { t =>
      val sigBits = (0 until nBits).map { j =>
        val proj = aggregate(
          zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
            (x, i) => x.cast("double") * planeComponent(t * nBits + j, i)),
          lit(0.0), (acc, v) => acc + v)
        when(proj > 0, lit(1L << j)).otherwise(lit(0L))
      }
      struct(lit(t).as("t"), sigBits.reduce(_ bitwiseOR _).as("b"))
    }
    val bucketed = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", norm(col("v")))
      .withColumn("bucket", explode(array(tableBuckets: _*)))
    bucketed.toDF("id_a", "va", "na", "bucket")
      .join(bucketed.toDF("id_b", "vb", "nb", "bucket"), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        cosinePre(col("va"), col("vb"), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine_sim"))
  }
}
