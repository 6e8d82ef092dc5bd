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
    * `aggregate(zip_with(...))` composition, ~10× less per-pair overhead. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.vecDot(a, b)

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
    * cells drop out (k shrinks). Plugs straight into [[ivfTopK]]. */
  def kmeansCentroids(vecs: DataFrame, init: DataFrame, iters: Int = 3,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registered(vecs)
    val points = vecs.select(col(idCol).as("pid"), col(vecCol).as("pv"))
      .withColumn("pn", norm(col("pv")))
    var cents = init.select(col(idCol).as("cent_id"), col(vecCol).as("cent_v"))
    for (_ <- 0 until iters) {
      val c = broadcast(cents.withColumn("cent_n", norm(col("cent_v"))))
      val w = Window.partitionBy(col("pid")).orderBy(col("cc").desc, col("cent_id"))
      val assigned = points.crossJoin(c)
        .select(col("pid"), col("pv"),
          cosinePre(col("pv"), col("cent_v"), col("pn"), col("cent_n")).as("cc"),
          col("cent_id"))
        .withColumn("r", row_number().over(w)).filter(col("r") === 1)
      cents = assigned
        .select(col("cent_id"), posexplode(col("pv")).as(Seq("dim", "x")))
        .groupBy(col("cent_id"), col("dim")).agg(avg(col("x").cast("double")).as("m"))
        .groupBy(col("cent_id"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cent_id"),
          transform(col("dm"), s => s.getField("m")).as("cent_v"))
    }
    cents.withColumnRenamed("cent_id", idCol).withColumnRenamed("cent_v", vecCol)
  }

  /** Exact embedding near-duplicate pairs above a cosine threshold. At the
    * test scale this is a block self-join; the LSH path for 100TB is
    * [[signBucketNearDup]]. */
  def embeddingNearDupExact(vecs: DataFrame, threshold: Double,
                            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registered(vecs)
    val a = vecs.select(col(idCol).as("id_a"), col(vecCol).as("va"))
      .withColumn("na", norm(col("va")))
    val b = vecs.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
      .withColumn("nb", norm(col("vb")))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosinePre(col("va"), col("vb"), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine_sim"))
  }

  /** Random-hyperplane LSH near-dup: bucket by the sign pattern of `nBits`
    * deterministic pseudo-random projections; only same-bucket pairs are
    * verified — the equi-join candidate pattern that survives 100TB. */
  def signBucketNearDup(vecs: DataFrame, threshold: Double, nBits: Int = 8,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registered(vecs)
    // deterministic "random" plane component: hash(bit, dim) mapped to [-1, 1)
    def planeComponent(bit: Int, dim: Column): Column =
      (pmod(xxhash64(lit(bit), dim), lit(2000000L)).cast("double") / 1000000.0) - 1.0
    val sigBits = (0 until nBits).map { j =>
      val proj = aggregate(
        zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
          (x, i) => x.cast("double") * planeComponent(j, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }
    val bucketed = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", norm(col("v")))
      .withColumn("bucket", sigBits.reduce(_ bitwiseOR _))
    bucketed.toDF("id_a", "va", "na", "bucket")
      .join(bucketed.toDF("id_b", "vb", "nb", "bucket"), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosinePre(col("va"), col("vb"), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine_sim"))
  }
}
