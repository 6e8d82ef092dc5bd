package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.ops.{Dedup, Similarity}

/** Dual formulations for the five queries whose primary implementation rides
  * a native Catalyst expression (or trained sketch) — q33/q34/q36/q39/q56.
  * Since r15 ALL five are ALSO DuckDB-oracled (each stages its hash/training
  * artifact and the oracle replays the downstream pipeline hash-exact), so
  * these alts now specifically gate the part the oracle can't see: the
  * signature/centroid computation itself.
  *
  * Each entry recomputes the SAME query through the definitional, composable
  * built-in-functions formulation (aggregate minhash, 64-vote simhash,
  * lambda-filter langId, zip_with dot product). [[Verify]] runs both, writes
  * the alt result to `<name>__alt.parquet`, and on ANY divergence deletes the
  * primary output so the driver's check fails deterministically.
  * tools/parity.py performs the same comparison locally.
  */
object AltFormulations {

  def alt: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLsh(Tables(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.5,
        composableSig = true)),
    "q34_simhash_neardup" -> ((s, dir) =>
      Dedup.simhashNearDup(Tables(s, dir, "documents"), "doc_id", "text",
        maxHamming = 6, composableSig = true)),
    "q36_lang_profile" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      d.select(TextFunctions.langId(col("text")).as("lang_pred"),
          col("lang").as("lang_label"),
          TextFunctions.subwordCount(col("text")).as("n_subwords"))
        .groupBy(col("lang_pred"), col("lang_label"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_subwords")).as("total_subwords"))
    }),
    "q39_ann_ivf" -> ((s, dir) => Similarity.withComposableDot {
      val e = Tables(s, dir, "embeddings")
      val cents = Similarity.kmeansOnSample(e,
        e.filter(col("vec_id") % 31 === 0).limit(16), sampleSize = 1024, iters = 25)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), cents, k = 5, nProbe = 2)
    }),
    "q56_ann_lsh_neardup" -> ((s, dir) => Similarity.withComposableDot {
      Similarity.signBucketNearDup(Tables(s, dir, "embeddings"), 0.35, nBits = 4, tables = 8)
    }))
}
