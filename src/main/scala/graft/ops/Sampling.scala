package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators for training-data
  * pipelines. A train/val/test split over a 100 TB corpus must be:
  *  - deterministic (re-runs and incremental re-derivations assign every
  *    document to the same split — `rand()` is not reproducible across
  *    retries or cluster layouts);
  *  - driver-free and shuffle-free (a pure narrow projection per row);
  *  - portable (downstream systems in other engines must be able to
  *    recompute membership — which is why the bucket hash is md5 over the
  *    id rendered as a string, identical across Spark / DuckDB / Python,
  *    rather than an engine-specific hash like xxhash64).
  *
  * The first two hex digits of md5(id) give a uniform bucket in [0, 256);
  * split boundaries are cumulative-percent thresholds mapped onto that
  * range, compared as strings (hex compares correctly digit-wise).
  */
object Sampling {

  /** Assign each row a named split by hashing `idCol`.
    *
    * @param splits ordered (name, percent) weights; percents must sum to
    *   ≤ 100, any remainder falls into the last split. Boundaries are
    *   floor(256·cum/100) so every engine computing the same md5 prefix
    *   agrees on membership bit-for-bit.
    */
  def splitColumn(idCol: Column, splits: Seq[(String, Int)]): Column = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.map(_._2).sum <= 100, "split percents must sum to <= 100")
    require(splits.forall(_._2 > 0), "every split needs a positive percent")
    val prefix = substring(md5(idCol.cast("string")), 1, 2)
    val bounds = splits.init.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
      .map(cum => f"${(256 * cum) / 100}%02x")
    val cases = splits.init.zip(bounds)
    cases.foldRight(lit(splits.last._1): Column) { case (((name, _), bound), rest) =>
      when(prefix < lit(bound), lit(name)).otherwise(rest)
    }
  }

  /** `df` with an added split-assignment column. Stratification comes free:
    * membership depends only on the id, so any per-stratum slice of the
    * output preserves the split ratios in expectation. */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Int)],
                outCol: String = "split"): DataFrame =
    df.withColumn(outCol, splitColumn(col(idCol), splits))

  /** Deterministic p-percent sample: the keep/drop special case of
    * [[splitColumn]]. Unlike `df.sample`, membership is a pure function of
    * the id — stable under re-runs, retries, AQE re-planning, and usable as
    * a join-free semi-filter on any table sharing the id. */
  def deterministicSample(df: DataFrame, idCol: String, percent: Int): DataFrame =
    if (percent >= 100) df
    else df.filter(
      splitColumn(col(idCol), Seq("keep" -> percent, "drop" -> (100 - percent))) === "keep")
}
