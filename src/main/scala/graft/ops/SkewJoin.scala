package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the engine-level form of the
  * reference's hand-written skew spreads (reference: `DISTRIBUTE BY month,
  * ABS(HASH(id)) % 10`, models/spark/gold/gold_orders.sql:696; SURVEY.md §4).
  *
  * AQE's skew-join handles sort-merge skew at runtime; explicit salting
  * remains the tool when one hot key floods a single task in hash
  * aggregations or when the small side fits memory: the big side spreads each
  * key over `n` salts via a deterministic per-row expression, the small side
  * replicates `n`× — same results, n-way parallel hot keys.
  */
object SkewJoin {

  /** @param spreadExpr deterministic per-row expression on the BIG side used
    *   to pick the salt (e.g. `xxhash64(col("some_unique_id"))`) — must vary
    *   within a join key to achieve spreading. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 spreadExpr: Column, n: Int, joinType: String = "inner"): DataFrame = {
    require(n > 0)
    // right/full outer would emit each unmatched small-side row once PER SALT
    // (the small side is replicated n×) — silently wrong results, so refuse
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left join types only, got '$joinType': the " +
        "replicated small side would duplicate unmatched rows under right/full outer")
    val bigS = big.withColumn("__salt", pmod(spreadExpr, lit(n.toLong)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }
}
