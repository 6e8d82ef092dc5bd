package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the reference's SCD2 validity-range join pattern
  * (reference: macros/gold_active_users_and_devices_with_ephemeral.sql:338-341,
  * models/spark/mart/product_nf_segment.sql:141-142) — built scale-first.
  *
  * A naive non-equi range join (`l.t >= r.from AND l.t <= r.to`) is planned by
  * Catalyst as a broadcast-nested-loop or a sort-merge with residual — both
  * blow up on big×big inputs. Instead we union both sides tagged, sort once
  * per key, and carry the latest right payload forward with
  * `last(_, ignoreNulls)` over a running frame: ONE shuffle on the key, fully
  * whole-stage-codegen, no row-pair explosion. At 100TB this survives as long
  * as a single key's timeline fits one partition's external sort (Spark
  * spills), which is the same requirement any per-key window has.
  */
object AsOfJoin {

  /** For each left row, attach the latest right row with
    * `right(rightTime) <= left(leftTime)`, equi-matched on `keyCols`.
    *
    * Time columns must be numeric (epoch seconds/millis/nanos — cast
    * timestamps up front). Right must be unique per (keyCols, rightTime);
    * pre-aggregate if it is not, or results are tie-ambiguous.
    * Right's non-key columns are emitted prefixed (default `r_`), including
    * `<prefix><rightTime>` = the matched right timestamp (null if no match).
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String, prefix: String = "r_"): DataFrame = {
    val payload = right.columns.filterNot(c => keyCols.contains(c) || c == rightTime).toSeq
    val pStruct = struct((rightTime +: payload).map(col): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTime).cast("long").as("__t"), lit(0).as("__side"), pStruct.as("__p")): _*)
    val leftCols = left.columns.toSeq
    val l = left
      .select(leftCols.map(col) ++ Seq(col(leftTime).cast("long").as("__t"), lit(1).as("__side")): _*)
      .withColumn("__p", lit(null).cast(r.schema("__p").dataType))
    // right rows sort before left rows at equal time => `<=` semantics
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        (rightTime +: payload).map(c => col("__m").getField(c).as(prefix + c)): _*)
  }
}
