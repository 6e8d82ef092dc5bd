package graft.runtime

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD2 snapshot materialization — dbt snapshot semantics rebuilt Spark-first
  * (reference: 54 snapshots; snapshots/spark/b2b_mart/scd2_orders_v2_snapshot.sql:1-17
  * `strategy='timestamp', unique_key='_id', updated_at=..., invalidate_hard_deletes=True`;
  * check strategy incl. check_cols='all':
  * snapshots/spark/b2b_mart/scd2_offer_products_snapshot.sql:12).
  *
  * History columns: `dbt_valid_from` / `dbt_valid_to` (open = null).
  * The update is ONE full-outer join of the staged snapshot against the open
  * rows on the unique key (closed history passes through untouched), then an
  * atomic table rewrite — no Delta MERGE needed. At scale both sides shuffle
  * once on the key; history never re-shuffles.
  *
  * Requirement (same as dbt): `staged` must be unique per `uniqueKey`.
  */
object Scd2 {

  def snapshot(ctx: Ctx, name: String, staged: DataFrame, uniqueKey: String,
               strategy: Scd2Strategy, invalidateHardDeletes: Boolean,
               runTs: Timestamp): Unit = {
    val wh = ctx.warehouse
    val payloadCols = staged.columns.toSeq

    def validFrom(prefix: String) = strategy match {
      case Scd2Strategy.Timestamp(updatedAt) => col(s"$prefix.$updatedAt").cast("timestamp")
      case Scd2Strategy.Check(_) => lit(runTs)
    }

    if (!wh.tableExists(name)) {
      wh.createTable(name, staged
        .withColumn("dbt_valid_from", strategy match {
          case Scd2Strategy.Timestamp(u) => col(u).cast("timestamp")
          case Scd2Strategy.Check(_) => lit(runTs)
        })
        .withColumn("dbt_valid_to", lit(null).cast("timestamp")))
      return
    }

    val existing = wh.read(name)
    val closed = existing.filter(col("dbt_valid_to").isNotNull)
    val open = existing.filter(col("dbt_valid_to").isNull).alias("o")
    val fresh = staged.alias("n")

    val changed = strategy match {
      case Scd2Strategy.Timestamp(updatedAt) =>
        col(s"n.$updatedAt").cast("timestamp") > col(s"o.$updatedAt").cast("timestamp")
      case Scd2Strategy.Check(checkCols) =>
        val cols = if (checkCols.nonEmpty) checkCols
                   else payloadCols.filterNot(_ == uniqueKey)
        cols.map(c => !(col(s"o.$c") <=> col(s"n.$c"))).reduce(_ || _)
    }

    val j = open.join(fresh, col(s"o.$uniqueKey") === col(s"n.$uniqueKey"), "full_outer")
    val oPresent = col(s"o.$uniqueKey").isNotNull
    val nPresent = col(s"n.$uniqueKey").isNotNull

    def side(prefix: String, from: org.apache.spark.sql.Column,
             to: org.apache.spark.sql.Column) =
      payloadCols.map(c => col(s"$prefix.$c").as(c)) :+ from.as("dbt_valid_from") :+
        to.as("dbt_valid_to")

    // unchanged / hard-delete handling of the previously-open row
    val keepOrClose = j.filter(oPresent).select(side("o",
      col("o.dbt_valid_from"),
      when(nPresent && changed, validFrom("n"))
        .when(!nPresent && invalidateHardDeletes, lit(runTs))
        .otherwise(lit(null).cast("timestamp"))): _*)

    // brand-new keys and new versions of changed keys
    val opened = j.filter(nPresent && (!oPresent || changed))
      .select(side("n", validFrom("n"), lit(null).cast("timestamp")): _*)

    val result = closed.select(keepOrClose.columns.map(col): _*)
      .unionByName(keepOrClose)
      .unionByName(opened)

    // replaceTable stages to a tmp dir first, so reading the old files while
    // writing the new version is safe; the swap happens after the write.
    wh.replaceTable(name, result)
  }
}
