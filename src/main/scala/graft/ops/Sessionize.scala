package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization — the reference's session builder
  * (reference: models/spark/onfy/onfy_sessions.sql:120-145: LAG + 30-min gap
  * marker, running COUNT over the marker, then GROUP BY session).
  *
  * Single shuffle on the key; the two windows share one sort, so Catalyst
  * plans one Window operator pair over one exchange — scale holds as long as
  * a key's history fits an external sort.
  */
object Sessionize {

  /** Adds `session_num` (1-based per key): a new session starts when the gap
    * since the previous row strictly exceeds `gapSec`.
    *
    * @param orderCol    total-order column within a key (e.g. event ts/nanos)
    * @param epochSecCol numeric column in seconds used for gap arithmetic
    */
  def apply(df: DataFrame, keyCol: String, orderCol: String,
            epochSecCol: String, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(orderCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev", lag(col(epochSecCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col(epochSecCol) - col("__prev") > gapSec, 1).otherwise(0))
      .withColumn("session_num", sum(col("__new")).over(cum))
      .drop("__prev", "__new")
  }
}
