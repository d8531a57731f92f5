package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time feature assembly — the feature-store shape: for every
  * purchase event, a training-feature row computed strictly from
  * information available AT that event's time (no leakage from the
  * future):
  *
  *   - `trailing_views_1h` — views in the trailing hour (RANGE frame)
  *   - `sess_seq`          — which session of the user's history this is
  *                           (gaps-and-islands running sum)
  *   - `prev_purchase_gap_s` — seconds since the user's previous purchase
  *                           (NULL on the first)
  *   - `nation`            — broadcast dimension enrichment
  *
  * Scale shape: every event-derived feature rides ONE user-partitioned
  * shuffle — three window passes share the same partitioning (the range
  * frame and the ordered frames differ only in sort), the purchase filter
  * and the purchase-lag window reuse it, and the dimension join is a
  * broadcast. No self-joins, no per-feature scans: the feature matrix
  * costs one shuffle of the event table regardless of how many features
  * stack on.
  */
object Features {

  /** Session gap shared with the oracle (same 30 min the sessionize
    * family uses). */
  val SessionGapS = 1800L

  /** @param dim      customer dimension (broadcast side)
    * @param dimCount row count of `dim` (the user→custkey fold modulus;
    *                 passed in so callers control the one driver-side
    *                 action)
    */
  def purchaseFeatures(events: DataFrame, dim: DataFrame, dimCount: Long): DataFrame = {
    val wRange = Window.partitionBy("user_id").orderBy("t_s")
      .rangeBetween(-3600, Window.currentRow)
    val wOrd = Window.partitionBy("user_id").orderBy("t_s", "event_id")
    val prevT = lag(col("t_s"), 1).over(wOrd)
    val withF = events
      .withColumn("trailing_views_1h",
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).over(wRange))
      .withColumn("__new_sess",
        when(prevT.isNull || col("t_s") - prevT > SessionGapS, 1L).otherwise(0L))
      .withColumn("sess_seq", sum(col("__new_sess")).over(wOrd))
    val purch = withF.where(col("event_type") === "purchase")
      .withColumn("prev_purchase_gap_s", col("t_s") - lag(col("t_s"), 1).over(wOrd))
    purch.join(
      BroadcastGate.broadcastIfSmall(dim.select(
        (col("c_custkey") - 1).cast("long").as("__ck"),
        col("c_nationkey").cast("long").as("nation"))),
      col("user_id") % dimCount === col("__ck"))
      .select(col("event_id"), col("user_id"), col("nation"),
        col("trailing_views_1h"), col("sess_seq"), col("prev_purchase_gap_s"))
  }
}
