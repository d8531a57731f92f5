package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): a user's events within `gapS`
  * seconds of the previous event share a session; a longer gap opens a new
  * one. The batch companion of [[graft.streaming.EventStream.sessionize]]
  * (which holds one bounded state record per user for unbounded streams) —
  * same session semantics, resolved here with partitioned windows:
  * lag → new-session flag → running sum = session ordinal → one hash
  * aggregation. Two window passes plus one aggregation, all partitioned by
  * user: one shuffle, no global funnel, scales with user cardinality.
  */
object Sessions {

  /** @param events  one row per event
    * @param userCol partition key column
    * @param timeCol event time as epoch seconds (LongType)
    * @param idCol   unique per-event tiebreaker (total order within a user)
    * @param gapS    max intra-session gap in seconds
    * @return (user, session_seq 1..N, n_events, session_start_s,
    *         session_end_s, duration_s)
    */
  def sessionize(
      events: DataFrame,
      userCol: String,
      timeCol: String,
      idCol: String,
      gapS: Long): DataFrame =
    withSessionSeq(events, userCol, timeCol, idCol, gapS)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(timeCol)).as("session_start_s"),
        max(col(timeCol)).as("session_end_s"))
      .withColumn("duration_s", col("session_end_s") - col("session_start_s"))

  /** The per-EVENT form: every input row plus its `session_seq` ordinal —
    * the building block [[sessionize]] aggregates, exposed for consumers
    * that need event-grain session membership (path mining, per-session
    * joins). Same two window passes, one shuffle. */
  def withSessionSeq(
      events: DataFrame,
      userCol: String,
      timeCol: String,
      idCol: String,
      gapS: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(timeCol).asc, col(idCol).asc)
    // First event of a user: lag is NULL -> condition NULL -> otherwise(1).
    events
      .withColumn("__new",
        when(col(timeCol) - lag(col(timeCol), 1).over(w) <= gapS, lit(0L)).otherwise(lit(1L)))
      .withColumn("session_seq",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }
}
