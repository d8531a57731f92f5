package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-journey mining over event streams: the aggregate shapes product
  * analytics asks of a clickstream once sessions exist — which paths are
  * common, and what follows what.
  *
  * Both operators are one-shuffle window/aggregate plans partitioned by
  * user (or session): no self-joins, no sequence blow-up, scale with event
  * volume like any partitioned aggregation. Outputs are strings and
  * integers only (the repo's oracle-hash rule).
  */
object Journeys {

  /** Top-k most frequent per-session event-type PATHS ("view>click>
    * purchase"). Events get their session ordinal from
    * [[Sessions.withSessionSeq]]; each session folds to its type sequence
    * in (time, id) order; identical paths count globally. The final top-k
    * is a TakeOrdered over the path-count aggregate (per-partition heap +
    * driver merge of k rows, never a global sort), totalized by
    * (count DESC, path ASC) so the cutoff is deterministic.
    *
    * @param maxLen sessions longer than this are truncated to their first
    *               `maxLen` events with a trailing ">…" marker. Events are
    *               ranked within (user, session) and filtered to rank ≤
    *               `maxLen + 1` BEFORE the collect, so the aggregation
    *               buffer and its shuffle rows are bounded at `maxLen + 1`
    *               per session no matter how long the longest (bot)
    *               session runs — rank `maxLen + 1` only needs to EXIST
    *               for the ">…" marker, never its payload
    */
  def sessionPaths(
      events: DataFrame,
      userCol: String,
      timeCol: String,
      idCol: String,
      typeCol: String,
      gapS: Long,
      k: Int,
      maxLen: Int = 12): DataFrame = {
    val seq = Sessions.withSessionSeq(events, userCol, timeCol, idCol, gapS)
    // row_number on the SAME (time, id) totalized order the collect sorts
    // by; partitioned by (user, session_seq), which the session window's
    // existing hash-by-user distribution already satisfies — a local sort,
    // not a new exchange (PlanShapeSpec locks the single shuffle).
    val wRank = Window.partitionBy(col(userCol), col("session_seq"))
      .orderBy(col(timeCol).asc, col(idCol).asc)
    val ordered = seq
      .withColumn("__rk", row_number().over(wRank))
      .where(col("__rk") <= maxLen + 1)
      .groupBy(col(userCol), col("session_seq"))
      .agg(sort_array(collect_list(struct(
        col(timeCol).as("t"), col(idCol).as("i"), col(typeCol).as("y")))).as("evs"))
      .select(
        when(size(col("evs")) > maxLen,
          concat(array_join(transform(slice(col("evs"), 1, maxLen), e => e.getField("y")), ">"),
            lit(">…")))
          .otherwise(array_join(transform(col("evs"), e => e.getField("y")), ">"))
          .as("path"))
    ordered
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)
  }

  /** First-order TRANSITION matrix of event types per user stream: counts
    * of (from_type, to_type) over consecutive events in (time, id) order,
    * with the per-from share in integer basis points (the Markov-chain
    * row, rendered portably). One lag window + one aggregate. */
  def eventTransitions(
      events: DataFrame,
      userCol: String,
      timeCol: String,
      idCol: String,
      typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(timeCol).asc, col(idCol).asc)
    val pairs = events
      .withColumn("__from", lag(col(typeCol), 1).over(w))
      .where(col("__from").isNotNull)
      .groupBy(col("__from").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("share_bp",
        graft.ext.TextOps.intDiv(col("n") * lit(10000L), sum(col("n")).over(totals)))
      .orderBy("from_type", "to_type")
  }
}
