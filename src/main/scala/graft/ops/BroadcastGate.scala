package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Count-gated broadcast for SF-SCALING dimension tables.
  *
  * nation/region are constant-size and broadcast unconditionally, but
  * `customer` (and anything derived from it) grows LINEARLY with the
  * scale factor — at the 100 TB target it is billions of rows, and an
  * unconditional hint is a driver OOM waiting for the scale-up (the
  * [[graft.cdc.ServingBridge.BroadcastEpisodeLimit]] /
  * [[graft.ext.Graph.BroadcastEdgeLimit]] failure class). Under the gate
  * the hint applies; over it the join falls back to the planner's
  * shuffled equi-join strategy.
  *
  * The count recomputes the frame once — gated sides are raw dimension
  * scans (projection + optional arithmetic), so the extra pass is a
  * metadata-cheap columnar count, not a reason to checkpoint.
  */
object BroadcastGate {

  /** Same rationale as the other gates: comfortably under the 8 GB
    * broadcast ceiling at ~100 bytes/row. */
  val DefaultRowLimit = 4000000L

  def broadcastIfSmall(df: DataFrame, limit: Long = DefaultRowLimit): DataFrame =
    if (df.count() <= limit) broadcast(df) else df
}
