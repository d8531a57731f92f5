package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: pair each left row with the right rows of the
  * same key whose time falls in [leftTime, leftTime + maxGapS] — the
  * conversion/attribution window join (view → purchase within the hour).
  *
  * With an equi key present (the normal case) this plans as a standard
  * partitioned equi-join with the range condition as a join filter — no
  * cross product, scales with key cardinality. Keyless range joins need a
  * time-bucket blow-up (join on coarse bucket, filter exact) — out of
  * scope here because every fixture use has a key.
  *
  * The same plan runs as a Structured Streaming stream-stream join when
  * both inputs are streaming with watermarks (the range condition doubles
  * as the state-expiry bound) — EventStreamSpec pins that parity.
  */
object IntervalJoin {

  /** @param on       equi join keys (both sides)
    * @param leftTime/rightTime epoch-seconds (LongType) or event-time
    *                 (TimestampType) columns — timestamps are what the
    *                 streaming engine needs to derive state expiry from
    *                 the range condition. Must differ in name; non-key
    *                 columns of the two sides must be disjoint.
    * @param maxGapS  inclusive upper bound on rightTime - leftTime, seconds
    */
  def withinAfter(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      maxGapS: Long): DataFrame = {
    require(on.nonEmpty, "interval join needs at least one equi key (see scaladoc)")
    require(leftTime != rightTime, "time columns must be distinctly named")
    val keyEq = on.map(k => left(k) === right(k)).reduce(_ && _)
    val upper = left.schema(leftTime).dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        left(leftTime) + expr(s"INTERVAL $maxGapS SECONDS")
      case _ => left(leftTime) + maxGapS
    }
    val range = right(rightTime) >= left(leftTime) && right(rightTime) <= upper
    // drop the right side's duplicate key columns
    on.foldLeft(left.join(right, keyEq && range))((df, k) => df.drop(right(k)))
  }
}
