package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KEYLESS point-in-range join: pair each point with every range whose
  * `[lo, hi]` (inclusive, integral) contains it — no equi key on either
  * side (the IP→geo / timestamp→session-concurrency lookup shape, which
  * [[IntervalJoin]] explicitly scopes out because it requires a key).
  *
  * Spark has no range-join operator; the naive formulation is a cross
  * join with a filter — quadratic, and Catalyst plans it as
  * BroadcastNestedLoopJoin only while one side fits in memory. The
  * scalable formulation used here is coarse-BUCKET expansion:
  *
  *   - each range explodes into the buckets it covers:
  *     `sequence(lo div w, hi div w)` — for ranges of typical width `s`
  *     that is `1 + s/w` rows, a bounded, data-independent blow-up;
  *   - each point maps to exactly ONE bucket (`p div w`);
  *   - an ordinary hash equi-join on the bucket id co-locates every
  *     candidate, and the exact containment predicate `lo <= p <= hi`
  *     filters false neighbors inside the join.
  *
  * Shuffle volume is `points + Σ(1 + width/w)` rows — never
  * `points × ranges`. The bucket width trades expansion against
  * selectivity: `w` ≈ the typical range width keeps both the explode
  * factor (~2×) and the per-bucket candidate count (~density) small.
  * At 100 TB both sides remain fully distributed: no broadcast, no
  * nested loop, and AQE's skew split applies to the bucket key like any
  * other join key (a pathological bucket holding many long ranges can
  * additionally be salted by the caller splitting ranges at bucket
  * boundaries first).
  *
  * Output: all point columns + all range columns (names must be
  * disjoint), one row per (point, containing range) pair.
  */
object RangeJoin {

  /** @param points      side probed by value; all columns pass through
    * @param pointCol    integral point column on `points`
    * @param ranges      side holding `[lo, hi]` bounds; all columns pass
    *                    through (names must not collide with `points`)
    * @param loCol/hiCol inclusive integral bounds on `ranges` (`lo <= hi`)
    * @param bucketWidth coarse bucket width `w` (> 0) — pick ≈ the typical
    *                    range width
    *
    * Negative points/bounds stay CORRECT: truncation-toward-zero division
    * is still monotone non-decreasing, so `bucket(lo) <= bucket(p) <=
    * bucket(hi)` holds and the exact predicate filters the rest. The only
    * effect is density — buckets straddling zero cover ~2w values, so
    * near-zero keys generate up to ~2× the false candidates.
    */
  def pointInRange(
      points: DataFrame,
      pointCol: String,
      ranges: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val collisions = points.columns.toSet.intersect(ranges.columns.toSet)
    require(collisions.isEmpty,
      s"point/range column names must be disjoint, both have: ${collisions.mkString(",")}")

    def bucketOf(c: Column): Column = graft.ext.TextOps.intDiv(c, lit(bucketWidth))

    // Ranges explode into covered buckets; points map to exactly one.
    val r = ranges.withColumn("__rb",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    val p = points.withColumn("__pb", bucketOf(col(pointCol)))
    p.join(r, p("__pb") === r("__rb") &&
        col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .select(points.columns.toSeq.map(col) ++ ranges.columns.toSeq.map(col): _*)
  }

  /** Interval × interval OVERLAP join — pair every left interval with
    * every right interval it intersects (`l.lo <= r.hi && r.lo <= l.hi`,
    * inclusive integral bounds). Same coarse-bucket expansion as
    * [[pointInRange]], on BOTH sides; a pair sharing k buckets would
    * surface k times, so the match is admitted only in its CANONICAL
    * bucket — the one containing `max(l.lo, r.lo)`, the overlap's first
    * instant, which both explodes necessarily cover — making the dedup
    * exact with zero extra shuffle (no `distinct`). Shuffle volume is
    * `Σ(1 + width/w)` over both sides; never left × right.
    */
  def intervalOverlap(
      left: DataFrame,
      lLoCol: String,
      lHiCol: String,
      right: DataFrame,
      rLoCol: String,
      rHiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val collisions = left.columns.toSet.intersect(right.columns.toSet)
    require(collisions.isEmpty,
      s"left/right column names must be disjoint, both have: ${collisions.mkString(",")}")

    def bucketOf(c: Column): Column = graft.ext.TextOps.intDiv(c, lit(bucketWidth))

    val l = left.withColumn("__lb",
      explode(sequence(bucketOf(col(lLoCol)), bucketOf(col(lHiCol)))))
    val r = right.withColumn("__rb",
      explode(sequence(bucketOf(col(rLoCol)), bucketOf(col(rHiCol)))))
    l.join(r, col("__lb") === col("__rb") &&
        col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol) &&
        bucketOf(greatest(col(lLoCol), col(rLoCol))) === col("__lb"))
      .select(left.columns.toSeq.map(col) ++ right.columns.toSeq.map(col): _*)
  }
}
