package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: attach to each left row the payload of the most
  * recent right row with the same partition key and `rightTime <= leftTime`
  * (the attribution / point-in-time-lookup join every event pipeline
  * needs; ≙ DuckDB/kdb ASOF JOIN, pandas merge_asof).
  *
  * Spark-first formulation: neither a per-row subquery (the naive O(n·m)
  * range join) nor a driver-side loop — the two sides are UNIONED, hash-
  * partitioned once on the key, and resolved with a partitioned running
  * `last(payload, ignoreNulls)` window. One shuffle, no global funnel,
  * partition-local sort: the plan scales with the key cardinality exactly
  * like any windowed aggregation.
  *
  * Tie semantics: a right row AT the left row's time matches (>=, like
  * DuckDB's default). Right rows tied on (key, time) resolve by
  * `tieBreak` (ascending, later wins) so the result is total-order
  * deterministic.
  */
object AsOfJoin {

  /** @param left      probe side; all its columns pass through
    * @param right     build side: `on` ++ `rightTime` ++ `payload` columns
    * @param on        equi partition keys (present on both sides)
    * @param leftTime  left event-time column (numeric or timestamp)
    * @param rightTime right event-time column (same type)
    * @param payload   right columns carried onto left rows (names must not
    *                  collide with left's)
    * @param tieBreak  right column ordering rights tied on (key, time) —
    *                  the greatest wins
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tieBreak: String): DataFrame = {
    val unioned = taggedUnion(left, right, on, leftTime, rightTime, payload)
    resolve(unioned, on, left.columns.toSeq, payload, tieBreak)
  }

  /** NEAREST as-of join: attach to each left row the payload of the right
    * row with the same key that is CLOSEST in time — backward or forward,
    * whichever is nearer (pandas `merge_asof(direction='nearest')`). A
    * same-instant mark is at distance 0; equidistant backward/forward marks
    * resolve to the BACKWARD one (deterministic, matching pandas).
    *
    * Same single-shuffle union+window plan as [[backward]], with a second
    * mirror-image window frame (`first` non-null over CURRENT ROW →
    * UNBOUNDED FOLLOWING) resolving the forward candidate — one sort
    * serves both frames, so the incremental cost over backward is one
    * window function, not a second shuffle.
    *
    * The forward payload struct carries the mark time internally so the
    * distance comparison is atomic with the chosen payload (never stitches
    * the backward mark's time to the forward mark's values). */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tieBreak: String): DataFrame = {
    val unioned = taggedUnion(left, right, on, leftTime, rightTime, payload)
    resolveNearest(unioned, on, left.columns.toSeq, payload, tieBreak)
  }

  /** Self nearest: marks are the subset of `df` satisfying `markCond` —
    * both roles emitted from ONE scan, exactly like [[selfBackward]], then
    * resolved with [[nearest]]'s dual-frame window. */
  def selfNearest(
      df: DataFrame,
      on: Seq[String],
      timeCol: String,
      markCond: org.apache.spark.sql.Column,
      payload: Seq[(String, String)],
      tieBreak: String): DataFrame = {
    val unioned = selfTaggedUnion(df, on, timeCol, markCond, payload)
    resolveNearest(unioned, on, df.columns.toSeq, payload.map(_._2), tieBreak)
  }

  private def resolveNearest(
      unioned: DataFrame,
      on: Seq[String],
      leftCols: Seq[String],
      payload: Seq[String],
      tieBreak: String): DataFrame = {
    // Marks sort BEFORE probes at equal time (tag 0 < 1): the backward
    // frame (…, current) therefore INCLUDES same-instant marks, and the
    // forward frame (current, …) excludes them — distance-0 marks resolve
    // backward, which is also where the equidistance tie must land.
    val ord = Seq(col("__t").asc, col("__tag").asc, col(tieBreak).asc_nulls_first)
    val wBack = Window.partitionBy(on.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(on.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val markStruct = when(col("__tag") === 0,
      struct((payload.map(col) :+ col("__t").as("__mt")): _*))
    val annotated = unioned
      .withColumn("__p", markStruct)
      .select(
        leftCols.map(col) ++ Seq(
          col("__tag"), col("__t"),
          last(col("__p"), ignoreNulls = true).over(wBack).as("__b"),
          first(col("__p"), ignoreNulls = true).over(wFwd).as("__f")): _*)
      .where(col("__tag") === 1)
    val chosen = when(col("__f").isNull, col("__b"))
      .when(col("__b").isNull, col("__f"))
      .when(col("__t") - col("__b.__mt") <= col("__f.__mt") - col("__t"), col("__b"))
      .otherwise(col("__f"))
    annotated
      .withColumn("__c", chosen)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__c.$p").as(p)): _*)
  }

  /** Tagged union shared by [[backward]] and [[nearest]]: left rows carry
    * null payload (typed from the right schema), right rows carry null
    * left-only columns. */
  private def taggedUnion(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "payload must name at least one right column")
    require(payload.forall(p => !left.columns.contains(p)),
      s"payload ${payload.mkString(",")} collides with a left column")

    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftFields = left.schema.fields

    val lPrep = left.select(
      leftFields.toSeq.map(f => col(f.name)) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__tag")) ++
        payload.map(p => lit(null).cast(rightTypes(p)).as(p)): _*)
    val rPrep = right.select(
      leftFields.toSeq.map { f =>
        if (on.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      } ++
        Seq(col(rightTime).as("__t"), lit(0).as("__tag")) ++
        payload.map(col): _*)
    lPrep.unionByName(rPrep)
  }

  /** Self as-of: the marks are the subset of `df` satisfying `markCond` —
    * the common case (attribute each event to the latest prior event of a
    * designated kind). Where [[backward]] over two projections of the same
    * source would scan it twice, this emits BOTH roles from ONE scan: each
    * row explodes into its probe struct plus (conditionally) its mark
    * struct — the same single-scan multi-branch shape as the CDC feed
    * (FeedSpec.toFeed).
    *
    * @param payload (source column, output name) pairs taken from the mark
    *                row; output names must not collide with df's columns
    */
  def selfBackward(
      df: DataFrame,
      on: Seq[String],
      timeCol: String,
      markCond: org.apache.spark.sql.Column,
      payload: Seq[(String, String)],
      tieBreak: String): DataFrame = {
    val unioned = selfTaggedUnion(df, on, timeCol, markCond, payload)
    resolve(unioned, on, df.columns.toSeq, payload.map(_._2), tieBreak)
  }

  /** FORWARD direction (merge_asof direction='forward' — the third
    * direction beside backward and nearest): each probe takes the
    * EARLIEST mark at or after its time — "time to next conversion".
    * Same single-scan tagged union; the window flips to a forward frame,
    * probes sort BEFORE same-instant marks (tag DESC) so `>=` holds at
    * equal times, and `first(struct, ignoreNulls)` keeps the payload
    * atomic (see [[resolve]]'s stale-stitch note). One shuffle. */
  def selfForward(
      df: DataFrame,
      on: Seq[String],
      timeCol: String,
      markCond: org.apache.spark.sql.Column,
      payload: Seq[(String, String)],
      tieBreak: String): DataFrame = {
    val unioned = selfTaggedUnion(df, on, timeCol, markCond, payload)
    val outCols = payload.map(_._2)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").desc, col(tieBreak).asc_nulls_first)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn("__p",
        when(col("__tag") === 0, struct(outCols.map(col): _*)))
      .select(
        df.columns.toSeq.map(col) ++
          Seq(col("__tag"),
            first(col("__p"), ignoreNulls = true).over(w).as("__first")): _*)
      .where(col("__tag") === 1)
      .select(df.columns.toSeq.map(col) ++
        outCols.map(p => col(s"__first.$p").as(p)): _*)
  }

  /** Single-scan tagged union for the self variants: each row explodes
    * into its probe struct plus (conditionally) its mark struct — the same
    * single-scan multi-branch shape as the CDC feed (FeedSpec.toFeed). */
  private def selfTaggedUnion(
      df: DataFrame,
      on: Seq[String],
      timeCol: String,
      markCond: org.apache.spark.sql.Column,
      payload: Seq[(String, String)]): DataFrame = {
    require(payload.nonEmpty, "payload must name at least one column")
    require(payload.forall(p => !df.columns.contains(p._2)),
      s"payload names ${payload.map(_._2).mkString(",")} collide with a source column")
    val fields = df.schema.fields
    val types = fields.map(f => f.name -> f.dataType).toMap

    def role(tag: Int) = struct(
      fields.toSeq.map { f =>
        (if (tag == 1 || on.contains(f.name)) col(f.name)
         else lit(null).cast(f.dataType)).as(f.name)
      } ++
        Seq(col(timeCol).as("__t"), lit(tag).as("__tag")) ++
        payload.map { case (src, out) =>
          (if (tag == 0) col(src) else lit(null).cast(types(src))).as(out)
        }: _*)

    df.select(explode(array(role(1), when(markCond, role(0)))).as("__r"))
      .where(col("__r").isNotNull)
      .select(col("__r.*"))
  }

  /** Shared window resolution over the tagged union (see [[backward]]).
    *
    * The payload is resolved ATOMICALLY: one `last(struct(payload...),
    * ignoreNulls)` — the struct is non-null exactly on mark rows, so the
    * probe always carries ALL values from the single latest mark. A
    * per-column `last(p, ignoreNulls)` would instead skip a NULL field on
    * the latest mark and resurrect a STALE mark's value for just that
    * column, stitching two marks into one output row. */
  private def resolve(
      unioned: DataFrame,
      on: Seq[String],
      leftCols: Seq[String],
      payload: Seq[String],
      tieBreak: String): DataFrame = {
    // Marks sort BEFORE probes at equal time (tag 0 < 1) -> >= semantics;
    // tieBreak totalizes the order among same-instant marks.
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc, col(tieBreak).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__p",
        when(col("__tag") === 0, struct(payload.map(col): _*)))
      .select(
        leftCols.map(col) ++
          Seq(col("__tag"),
            last(col("__p"), ignoreNulls = true).over(w).as("__last")): _*)
      .where(col("__tag") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__last.$p").as(p)): _*)
  }
}
