package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Star-schema analytics over the fixture warehouse: the canonical
  * fact⋈dims rollup shape, with every dimension explicitly broadcast —
  * at 100 TB the fact table streams through map-side hash joins with zero
  * shuffle until the final low-cardinality aggregation.
  *
  * Money lands as integer cents (`floor(x*100)` — identical across
  * engines; double SUM order is not) so the result is hash-exact.
  */
object Analytics {

  def revenueByRegion(
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      region: DataFrame): DataFrame =
    orders
      .join(BroadcastGate.broadcastIfSmall(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("revenue_cents"),
        countDistinct(col("c_custkey")).as("n_customers"))

  /** The same star join under ROLLUP grouping sets: per-(region, nation)
    * rows plus per-region and grand-total super-aggregates in ONE pass —
    * Catalyst expands the rollup into a single Expand + hash aggregate, so
    * the fact table is still read and shuffled once (vs three separate
    * aggregations). `gid` is the standard grouping-id bitmask
    * (r_name bit 1, n_name bit 0) distinguishing detail from subtotal
    * rows, 0/1/3 for a two-column rollup. */
  def revenueRollup(
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      region: DataFrame): DataFrame =
    orders
      .join(BroadcastGate.broadcastIfSmall(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("revenue_cents"),
        countDistinct(col("c_custkey")).as("n_customers"))

  /** Sliding time-RANGE aggregation per event — the per-entity rolling
    * feature a fraud/engagement model reads at serving time ("this user's
    * activity over the trailing hour, AS OF each event"): for every event,
    * the count and value sum of the same user's events in
    * `(t − windowSec, t]`... inclusive bounds per SQL RANGE frame
    * semantics (`RANGE BETWEEN windowSec PRECEDING AND CURRENT ROW` over
    * epoch seconds — VALUE bounds, so same-second peers aggregate
    * together on both engines regardless of row order).
    *
    * Scale shape: one shuffle on user_id, then a single sort-window pass —
    * the frame advances two pointers over each partition, never
    * re-scanning the window per row; state is the frame's running
    * aggregate, not the member list. Money as integer cents
    * (`floor(v*100 + 0.5)` — identical double math both engines). */
  def movingUserActivity(events: DataFrame, windowSec: Long = 3600): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("t_s")
      .rangeBetween(-windowSec, Window.currentRow)
    events
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000000000").as("t_s"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("__cents"))
      .select(col("event_id"), col("user_id"), col("t_s"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("__cents")).over(w).as("cents_1h"))
  }

  /** CUBE grouping sets over orders: all four (priority × status)
    * grouping combinations — including the two single-dimension margins
    * ROLLUP omits — in ONE Expand + aggregate pass over the fact table
    * (never one scan per grouping set). `grouping_id` disambiguates the
    * NULL-as-total rows exactly as in [[revenueRollup]]; first grouping
    * expression = MSB on both engines. */
  def ordersCube(orders: DataFrame): DataFrame =
    orders
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("revenue_cents"))

  /** Time-series GAP FILL + LOCF: the dense per-(group, hour) grid a
    * reporting layer charts — hours with no events appear with a ZERO
    * count (a missing row and a zero row are different facts), and the
    * carried metric (max cents seen) is interpolated forward from the
    * last observed hour (last-observation-carried-forward via
    * `last_value(..., ignoreNulls)` over the filled grid; leading gap
    * hours render 0).
    *
    * Scale shape: one aggregate over the events collapses to (group,
    * hour) grain; the dense grid is |groups| × |hours| — dimension-sized,
    * never event-sized — built from the aggregate's own bounds (no second
    * event scan) and left-joined back. The LOCF window partitions by
    * group, so no single-partition funnel. */
  def gapFillHourly(events: DataFrame, groupCol: String): DataFrame = {
    val intDiv = graft.ext.TextOps.intDiv _
    val agg = events
      .select(col(groupCol), intDiv(expr("ts div 1000000000"), lit(3600L)).as("h"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("__cents"))
      .groupBy(groupCol, "h")
      .agg(count(lit(1)).as("__n"), max("__cents").as("__mx"))
      .localCheckpoint(true) // bounds, groups, and the grid join all derive from it
    val bounds = agg.agg(min("h").as("__lo"), max("h").as("__hi"))
    val hours = bounds.select(explode(sequence(col("__lo"), col("__hi"))).as("h"))
    val groups = agg.select(groupCol).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("h")
    groups.crossJoin(hours)
      .join(agg, Seq(groupCol, "h"), "left")
      .select(col(groupCol), col("h").as("hour_id"),
        coalesce(col("__n"), lit(0L)).as("n_events"),
        coalesce(last(col("__mx"), ignoreNulls = true).over(w), lit(0L)).as("cents_locf"))
  }

  /** Market-basket association rules at the PAIR level (Apriori/FP-growth's
    * first and overwhelmingly dominant stage): for item pairs co-occurring
    * in ≥ `minSupport` baskets, the support / confidence (both directions)
    * / lift table in integer basis points — the
    * frequently-bought-together signal.
    *
    * Scale shape: the pair generation is the same quadratic-per-basket
    * projection as [[graft.ext.Graph.coOccurrenceEdges]] and carries the
    * same hot-basket guard (a 10⁶-item basket is skipped, never exploded);
    * the support filter prunes the long tail BEFORE the per-item joins,
    * so the rules table the metric joins against is `minSupport`-bounded,
    * not all-pairs. Division order fixed for engine-exact integers; lift
    * multiplies before dividing (`c12·N·10⁴ div (c_a·c_b)`).
    */
  def basketRules(
      baskets: DataFrame,
      groupCol: String,
      memberCol: String,
      maxGroupSize: Int,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val intDiv = graft.ext.TextOps.intDiv _
    val pm = baskets
      .select(col(groupCol).as("__g"), col(memberCol).as("__m"))
      .distinct()
    val ok = pm.groupBy("__g").agg(count(lit(1)).as("__gs"))
      .where(col("__gs") <= maxGroupSize)
      .select("__g")
    val inG = pm.join(ok, "__g").localCheckpoint(true) // baskets, singles, pairs share it
    val nBaskets = inG.select(col("__g")).distinct()
      .agg(count(lit(1)).as("__n"))
    val singles = inG.groupBy("__m").agg(count(lit(1)).as("__c1"))
    val l = inG.select(col("__g"), col("__m").as("a"))
    val r = inG.select(col("__g"), col("__m").as("b"))
    val pairs = l.join(r, Seq("__g")).where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("support_n"))
      .where(col("support_n") >= minSupport)
    pairs
      .join(singles.select(col("__m").as("a"), col("__c1").as("__ca")), Seq("a"))
      .join(singles.select(col("__m").as("b"), col("__c1").as("__cb")), Seq("b"))
      .crossJoin(nBaskets) // 1-row broadcast aggregate
      .select(col("a"), col("b"), col("support_n"),
        intDiv(col("support_n") * lit(10000L), col("__n")).as("support_bp"),
        intDiv(col("support_n") * lit(10000L), col("__ca")).as("conf_a_to_b_bp"),
        intDiv(col("support_n") * lit(10000L), col("__cb")).as("conf_b_to_a_bp"),
        intDiv(col("support_n") * col("__n") * lit(10000L),
          col("__ca") * col("__cb")).as("lift_bp"))
  }

  /** Trailing-baseline ANOMALY detection over the [[gapFillHourly]] dense
    * series — the ops-monitoring alert shape: each hour's event count vs
    * the trailing 24 dense hours (ROWS frame == real wall-clock hours
    * BECAUSE the grid is gap-filled; over a sparse series a row frame
    * would silently stretch across gaps). Deviation is integer basis
    * points of the trailing mean with the division order fixed on both
    * engines (`n · baseline_hours · 10⁴ div baseline_sum`); hours with an
    * all-zero or empty baseline get a NULL deviation, never a division
    * blowup. One aggregate + one window pass over the grid — the grid
    * (groups × hours) is the cost, not the event table. */
  /** Spike threshold shared with the oracle: 2× the trailing mean. */
  val SpikeBp = 20000L

  /** Pair-support cut shared by the graded basket-rules query + oracle. */
  val BasketMinSupport = 2L

  def hourlyAnomalies(
      events: DataFrame, groupCol: String, spikeBp: Long = SpikeBp): DataFrame = {
    val intDiv = graft.ext.TextOps.intDiv _
    val w = Window.partitionBy(groupCol).orderBy("hour_id").rowsBetween(-24, -1)
    gapFillHourly(events, groupCol)
      .select(col(groupCol), col("hour_id"), col("n_events"),
        coalesce(sum(col("n_events")).over(w), lit(0L)).as("baseline_sum"),
        count(lit(1)).over(w).as("baseline_hours"))
      .withColumn("dev_bp", when(col("baseline_sum") > 0,
        intDiv(col("n_events") * col("baseline_hours") * lit(10000L),
          col("baseline_sum"))))
      .withColumn("is_spike",
        when(col("dev_bp").isNotNull && col("dev_bp") > spikeBp, 1L).otherwise(0L))
  }

  /** EXACT distributed quantiles by rank selection — the companion to the
    * mergeable approximate histogram sketch (TextOps.histQuantiles) for
    * when the answer must be an actual data element: one shuffle on the
    * group key, one sort-window pass ranking values, and the p-quantile
    * read as the element at rank `ceil(p·n)` (conditional aggregate — no
    * second scan, no driver collect). Value-at-rank is well-defined under
    * ties whatever the tie order, so no tiebreak column is needed. */
  def exactQuantiles(
      rows: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(valueCol)
    val intDiv = graft.ext.TextOps.intDiv _
    rows
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(groupCol)))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_rows"),
        min(valueCol).as("min_v"),
        max(when(col("__rn") === intDiv(col("__cnt") + 1, lit(2L)), col(valueCol)))
          .as("p50_v"),
        max(when(col("__rn") === intDiv(col("__cnt") * 9 + 9, lit(10L)), col(valueCol)))
          .as("p90_v"),
        max(valueCol).as("max_v"))
  }
}
