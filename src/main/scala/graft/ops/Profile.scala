package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: per-column row/null counts, min/max, and
  * EXACT distinct counts, in TWO scans total regardless of column count —
  * the stats a cost-based optimizer (or a pipeline health check) collects.
  *
  * The naive Spark formulation — one `agg(countDistinct(c1),
  * countDistinct(c2), …)` — plans an Expand that multiplies every input
  * row by the column count before the shuffle (8 columns → 8× shuffle
  * volume of the full table). Instead:
  *
  *   - pass 1 (wide): nulls/min/max for ALL columns in one ordinary
  *     aggregate — no Expand, partial-aggregated map-side to one row;
  *   - pass 2 (long): each row explodes into (column, rendered value)
  *     pairs — the same k× multiplication, but immediately REDUCED by a
  *     (column, value) hash aggregate whose output is Σ ndv rows, then a
  *     per-column count. Map-side partial aggregation collapses repeats
  *     before the shuffle, so shuffle volume is bounded by the DISTINCT
  *     value count, not the row count — the difference between this and
  *     Expand at 100 TB.
  *
  * Values are rendered engine-portably (the repo's no-raw-floats rule):
  * integral columns as-is, doubles as floor(x·100) cents, timestamps as
  * epoch seconds, strings via a separate VARCHAR min/max pair. Distinct
  * counts are over the RENDERED values — exact for integral / string /
  * timestamp columns, cents-granular for doubles (documented contract;
  * the oracle renders identically, so the engines agree bit-for-bit).
  */
object Profile {

  /** The graded lineitem profile — shared with the DuckDB oracle
    * (ExtOracle.tableStatsSql renders the same list with the same
    * per-kind rendering, so the two cannot drift). Alphabetical, matching
    * the output ordering. */
  val LineitemCols: Seq[(String, Kind)] = Seq(
    "l_extendedprice" -> CentsCol,
    "l_linenumber" -> IntCol,
    "l_orderkey" -> IntCol,
    "l_partkey" -> IntCol,
    "l_quantity" -> CentsCol,
    "l_returnflag" -> StrCol,
    "l_shipdate" -> TsCol,
    "l_suppkey" -> IntCol)

  sealed trait Kind
  case object IntCol extends Kind
  /** double rendered as floor(x·100) — exact for money-style fixtures */
  case object CentsCol extends Kind
  /** timestamp rendered as epoch seconds (UTC session) */
  case object TsCol extends Kind
  case object StrCol extends Kind

  private def rendered(name: String, kind: Kind): Column = kind match {
    case IntCol => col(name).cast("long")
    case CentsCol => floor(col(name) * 100).cast("long")
    case TsCol => expr(s"CAST(to_unix_timestamp(CAST($name AS TIMESTAMP)) AS BIGINT)")
    case StrCol => col(name)
  }

  /** @return one row per profiled column: `column_name`, `n_rows`,
    *         `n_nulls`, `n_distinct` (exact, NULLs excluded), `min_i` /
    *         `max_i` (BIGINT rendering, NULL for string columns), `min_s` /
    *         `max_s` (string columns only) — ordered by column_name
    */
  def columnStats(df: DataFrame, cols: Seq[(String, Kind)]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")

    // pass 1: one wide aggregate row -> long form via explode
    val wideAggs = cols.flatMap { case (name, kind) =>
      val r = rendered(name, kind)
      Seq(
        count(lit(1)).as(s"__n_$name"),
        sum(when(col(name).isNull, 1L).otherwise(0L)).as(s"__z_$name"),
        (if (kind == StrCol) lit(null).cast("long") else min(r)).as(s"__mini_$name"),
        (if (kind == StrCol) lit(null).cast("long") else max(r)).as(s"__maxi_$name"),
        (if (kind == StrCol) min(r) else lit(null).cast("string")).as(s"__mins_$name"),
        (if (kind == StrCol) max(r) else lit(null).cast("string")).as(s"__maxs_$name"))
    }
    val wide = df.agg(wideAggs.head, wideAggs.tail: _*)
      .select(explode(array(cols.map { case (name, _) =>
        struct(
          lit(name).as("column_name"),
          col(s"__n_$name").as("n_rows"),
          col(s"__z_$name").as("n_nulls"),
          col(s"__mini_$name").as("min_i"),
          col(s"__maxi_$name").as("max_i"),
          col(s"__mins_$name").as("min_s"),
          col(s"__maxs_$name").as("max_s"))
      }: _*)).as("__s"))
      .select(col("__s.*"))

    // pass 2: exact ndv via the reduced long form (never an Expand plan)
    val ndv = df
      .select(explode(array(cols.map { case (name, kind) =>
        struct(lit(name).as("column_name"),
          rendered(name, kind).cast("string").as("v"))
      }: _*)).as("__p"))
      .select(col("__p.*"))
      .where(col("v").isNotNull)
      .groupBy("column_name", "v").agg(count(lit(1)).as("__c"))
      .groupBy("column_name").agg(count(lit(1)).as("n_distinct"))

    wide.join(ndv, Seq("column_name"), "left")
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_i"), col("max_i"), col("min_s"), col("max_s"))
      .orderBy("column_name")
  }

  /** Equi-width HISTOGRAMS for the numeric/timestamp columns (the other
    * statistic a cost-based optimizer keeps): per column, `bins` buckets
    * spanning [min, max], all integer math —
    * `bin = (v − min) · bins div (max − min + 1)` over the same portable
    * rendering as [[columnStats]]. Two scans for ALL columns together:
    * one wide min/max aggregate (broadcast back as a 1-row scalar — the
    * repo's broadcast-threshold pattern), one long-form binning pass
    * reduced by a (column, bin) hash aggregate whose output is at most
    * `cols × bins` rows. Empty bins are simply absent. */
  def columnHistograms(df: DataFrame, cols: Seq[(String, Kind)], bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val numeric = cols.filterNot(_._2 == StrCol)
    require(numeric.nonEmpty, "histograms need at least one non-string column")

    val boundAggs = numeric.flatMap { case (name, kind) =>
      val r = rendered(name, kind)
      Seq(min(r).as(s"__lo_$name"), max(r).as(s"__hi_$name"))
    }
    val bounds = df.agg(boundAggs.head, boundAggs.tail: _*)
      .select(explode(array(numeric.map { case (name, _) =>
        struct(lit(name).as("column_name"),
          col(s"__lo_$name").as("lo"), col(s"__hi_$name").as("hi"))
      }: _*)).as("__b"))
      .select(col("__b.*"))

    val longForm = df
      .select(explode(array(numeric.map { case (name, kind) =>
        struct(lit(name).as("column_name"), rendered(name, kind).as("v"))
      }: _*)).as("__p"))
      .select(col("__p.*"))
      .where(col("v").isNotNull)

    longForm.join(broadcast(bounds), Seq("column_name"))
      .select(col("column_name"),
        graft.ext.TextOps.intDiv((col("v") - col("lo")) * lit(bins.toLong),
          col("hi") - col("lo") + lit(1L)).as("bin"))
      .groupBy("column_name", "bin")
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("column_name", "bin")
  }

  /** Tukey-fence OUTLIER profiling per group: quartiles by exact rank
    * selection (same `ceil(p·n)` convention as Analytics.exactQuantiles),
    * then counts outside `[Q1 − 1.5·IQR, Q3 + 1.5·IQR]`. The half-unit
    * fence arithmetic stays integer-exact by comparing DOUBLED values
    * (`2v < 2·Q1 − 3·IQR`) — no rational math to diverge between engines.
    * Two aggregates: the quartile pass (one sort-window) and a recount
    * against the broadcast per-group fence row. The standard anomaly
    * screen a profiling pass runs per column at ingest. */
  def outlierFences(rows: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val intDiv = graft.ext.TextOps.intDiv _
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol).orderBy(valueCol)
    val q = rows
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(groupCol)))
      .groupBy(groupCol)
      .agg(
        max(when(col("__rn") === intDiv(col("__cnt") + 3, lit(4L)), col(valueCol)))
          .as("p25_v"),
        max(when(col("__rn") === intDiv(col("__cnt") * 3 + 3, lit(4L)), col(valueCol)))
          .as("p75_v"))
    val iqr = col("p75_v") - col("p25_v")
    rows.join(broadcast(q), Seq(groupCol))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_rows"),
        max(col("p25_v")).as("p25_v"),
        max(col("p75_v")).as("p75_v"),
        sum(when(col(valueCol) * 2 < col("p25_v") * 2 - iqr * 3, 1L).otherwise(0L))
          .as("n_low"),
        sum(when(col(valueCol) * 2 > col("p75_v") * 2 + iqr * 3, 1L).otherwise(0L))
          .as("n_high"))
  }

  /** Empirical PERCENTILE-RANK normalization per group — the rank-based
    * feature scaling (quantile transform) ML preprocessing runs when a
    * feature's raw scale is meaningless: each row's value becomes the
    * share of the group strictly below it, in integer basis points
    * (`(rank − 1) · 10⁴ div n`; ties share a percentile — `rank()`'s
    * min-rank convention on both engines, deterministic with no tiebreak
    * column needed). One shuffle on the group key, one sort-window pass. */
  def percentileRanks(rows: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(valueCol)
    val n = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(groupCol))
    rows.withColumn("pct_bp",
      graft.ext.TextOps.intDiv((rank().over(w) - 1).cast("long") * 10000L, n))
  }
}
