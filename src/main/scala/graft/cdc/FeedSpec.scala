package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One branch of a synthetic CDC feed: which source rows participate
  * (`cond`), the operation/mask/seqval stamped on them, and per-column
  * value overrides. All SQL fragments are written in the dialect
  * intersection parseable by BOTH Spark's `expr()` and DuckDB, so a single
  * definition drives the Spark feed and its oracle mirror.
  */
final case class FeedBranch(
    cond: String,
    op: Int,
    mask: Long,
    seq: Long,
    overrides: Map[String, String] = Map.empty,
    maskHex: Option[String] = None)

/** Declarative synthetic-CDC-feed spec over a driver fixture table
  * (FIXTURES.md B1): the single source of truth for both the Spark feed
  * ([[toFeed]] — ONE scan) and the DuckDB oracle ([[feedSql]]).
  *
  * `commit_time` is derived monotonically from `start_lsn` (base instant +
  * lsn seconds), honoring the `fn_cdc_map_lsn_to_time` contract the
  * checkpoint window math relies on (usp_cdc_populate_changelog.sql:278,
  * :241-253): LSN order == commit-time order, same-transaction rows share
  * one commit_time, and adjacent transactions land in the same minute
  * (pinning the +1-minute compat gap).
  */
/** @param dedupKeys when non-empty, the source is first reduced to one row
  *                   per key (min() of every other column) — a CDC feed
  *                   requires unique row identity, which the driver's
  *                   "TPC-H-ish" lineitem fixture does not have on
  *                   (l_orderkey, l_linenumber).
  */
final case class FeedSpec(
    table: String,
    srcCols: Seq[String],
    lsn: String,
    branches: Seq[FeedBranch],
    dedupKeys: Seq[String] = Nil) {

  /** True ⇔ this feed carries a variable-width BINARY update mask (≙ the
    * reference's width-unlimited VARBINARY `__$update_mask`,
    * usp_cdc_populate_changelog.sql:305) instead of the ≤64-column LongType
    * fast path. All branches must agree — the exploded struct has ONE mask
    * type — and every hex string must be the same width so high ordinals
    * always resolve to a real byte. */
  val binaryMask: Boolean = branches.exists(_.maskHex.isDefined)
  require(!binaryMask || branches.forall(_.maskHex.isDefined),
    "mixed mask encodings: either every branch has maskHex or none does")
  require(!binaryMask || branches.map(_.maskHex.get.length).distinct.size == 1,
    "all binary masks must have the same hex width")

  val commitBase = "1995-01-01 00:00:00"

  def sparkCommitTime: Column =
    expr(s"TIMESTAMP '$commitBase' + make_dt_interval(0, 0, 0, CAST($lsn AS BIGINT))")

  def duckCommitTime: String =
    s"TIMESTAMP '$commitBase' + to_seconds(CAST($lsn AS BIGINT))"

  /** The Spark feed as a SINGLE scan of the source: each source row maps to
    * an array of per-branch structs (null when the row isn't in the
    * branch), filtered and exploded. The 100 TB shape: the reference's
    * 12-branch UNION over the same table would scan it 12 times per
    * consumer sub-tree; this scans once, total, per consumer.
    *
    * @param materializeDedup eagerly localCheckpoint the deduped source so
    *        consumers that reference the feed from SEVERAL sub-trees
    *        (ChangelogBuilder.build: pairs + sentinels) pay the dedup
    *        shuffle once instead of once per sub-tree. The explode stays
    *        lazy (map-only, cheap to recompute). Checkpoint blocks are
    *        reclaimed by the ContextCleaner when the frame is dropped —
    *        no permanent cache entry per call. Leave FALSE for windowed
    *        scans: a checkpoint is a materialization barrier, and their
    *        lsn/commit-time predicates must keep pushing THROUGH the dedup
    *        aggregate to the parquet scan (plan-locked by PlanShapeSpec).
    */
  def toFeed(src0: DataFrame, materializeDedup: Boolean = false): DataFrame = {
    val deduped =
      if (dedupKeys.isEmpty) src0
      else {
        val rest = srcCols.filterNot(dedupKeys.contains)
        // All-columns-are-key degenerates to distinct() — feedSql's GROUP BY
        // handles that case fine, and the two paths must not diverge on it.
        if (rest.isEmpty) src0.select(srcCols.map(col): _*).distinct()
        else src0.groupBy(dedupKeys.map(col): _*)
          .agg(min(col(rest.head)).as(rest.head),
            rest.tail.map(c => min(col(c)).as(c)): _*)
          .select(srcCols.map(col): _*)
      }
    val src =
      if (materializeDedup && dedupKeys.nonEmpty) deduped.localCheckpoint(true)
      else deduped
    // start_lsn and commit_time are BRANCH-INVARIANT (functions of the key
    // columns only), so they stay OUTSIDE the exploded struct: a feed-level
    // predicate on either (LSN windows, commit-time ranges — every scan
    // query has one) then references a non-generated column and Catalyst
    // pushes it through the Generate AND the dedup aggregate (whose
    // grouping columns the lsn expression uses) down to the scan — at
    // scale, the difference between shuffling the whole table and
    // shuffling the window.
    val structs = branches.map { b =>
      // binary masks ride as unhex'd literals (BinaryType), exercising the
      // BinaryMaskBit gate downstream; long masks stay the codegen'd
      // integer fast path
      val maskLit = b.maskHex match {
        case Some(h) => unhex(lit(h))
        case None => lit(b.mask)
      }
      when(expr(b.cond), struct(
        (Seq(
          lit(b.seq).cast("long").as("seqval"),
          lit(b.op).as("operation"),
          maskLit.as("update_mask")) ++
          srcCols.map { c =>
            b.overrides.get(c).map(expr).getOrElse(col(c))
              .cast(src.schema(c).dataType).as(c)
          }): _*))
    }
    // explode the raw array and drop null entries with a row-level filter:
    // the higher-order filter() is CodegenFallback and would break the
    // whole-stage-codegen span right at the scan; Generate + Filter stay
    // inside it
    src
      .select(
        expr(lsn).cast("long").as("start_lsn"),
        sparkCommitTime.as("commit_time"),
        explode(array(structs: _*)).as("__r"))
      .where(col("__r").isNotNull)
      .select(
        Seq(col("start_lsn"), col("__r.seqval"), col("__r.operation"),
          col("__r.update_mask"), col("commit_time")) ++
          srcCols.map(c => col(s"__r.$c")): _*)
  }

  /** DuckDB mirror of [[toFeed]] (one SELECT per branch; the oracle need
    * not be single-scan — DuckDB only runs at test scale). */
  def feedSql: String = {
    val source =
      if (dedupKeys.isEmpty) table
      else {
        val aggCols = srcCols
          .map(c => if (dedupKeys.contains(c)) c else s"min($c) AS $c")
          .mkString(", ")
        s"(SELECT $aggCols FROM $table GROUP BY ${dedupKeys.mkString(", ")})"
      }
    branches.map { b =>
      val proj = srcCols
        .map(c => b.overrides.get(c).map(o => s"$o AS $c").getOrElse(c))
        .mkString(", ")
      // a binary mask renders as its fixed-width hex string (VARCHAR) —
      // the oracle's bit test addresses hex char pairs from the end, the
      // same big-endian convention BinaryMaskBit uses on the byte array
      val maskSql = b.maskHex match {
        case Some(h) => s"'$h'"
        case None => s"CAST(${b.mask} AS BIGINT)"
      }
      s"SELECT CAST($lsn AS BIGINT) AS start_lsn, CAST(${b.seq} AS BIGINT) AS seqval, " +
        s"${b.op} AS operation, $maskSql AS update_mask, " +
        s"$duckCommitTime AS commit_time, $proj FROM $source AS src WHERE ${b.cond}"
    }.mkString("\n  UNION ALL\n  ")
  }
}
