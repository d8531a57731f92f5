package graft.oracle

import graft.cdc.ChangeFeed

/** Oracle instances for the graded CDC queries: the orders feed (default
  * and compat variants) and the composite-key lineitem twin — all driven by
  * the same [[CdcOracle]] generator over the same [[graft.cdc.FeedSpec]]s
  * the Spark side executes.
  */
object OrdersCdcOracle {

  val default = new CdcOracle(ChangeFeed.ordersSpec, Seq("o_orderkey"), "orders")

  /** ≙ compatMode: seqval-less join fan-out + VARCHAR(128) truncation. */
  val compat = new CdcOracle(ChangeFeed.ordersSpec, Seq("o_orderkey"), "orders",
    joinOnSeqval = false, truncate128 = true)

  /** ≙ strictNulls: NULL-transition updates kept via full-outer pairing. */
  val strict = new CdcOracle(ChangeFeed.ordersSpec, Seq("o_orderkey"), "orders",
    fullOuterPairs = true)

  /** Composite primary key (l_orderkey, l_linenumber). */
  val lineitem = new CdcOracle(ChangeFeed.lineitemSpec,
    Seq("l_orderkey", "l_linenumber"), "lineitem")

  /** 72-column BINARY-mask twin (hex-string mask in the oracle, BinaryType
    * + BinaryMaskBit on the Spark side — same big-endian bit addressing). */
  val wide = new CdcOracle(graft.cdc.WideFeed.spec, Seq("o_orderkey"), "orders_wide")

  val changelogSql: String = default.changelogSql
  val feedWindowSql: String = default.feedWindowSql
  val maskGateSql: String = default.maskGateSql
  val unpivotStageSql: String = default.unpivotStageSql
  val pairsSql: String = default.pairsSql
  val sentinelsSql: String = default.sentinelsSql
  val windowAggSql: String = default.windowAggSql
  val queryDataSql: String =
    default.queryDataSql("1995-01-01 00:10:00", "1995-01-01 02:00:00")

  /** The sink-backed QueryData.run drive: the engine receives from=00:10 /
    * to=Jan-2 00:00 but the reference truncates BOTH bounds to midnight
    * (usp_cdc_query_data.sql:52-57) — the oracle encodes the truncated
    * range, so the graded row proves the day-granularity semantics. */
  val queryDataSinkSql: String =
    default.queryDataSql("1995-01-01 00:00:00", "1995-01-02 00:00:00")
  val freshnessSql: String = default.freshnessSql

  /** Composite-key twins of the scan-shaped queries (same LSN window /
    * time range as the orders variants, over the lineitem feed). */
  val lineitemFeedWindowSql: String = lineitem.feedWindowSql
  val lineitemQueryDataSql: String =
    lineitem.queryDataSql("1995-01-01 00:10:00", "1995-01-01 02:00:00")

  /** Two-batch incremental-resume oracles. The split point must fall
    * INSIDE the commit-time range at every SF or batch 2 is empty and the
    * drive degenerates to first-run-only: orderkeys are dense from 1, so
    * sf0.001's ~1500 orders span only ~25 minutes of commit time — 00:12
    * splits (and the +1-min compat gap loses rows) at every SF. Lossless
    * default resume loses nothing: its oracle IS the one-batch changelog. */
  val ResumeMid = "1995-01-01 00:12:00"
  val resumeChangelogSql: String = default.changelogSql
  val resumeCompatChangelogSql: String = compat.resumeChangelogSql(ResumeMid, gapMinutes = 1)
}
