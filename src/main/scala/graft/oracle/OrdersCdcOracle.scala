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

  /** Composite primary key (l_orderkey, l_linenumber). */
  val lineitem = new CdcOracle(ChangeFeed.lineitemSpec,
    Seq("l_orderkey", "l_linenumber"), "lineitem")

  val changelogSql: String = default.changelogSql
  val feedWindowSql: String = default.feedWindowSql
  val maskGateSql: String = default.maskGateSql
  val unpivotStageSql: String = default.unpivotStageSql
  val pairsSql: String = default.pairsSql
  val sentinelsSql: String = default.sentinelsSql
  val windowAggSql: String = default.windowAggSql
  val queryDataSql: String =
    default.queryDataSql("1995-01-01 00:10:00", "1995-01-01 02:00:00")
  val freshnessSql: String = default.freshnessSql

  /** Composite-key twins of the scan-shaped queries (same LSN window /
    * time range as the orders variants, over the lineitem feed). */
  val lineitemFeedWindowSql: String = lineitem.feedWindowSql
  val lineitemQueryDataSql: String =
    lineitem.queryDataSql("1995-01-01 00:10:00", "1995-01-01 02:00:00")
}
