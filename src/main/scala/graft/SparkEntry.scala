package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{CdcTableConfig, ChangeFeed, ChangelogBuilder}
import graft.oracle.OrdersCdcOracle

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB-runnable oracle in `oracleSql`.
  */
object SparkEntry {

  private val ordersCfg = CdcTableConfig("orders", Seq("o_orderkey"))

  private def orders(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")

  private def feed(s: SparkSession, dir: String): DataFrame =
    ChangeFeed.fromOrders(orders(s, dir))

  /** Flagship: full CDC changelog pipeline on sf0.001 (rows>0 by construction). */
  def entry(spark: SparkSession): DataFrame =
    ChangelogBuilder.withIds(
      ChangelogBuilder.build(feed(spark, "/root/testdata/sf0.001"), ordersCfg), ordersCfg)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O1+U1+J1+R1+P1 composite — the reference's whole generated INSERT…SELECT
    "cdc_changelog" -> ((s, dir) =>
      ChangelogBuilder.withIds(ChangelogBuilder.build(feed(s, dir), ordersCfg), ordersCfg)
        .select("changelog_id", "commit_time", "table_name", "o_orderkey",
          "column_name", "old_value", "new_value")
        .orderBy("changelog_id")),

    // S1 — bounded LSN-window scan of the change feed
    "cdc_feed_window" -> ((s, dir) =>
      feed(s, dir)
        .where(col("start_lsn") > 100 && col("start_lsn") <= 800)
        .select("start_lsn", "seqval", "operation", "update_mask", "commit_time")
        .orderBy("start_lsn", "seqval", "operation")),

    // P1 — mask-gate projection (fn_cdc_is_bit_set ≙ codegen'd bit ops)
    "cdc_mask_gate" -> ((s, dir) =>
      ChangelogBuilder.maskGated(feed(s, dir), ordersCfg)
        .select((Seq("start_lsn", "seqval", "operation") ++ ChangeFeed.OrdersCols).map(col): _*)
        .orderBy("start_lsn", "seqval", "operation")),

    // R1 — unpivot wide→long, T-SQL NULL-drop semantics
    "cdc_unpivot" -> ((s, dir) =>
      ChangelogBuilder.unpivoted(feed(s, dir), ordersCfg)
        .select(col("start_lsn"), col("seqval"), col("operation"),
          col(ChangelogBuilder.keyId("o_orderkey")).as("pk"), col("column_name"), col("value"))
        .orderBy("start_lsn", "seqval", "operation", "column_name", "value")),

    // J1 — before⋈after equi-join on (lsn, seqval, column, pk)
    "cdc_update_pairs" -> ((s, dir) =>
      ChangelogBuilder.updatePairs(feed(s, dir), ordersCfg)
        .orderBy("commit_time", "o_orderkey", "column_name", "old_value", "new_value")),

    // sentinel branches (delete/insert record-level rows) + UNION ALL
    "cdc_sentinels" -> ((s, dir) =>
      ChangelogBuilder.sentinels(feed(s, dir), ordersCfg)
        .orderBy(col("commit_time"), col("o_orderkey"), col("old_value").asc_nulls_first)),

    // A1/A2/A4 — scalar aggregates used by checkpoint/window math
    "cdc_window_agg" -> ((s, dir) =>
      feed(s, dir).agg(
        min(col("commit_time")).as("min_time"),
        max(col("commit_time")).as("max_time"),
        count(lit(1)).as("n_changes"))),

    // S3/P3 — day-granularity time-range scan over the changelog
    "cdc_query_data" -> ((s, dir) =>
      ChangelogBuilder.build(feed(s, dir), ordersCfg)
        .where(col("commit_time") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("commit_time") <= lit("1997-06-01 00:00:00").cast("timestamp"))
        .orderBy(col("commit_time"), col("o_orderkey"), col("column_name").asc_nulls_first,
          col("old_value").asc_nulls_first, col("new_value").asc_nulls_first)),

    // A3 — freshness watermark, reference's lexicographic mm/dd/yyyy quirk
    "cdc_freshness" -> ((s, dir) =>
      feed(s, dir).agg(max(date_format(col("commit_time"), "MM/dd/yyyy")).as("freshness")))
  )

  def oracleSql: Map[String, String] = Map(
    "cdc_changelog" -> OrdersCdcOracle.changelogSql,
    "cdc_feed_window" -> OrdersCdcOracle.feedWindowSql,
    "cdc_mask_gate" -> OrdersCdcOracle.maskGateSql,
    "cdc_unpivot" -> OrdersCdcOracle.unpivotStageSql,
    "cdc_update_pairs" -> OrdersCdcOracle.pairsSql,
    "cdc_sentinels" -> OrdersCdcOracle.sentinelsSql,
    "cdc_window_agg" -> OrdersCdcOracle.windowAggSql,
    "cdc_query_data" -> OrdersCdcOracle.queryDataSql,
    "cdc_freshness" -> OrdersCdcOracle.freshnessSql
  )
}
