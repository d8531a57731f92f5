package graft.cdc

import java.time.LocalDate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Surgical PARTITION BACKFILL: re-create one damaged/lost `commit_date`
  * partition of a changelog sink from the change feed, byte-identical to
  * what was lost — the operational capability every partitioned pipeline
  * needs (a bad deploy corrupts a day; you repair THE DAY, not replay
  * history).
  *
  * Why a day is repairable in isolation: surrogate ids are assigned by a
  * DETERMINISTIC total sort led by commit_time
  * (ChangelogBuilder.sortColumns ≙ the reference's insert ORDER BY,
  * usp_cdc_populate_changelog.sql:390-394), so a day's rows form an
  * id-CONTIGUOUS block whose offset is exactly the count of sink rows on
  * earlier days — recoverable from the surviving partitions. And the
  * changelog transform is transaction-local (pairing groups share one
  * commit_time; sentinels are row-local), so building from the
  * day-windowed feed equals restricting the full build to the day.
  *
  * Scale shape: the repair reads the feed pruned to ONE day (the window
  * predicate pushes to the scan like every windowed populate), counts the
  * surviving prefix with a partition-pruned aggregate, and appends through
  * the same stamp path as populate — never rewrites healthy partitions.
  */
object Repair {

  /** Damage injection for drills/tests: drop a whole `commit_date`
    * partition directory from the CURRENT data version. */
  def dropDayPartition(spark: SparkSession, sinkPath: String, day: LocalDate): Boolean = {
    val fs = SinkLayout.fs(spark, sinkPath)
    fs.delete(new Path(SinkLayout.dataDir(spark, sinkPath), s"commit_date=$day"), true)
  }

  /** Re-populate exactly `day` from `feed` into the sink. Idempotence
    * guard: refuses when the partition still exists (a repair over live
    * rows would duplicate ids — drop first, repair second). */
  def repairDay(
      spark: SparkSession,
      feed: DataFrame,
      cfg: CdcTableConfig,
      sinkPath: String,
      day: LocalDate): Long = {
    val fs = SinkLayout.fs(spark, sinkPath)
    val partDir = new Path(SinkLayout.dataDir(spark, sinkPath), s"commit_date=$day")
    require(!fs.exists(partDir),
      s"partition commit_date=$day still exists — drop it before repairing")
    // id offset = surviving rows on EARLIER days; commit_date partition
    // pruning makes this a prefix-only scan (control-plane scalar, like
    // populate's own sink snapshot)
    val offset = SinkLayout.read(spark, sinkPath)
      .where(col("commit_date") < lit(java.sql.Date.valueOf(day)))
      .count()
    val windowed = feed
      .where(to_date(col("commit_time")) === lit(java.sql.Date.valueOf(day)))
      .cache()
    try PopulateChangelog.stampAndAppend(spark, windowed, cfg, sinkPath, offset)
    finally windowed.unpersist()
  }
}
