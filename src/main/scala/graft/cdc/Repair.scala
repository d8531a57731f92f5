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
    * rows would duplicate ids — drop first, repair second).
    *
    * HWM guard: the day window is additionally bounded at the sink's
    * populate high-water mark, or repair would re-insert feed rows the
    * last populate never reached (an intra-day `toDate`), breaking id
    * contiguity and the next resume window. The HWM is read from the
    * SURVIVING sink in the same aggregate as the id offset — which means
    * the NEWEST day (the HWM's own day) is only repairable with
    * `originalHwm`, the populate HWM recorded before the damage: with
    * that partition gone, the surviving max(commit_time) sits on an
    * earlier day and cannot recover where the lost day's window ended. */
  def repairDay(
      spark: SparkSession,
      feed: DataFrame,
      cfg: CdcTableConfig,
      sinkPath: String,
      day: LocalDate,
      originalHwm: Option[java.sql.Timestamp] = None): Long = {
    val fs = SinkLayout.fs(spark, sinkPath)
    val partDir = new Path(SinkLayout.dataDir(spark, sinkPath), s"commit_date=$day")
    require(!fs.exists(partDir),
      s"partition commit_date=$day still exists — drop it before repairing")
    // ONE sink aggregate yields both control-plane scalars: the id offset
    // (surviving rows on EARLIER days — the filter prunes partitions) and
    // the surviving HWM (like populate's own sink snapshot, so the two
    // can never disagree)
    val snap = SinkLayout.read(spark, sinkPath).agg(
      count(when(col("commit_date") < lit(java.sql.Date.valueOf(day)), lit(1)))
        .as("__offset"),
      max(col("commit_time")).as("__hwm")).head()
    val offset = snap.getLong(0)
    val hwm = originalHwm.getOrElse {
      val surviving = snap.getTimestamp(1)
      require(surviving != null &&
          !surviving.toLocalDateTime.toLocalDate.isBefore(day.plusDays(1)),
        s"commit_date=$day is not strictly before the surviving HWM " +
          s"($surviving) — repairing the newest day needs originalHwm, the " +
          "populate HWM recorded before the damage")
      surviving
    }
    val windowed = feed
      .where(to_date(col("commit_time")) === lit(java.sql.Date.valueOf(day)) &&
        col("commit_time") <= lit(hwm))
      .cache()
    try PopulateChangelog.stampAndAppend(spark, windowed, cfg, sinkPath, offset)
    finally windowed.unpersist()
  }
}
