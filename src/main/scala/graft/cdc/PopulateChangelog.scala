package graft.cdc

import java.sql.Timestamp

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

final case class PopulateResult(rowsInserted: Long, message: String)

/** Batch orchestration ≙ usp_cdc_populate_changelog (the whole procedure).
  *
  * One invocation = one micro-batch: read checkpoint from the sink, window
  * the feed, run ChangelogBuilder, sort + assign ids, append. The audit
  * columns (created_dt/created_by, DDL defaults :151-152,:172-173) are
  * stamped at write time.
  *
  * Scale notes (SURVEY §7.5.8): the sink is partitioned by
  * `commit_date = date(commit_time)` so usp_cdc_query_data's time-range scan
  * becomes real partition pruning; id assignment is per-batch (bounded), not
  * per-table.
  */
object PopulateChangelog {

  val AuditCols: Seq[String] = Seq("created_dt", "created_by")

  /** Above this ESTIMATED batch size the single-window id path
    * ([[ChangelogBuilder.withIds]], one task sorts the whole batch) is
    * auto-upgraded to [[ChangelogBuilder.withIdsDistributed]]. 2 GiB of
    * input comfortably bounds one task's sort; a 100 TB first-run backfill
    * (one giant "batch") upgrades automatically instead of funnelling
    * through a single window partition. */
  val AutoDistributeBytes: Long = 2L << 30

  /** Id-path chooser: forced, or the optimizer's size estimate exceeds the
    * threshold. `optimizedPlan.stats` is a plan-time UPPER bound — without
    * CBO a Filter passes its child's sizeInBytes through, so a small
    * windowed batch over a huge source still reads as huge and
    * auto-distributes. That errs in the SAFE direction (the distributed
    * path costs one extra pass; the single-window path risks one task
    * sorting an unbounded batch), and needs no extra Spark job. */
  private[cdc] def shouldDistribute(batch: DataFrame, forced: Boolean, thresholdBytes: Long): Boolean =
    forced || batch.queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(thresholdBytes)

  /** Build + id-assign + stamp + append one batch of feed rows; returns the
    * appended row count. Shared by the batch orchestrator and the streaming
    * foreachBatch sink. The row count rides on the write itself via
    * `observe` — no re-evaluation and, critically, no O(history) rescan of
    * the sink (the reference re-counts the whole changelog, :397-399).
    *
    * @param distributedIds force the distributed id path; when false the
    *        path still auto-upgrades above `autoDistributeBytes`
    */
  def stampAndAppend(
      spark: SparkSession,
      batch: DataFrame,
      cfg: CdcTableConfig,
      changelogPath: String,
      offset: Long,
      distributedIds: Boolean = false,
      clusterByKey: Boolean = false,
      clusterPartitions: Option[Int] = None,
      autoDistributeBytes: Long = AutoDistributeBytes): Long = {
    val obs = org.apache.spark.sql.Observation()
    val changelog = ChangelogBuilder.build(batch, cfg)
    val withIds =
      if (shouldDistribute(batch, distributedIds, autoDistributeBytes))
        ChangelogBuilder.withIdsDistributed(changelog, cfg, offset)
      else ChangelogBuilder.withIds(changelog, cfg, offset)
    val stamped = withIds
      .withColumn("created_dt", current_timestamp())
      .withColumn("created_by", lit(spark.sparkContext.sparkUser))
      // the reference DECLARES modified_dt/modified_by and never writes
      // them (usp_cdc_populate_changelog.sql:153-154 — rows are append-only,
      // nothing updates); carried as typed NULLs for schema fidelity so a
      // consumer migrating off the reference sees the same column set
      .withColumn("modified_dt", lit(null).cast("timestamp"))
      .withColumn("modified_by", lit(null).cast("string"))
      .withColumn("commit_date", to_date(col("commit_time")))
      .observe(obs, count(lit(1)).as("n"))
    // clusterByKey: range-shuffle on (partition col, pk) + sort within
    // tasks, so each parquet file inside a commit_date partition covers a
    // DISJOINT pk range — point/range lookups on the key then prune to one
    // file via parquet min/max stats instead of reading the whole
    // partition. Costs one extra exchange per batch; worth it for sinks
    // that serve key-targeted reads at scale.
    val arranged =
      // default: repartition on the PARTITION column so each task owns
      // whole commit_date partitions — the id stage's single-partition
      // window would otherwise hand the writer ONE task serially creating
      // every date directory (a day-spanning backfill writes hundreds),
      // and a distributed-id batch would instead scatter every date
      // across every task (dates × tasks small files). One hash exchange
      // per batch buys a parallel write with one file per partition per
      // batch; AQE coalesces when the batch only spans a few dates.
      if (!clusterByKey) stamped.repartition(col("commit_date"))
      else {
        val cluster = col("commit_date") +: cfg.keyCols.map(col)
        // an explicit partition count pins the file count (AQE would
        // coalesce a small batch's range shuffle to one file); None lets
        // the planner size it from the data
        val ranged = clusterPartitions
          .map(n => stamped.repartitionByRange(n, cluster: _*))
          .getOrElse(stamped.repartitionByRange(cluster: _*))
        ranged.sortWithinPartitions(cluster: _*)
      }
    arranged.write
      .mode(SaveMode.Append)
      .partitionBy("commit_date")
      // append into the CURRENT version dir (sink root until the first
      // compaction) — the same copy sinkState read the HWM/offset from
      .parquet(SinkLayout.dataDir(spark, changelogPath))
    obs.get("n").asInstanceOf[Long]
  }

  def run(
      spark: SparkSession,
      feed: DataFrame,
      cfg0: CdcTableConfig,
      changelogPath: String,
      toDate: Option[Timestamp] = None,
      distributedIds: Boolean = false,
      clusterByKey: Boolean = false,
      clusterPartitions: Option[Int] = None,
      autoDistributeBytes: Long = AutoDistributeBytes): PopulateResult = {

    // ≙ RTRIM(LTRIM(@tableName/@tablePK)) (:77-80) — P5 param normalization
    val cfg = cfg0.copy(
      tableName = cfg0.tableName.trim,
      keyCols = cfg0.keyCols.map(_.trim))

    // ONE sink snapshot drives both the window HWM and the id offset — they
    // can never disagree, and the sink is aggregated once per batch.
    val sink = Checkpoint.sinkState(spark, changelogPath)
    val window = Checkpoint.computeWindow(feed, sink, toDate, cfg.compatMode)
    val offset = sink.map(_._2).getOrElse(0L)
    // The builder references the windowed feed from four sub-trees (before/
    // after/delete/insert); caching evaluates the window scan once
    // (SURVEY §7.5.8) instead of four times.
    val windowed = Checkpoint.applyWindow(feed, window).cache()

    val result = Try(stampAndAppend(spark, windowed, cfg, changelogPath, offset,
      distributedIds, clusterByKey, clusterPartitions, autoDistributeBytes))
    windowed.unpersist()

    result match {
      case Success(n) =>
        PopulateResult(n, s"$n ${cfg.tableName} changes were inserted to the ${cfg.tableName}_changelog.")
      case Failure(e: CdcValidationException) => throw e
      case Failure(e) if cfg.compatMode =>
        // ≙ the reference's CATCH block soft success (:401-409). Swallowing a
        // failed WRITE as "no changes" masks data loss, so it is compatMode-
        // only; default mode rethrows. Unlike the reference (a known pain
        // point, :235-239) the cause is logged.
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"populate ${cfg.tableName} failed", e)
        PopulateResult(0, s"No ${cfg.tableName} changes were detected between the date ranges provided!")
      case Failure(e) => throw e
    }
  }
}
