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

  def run(
      spark: SparkSession,
      feed: DataFrame,
      cfg: CdcTableConfig,
      changelogPath: String,
      toDate: Option[Timestamp] = None,
      distributedIds: Boolean = false): PopulateResult = {

    val window = Checkpoint.computeWindow(spark, feed, changelogPath, toDate, cfg.compatMode)
    val offset = Checkpoint.sinkState(spark, changelogPath).map(_._2).getOrElse(0L)
    val windowed = Checkpoint.applyWindow(feed, window)

    val result = Try {
      val changelog = ChangelogBuilder.build(windowed, cfg)
      val withIds =
        if (distributedIds) ChangelogBuilder.withIdsDistributed(changelog, cfg, offset)
        else ChangelogBuilder.withIds(changelog, cfg, offset)
      val stamped = withIds
        .withColumn("created_dt", current_timestamp())
        .withColumn("created_by", lit(spark.sparkContext.sparkUser))
        .withColumn("commit_date", to_date(col("commit_time")))
      stamped.write
        .mode(SaveMode.Append)
        .partitionBy("commit_date")
        .parquet(changelogPath)
      // count from the sink delta would re-scan; the batch plan is cheap to
      // re-evaluate at fixture scale, and `observe` is the scale path.
      spark.read.parquet(changelogPath)
        .where(col("changelog_id") > offset).count()
    }

    result match {
      case Success(n) =>
        PopulateResult(n, s"$n ${cfg.tableName} changes were inserted to the ${cfg.tableName}_changelog.")
      case Failure(e: CdcValidationException) => throw e
      case Failure(e) =>
        // ≙ the reference's CATCH block soft success (:401-409) — swallow,
        // but (unlike the reference, a known pain point :235-239) log cause.
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"populate ${cfg.tableName} failed", e)
        PopulateResult(0, s"No ${cfg.tableName} changes were detected between the date ranges provided!")
    }
  }
}
