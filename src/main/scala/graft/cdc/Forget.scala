package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

final case class ForgetStats(rowsBefore: Long, rowsDropped: Long)

/** Subject deletion ("right to be forgotten") for a changelog sink: every
  * row whose key matches the forget set is removed from the CURRENT sink
  * version, across every date partition, and the filtered copy is
  * published through the same versioned staged swap as compaction —
  * reader-safe (in-flight readers keep the superseded version for one
  * grace cycle), crash-safe (nothing is visible until the single
  * stage→data rename), and idempotent (a re-run stages afresh).
  *
  * This is the row-level complement of [[Retention]]'s time-based
  * partition sweeps: compliance deletion is keyed on subject IDENTITY and
  * cuts across time, so it must rewrite, not drop partitions. Surviving
  * rows keep their changelog ids UNCHANGED — id stability across sink
  * maintenance is the resume/state contract (`cdc_state_after_retention`
  * proves it for retention; `cdc_forget_keys` grades it here), so a state
  * fold or HWM resume continues over the rewritten sink with no seam.
  *
  * Scale shape: one filtered scan of the live version; the forget set
  * broadcasts (a deletion request batch is small by nature) into a
  * LEFT ANTI join, and the rewrite re-partitions by `commit_date` so each
  * date directory is written by the tasks owning its data (the
  * partitioned-append pattern — never one task per date).
  */
object Forget {

  def forgetKeys(
      spark: SparkSession,
      path: String,
      keyCols: Seq[String],
      forgetSet: DataFrame): ForgetStats =
    SinkLayout.writerLock(path).synchronized {
      val fs = SinkLayout.fs(spark, path)
      val cur = SinkLayout.currentVersion(fs, path)
      val next = cur.getOrElse(0) + 1
      val stage = new Path(SinkLayout.stageDir(path, next))
      val nextDir = new Path(SinkLayout.versionDir(path, next))
      // leftovers of a crashed earlier attempt go first
      fs.delete(stage, true)
      fs.delete(nextDir, true)

      val live = spark.read.parquet(SinkLayout.dataDir(spark, path))
      val before = live.count()
      val kept = live.join(broadcast(forgetSet.select(keyCols.map(col): _*).distinct()),
        keyCols, "left_anti")
      kept
        .repartition(col("commit_date"))
        .write.partitionBy("commit_date").parquet(stage.toString)
      if (cur.isEmpty) SinkLayout.recordFlatMigration(fs, path, next)
      SinkLayout.publish(fs, path, next)
      SinkLayout.retire(fs, path, next)
      val after = spark.read.parquet(SinkLayout.dataDir(spark, path)).count()
      ForgetStats(before, before - after)
    }
}
