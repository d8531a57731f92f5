package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-window bookkeeping.
  *
  * The reference uses the changelog itself as the checkpoint store: resume
  * point = MAX(commit_time) on the sink, else the feed's minimum LSN time on
  * first run (usp_cdc_populate_changelog.sql:200-211). The infamous quirk:
  * compat resume = max + 1 MINUTE (:203), permanently skipping changes
  * committed within that minute; default mode is lossless (strictly-greater
  * predicate on the exact max) — SURVEY §7.5.3.
  */
object Checkpoint {

  final case class Window(
      fromTime: Option[Timestamp], // None = first run (take everything from feed min)
      toTime: Timestamp,
      fromExclusive: Boolean) // true = lossless `>`; compat +1min uses `>=` of the shifted point

  /** High-water mark + max assigned id from the sink, if it exists and is
    * non-empty. One aggregate scan ≙ :200-211 + identity continuation.
    * The filesystem is resolved from the path's own scheme (s3a://, hdfs://)
    * rather than the default FS, and emptiness is answered by the same
    * aggregate job that reads the HWM (count=0 ⇒ empty) — one job, not two. */
  def sinkState(spark: SparkSession, changelogPath: String): Option[(Timestamp, Long)] = {
    val p = new org.apache.hadoop.fs.Path(changelogPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    try {
      // resolve through the version pointer: after a compaction the HWM
      // and id offset must come from the CURRENT data copy
      val row = SinkLayout.read(spark, changelogPath)
        .agg(max("commit_time"), max("changelog_id"), count(lit(1))).head()
      if (row.getLong(2) == 0L) None
      else Some((row.getTimestamp(0), row.getLong(1)))
    } catch {
      // A directory left behind by a failed/aborted first write contains no
      // data files; treat it as a first run instead of wedging the table.
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => None
    }
  }

  /** Compute the batch window ≙ :192-253.
    * @param sink    the sink snapshot from ONE [[sinkState]] call — callers
    *                reuse the same snapshot for the id offset so the HWM and
    *                offset can never disagree
    * @param toDate  ≙ @to_date, default GETDATE() (:192)
    * @param compatMode reproduce the +1-minute skip (:203) */
  def computeWindow(
      feed: DataFrame,
      sink: Option[(Timestamp, Long)],
      toDate: Option[Timestamp],
      compatMode: Boolean): Window = {
    val to = toDate.getOrElse(new Timestamp(System.currentTimeMillis()))

    // :225-229 — @to_date before the first captured change is a hard error.
    // Checked AFTER the checkpoint check below, in the reference's order.
    def checkMinLsn(): Unit = {
      val minLsnTime = Option(feed.agg(min("commit_time")).head().getTimestamp(0))
        .getOrElse(throw CdcErrors.toDateBeforeMinLsn(to.toString, "<empty feed>"))
      if (to.before(minLsnTime))
        throw CdcErrors.toDateBeforeMinLsn(to.toString, minLsnTime.toString)
    }

    sink match {
      case Some((hwm, _)) =>
        val from = if (compatMode) new Timestamp(hwm.getTime + 60000L) else hwm
        // :217-223 — window must move forward (this check precedes :225-229)
        if (to.before(from)) throw CdcErrors.toDateBeforeCheckpoint(to.toString, from.toString)
        checkMinLsn()
        Window(Some(from), to, fromExclusive = !compatMode)
      case None =>
        // first run: everything from the feed's min commit time (:207-209,
        // 'smallest greater than or equal' boundary mode :248-251)
        checkMinLsn()
        Window(None, to, fromExclusive = false)
    }
  }

  /** Apply the window to the feed ≙ the TVF's (from_lsn, to_lsn] args
    * (:319,:352,:373,:384). Upper bound inclusive of the mapped to-instant,
    * mirroring 'largest less than or equal' (:241). */
  def applyWindow(feed: DataFrame, w: Window): DataFrame = {
    val upper = col("commit_time") <= lit(w.toTime)
    w.fromTime match {
      case None => feed.where(upper)
      case Some(f) =>
        val lower =
          if (w.fromExclusive) col("commit_time") > lit(f)
          else col("commit_time") >= lit(f)
        feed.where(lower && upper)
    }
  }
}
