package graft.cdc

import java.time.LocalDate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Changelog retention — the parquet restatement of SQL Server's
  * `sys.sp_cdc_cleanup_change_table` (the cleanup job every CDC deployment
  * runs next to the capture job; the reference's changelog otherwise grows
  * forever).
  *
  * The sweep is PARTITION-LEVEL ONLY: `commit_date=<d>` directories
  * strictly older than the cutoff are dropped; the boundary day is always
  * retained whole. The cutoff therefore truncates DOWN to day granularity —
  * deliberately the same day-granularity contract usp_cdc_query_data
  * applies to its time bounds (:52-57), and deliberately NEVER a row-level
  * rewrite: at 100 TB a retention pass that rewrites data is a compaction
  * in disguise, while a directory drop is O(partitions) metadata work.
  * Surviving rows keep their changelog_ids untouched (ids are assigned at
  * append and never reassigned), so downstream id-based consumers —
  * incremental state folds keyed on last_change_id, SCD2 id bounds — are
  * unaffected.
  *
  * Resolution goes through [[SinkLayout.dataDir]], so retention works the
  * same on flat and compacted (versioned) sinks. Dropping a partition out
  * from under a reader that PLANNED before the sweep fails that reader —
  * like every partition-drop in a non-transactional table format; run it
  * from the sink's single writer like populate/compaction.
  */
object Retention {

  /** Drop all `commit_date` partitions strictly before `cutoff`'s day.
    * Returns the dropped partition dates. */
  def expire(spark: SparkSession, path: String, cutoff: LocalDate): Seq[LocalDate] = {
    val fs = SinkLayout.fs(spark, path)
    val dataDir = new Path(SinkLayout.dataDir(spark, path))
    if (!fs.exists(dataDir)) return Nil
    val PartRe = "commit_date=(\\d{4}-\\d{2}-\\d{2})".r
    fs.listStatus(dataDir).toSeq
      .flatMap(st => st.getPath.getName match {
        case PartRe(d) => Some((st.getPath, LocalDate.parse(d)))
        case _ => None
      })
      .filter(_._2.isBefore(cutoff))
      .map { case (p, d) => fs.delete(p, true); d }
      .sorted
  }
}
