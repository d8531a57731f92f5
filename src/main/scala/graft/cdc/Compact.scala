package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

final case class CompactStats(filesBefore: Long, filesAfter: Long, bytesBefore: Long)

/** Small-file compaction for an append-mode changelog sink.
  *
  * Every populate batch / streaming trigger appends its own parquet files
  * (one per write task), so a long-running CDC sink accumulates files at
  * O(batches × tasks) — at 100 TB the FILE COUNT, not the byte count,
  * becomes the scan bottleneck: driver-side listing, per-file task
  * scheduling, and row-group overhead all scale with it. The reference
  * never faces this (SQL Server owns its pages); a parquet-backed sink
  * must re-pack periodically.
  *
  * Strategy: one global `repartitionByRange` on (commit_date, changelog_id)
  * sized to `targetBytes` chunks — each output file covers a contiguous id
  * range inside one date partition, so per-date file counts stay
  * proportional to per-date data (no single-task-per-date funnel) and the
  * id-ordered layout gives parquet min/max stats that prune id- and
  * time-range reads to single files. The rewrite lands in a sibling temp
  * dir first; the swap (delete + rename) is NOT transactional — run it in
  * the populate maintenance window, like any parquet-table rewrite without
  * a transaction log.
  */
object Compact {

  val DefaultTargetBytes: Long = 128L << 20

  private def dataFiles(spark: SparkSession, dir: Path): Seq[(Path, Long)] = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return Nil
    val it = fs.listFiles(dir, true)
    val out = Seq.newBuilder[(Path, Long)]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".") && name.endsWith(".parquet"))
        out += ((f.getPath, f.getLen))
    }
    out.result()
  }

  /** Re-pack `path` (a commit_date-partitioned changelog sink) into
    * ~`targetBytes` files, preserving rows exactly. Returns before/after
    * file counts for observability. */
  def compactSink(
      spark: SparkSession,
      path: String,
      targetBytes: Long = DefaultTargetBytes): CompactStats = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = dataFiles(spark, dir)
    val bytes = before.map(_._2).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt

    val tmp = new Path(dir.getParent, dir.getName + ".compact.tmp")
    fs.delete(tmp, true)
    spark.read.parquet(path)
      .repartitionByRange(n, col("commit_date"), col("changelog_id"))
      .sortWithinPartitions(col("commit_date"), col("changelog_id"))
      .write.partitionBy("commit_date").parquet(tmp.toString)

    // swap via backup so no step ever leaves the sink path as the ONLY
    // copy destroyed: live -> .bak, tmp -> live, then drop .bak. A crash
    // between the renames leaves the data intact in .bak (manual restore),
    // never gone.
    val bak = new Path(dir.getParent, dir.getName + ".compact.bak")
    fs.delete(bak, true)
    require(fs.rename(dir, bak), s"rename $dir -> $bak failed")
    if (!fs.rename(tmp, dir)) {
      fs.rename(bak, dir) // roll back; the original sink is untouched
      throw new IllegalStateException(s"rename $tmp -> $dir failed; sink restored")
    }
    fs.delete(bak, true)
    CompactStats(before.size.toLong, dataFiles(spark, dir).size.toLong, bytes)
  }
}
