package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The shared control-plane edge of the in-place partitioned-layout folds
  * ([[Similarity.ivfServingFold]], [[Similarity.ivfPqServingFold]],
  * [[Retrieval.bm25ServingFold]]). */
private[ext] object ServingLayout {

  /** Sweep partitions a fold EMPTIED: dynamic partition overwrite cannot
    * delete a partition (zero written rows leave the stale directory on
    * disk, and its rows would silently survive the fold), so the emptied
    * set is removed with explicit directory deletes. Both collects are
    * bounded by the layout's partition-value cardinality (cells /
    * buckets — a model or layout CONSTANT, never data-sized) after the
    * distinct: the cdc_query_dpp control-plane-scalar justification. */
  def sweepEmptied(
      spark: SparkSession, path: String, partCol: String,
      affected: DataFrame, written: DataFrame): Unit = {
    val present = written.select(partCol).distinct().collect()
      .map(_.get(0).toString.toLong).toSet
    val emptied = affected.collect().map(_.get(0).toString.toLong)
      .filterNot(present)
    if (emptied.nonEmpty) {
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach(v =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"$partCol=$v"), true))
    }
  }
}
