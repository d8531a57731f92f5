package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}

/** The shared control-plane edge of the in-place partitioned-layout folds
  * ([[Similarity.ivfServingFold]], [[Similarity.ivfPqServingFold]],
  * [[Retrieval.bm25ServingFold]]). */
object ServingLayout {

  /** Sweep partitions a fold EMPTIED: dynamic partition overwrite cannot
    * delete a partition (zero written rows leave the stale directory on
    * disk, and its rows would silently survive the fold), so the emptied
    * set is removed with explicit directory deletes. Both collects are
    * bounded by the layout's partition-value cardinality (cells /
    * buckets — a model or layout CONSTANT, never data-sized) after the
    * distinct: the cdc_query_dpp control-plane-scalar justification. */
  /** Partition-local small-file repack for the in-place serving layouts.
    *
    * The FOLDS themselves never fragment a partition — dynamic partition
    * overwrite REPLACES each affected partition's content wholly, and the
    * `repartition(col(partCol))` before the write lands every partition
    * value in one task, so a folded partition holds one file. What does
    * fragment a layout: multi-task partition writes (an AQE skew split of
    * a hot cell, parallel range-sliced builders racing appends into the
    * same layout, any external append-mode writer). This repack
    * normalizes such a layout: every CROWDED partition (more than
    * `maxFiles` data files) is rewritten through the folds' own primitive
    * — read the crowded partitions (a static partition-pruned scan),
    * materialize off-path (the overwrite-a-read-path barrier), dynamic-
    * partition-overwrite them back — so content is bit-identical,
    * untouched partitions keep their bytes on disk, and a torn rewrite
    * replays to the same state (the folds' determinism contract; a
    * re-run that finds nothing crowded is a no-op). Reader isolation is
    * the fold's own trade: fold-aware readers re-resolve per query;
    * long-running readers take compactions through
    * [[graft.streaming.StateStream.foldIsolatedGen]] like any other
    * fold. The crowded-partition listing is control-plane — bounded by
    * the layout's partition-value cardinality (cells / buckets, model or
    * layout constants). */
  def compact(spark: SparkSession, path: String, partCol: String,
      schema: StructType, maxFiles: Int = 1): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val crowded = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$partCol="))
      .filter { st =>
        fs.listStatus(st.getPath).count { f =>
          val n = f.getPath.getName
          f.isFile && !n.startsWith("_") && !n.startsWith(".")
        } > maxFiles
      }
      .map(_.getPath.getName.stripPrefix(s"$partCol=").toLong)
    if (crowded.isEmpty) return
    // explicit layout schema, like every fold's registry read: the one
    // read here must never depend on footer inference (the footer-less
    // emptied-directory lesson), and the typed literal set below prunes
    // statically against the DECLARED partition-column type
    val repacked = spark.read.schema(schema).parquet(path)
      .where(partitionIn(col(partCol), schema(partCol).dataType, crowded))
      .repartition(col(partCol))
      .localCheckpoint(true) // barrier: bytes leave the path being rewritten
    repacked.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(path)
  }

  /** Collect a fold's affected-partition frame to a LITERAL value set.
    * Bounded by the layout's partition-value cardinality (cells /
    * buckets — model or layout CONSTANTS, never data-sized): the
    * control-plane scalar that serves the fold twice — as the STATIC
    * partition filter on the replacement read (via [[partitionIn]]; a
    * fold must never scan the layout it maintains — the semi-join form
    * read every partition and filtered post-scan) and as the emptied-
    * partition sweep set. The cdc_query_dpp literal-threshold
    * justification, written once here for every fold. */
  private[graft] def affectedValues(affected: DataFrame): Seq[Long] =
    affected.distinct().collect().map { r =>
      require(!r.isNullAt(0),
        "affectedValues: NULL partition value in a fold's affected set — " +
          "the layout or the fold input is malformed (partition keys are " +
          "derived, never nullable)")
      r.get(0) match {
        // ONLY the integral boxes: a boxed Double/Float/BigDecimal must
        // hit the rejection below, never silently truncate through a
        // generic Number.longValue (1.5 → 1L would mis-prune the fold)
        case n: java.lang.Long => n.longValue()
        case n: java.lang.Integer => n.longValue()
        case n: java.lang.Short => n.longValue()
        case n: java.lang.Byte => n.longValue()
        case other => throw new IllegalArgumentException(
          s"affectedValues: non-integral partition value '$other' " +
            s"(${other.getClass.getName}) — serving-layout partition " +
            "columns are integral by contract")
      }
    }.toSeq.sorted

  /** `partCol IN (values)` typed to the layout's partition-column type
    * (directory-name inference yields IntegerType for small values; a
    * mistyped literal set would cast the partition ATTRIBUTE and risk
    * losing static pruning). Empty set → `false` (a no-op fold reads
    * nothing). */
  private[graft] def partitionIn(c: Column, dt: DataType, vs: Seq[Long]): Column =
    if (vs.isEmpty) lit(false)
    else dt match {
      case IntegerType => c.isin(vs.map(_.toInt): _*)
      case LongType => c.isin(vs: _*)
      case other => throw new IllegalArgumentException(
        s"partitionIn: unsupported partition-column type $other — add an " +
          "explicit literal-typed branch; falling through would cast the " +
          "partition ATTRIBUTE and silently lose the static pruning this " +
          "helper exists to guarantee")
    }

  private[graft] def sweepEmptied(
      spark: SparkSession, path: String, partCol: String,
      affected: Seq[Long], written: DataFrame): Unit = {
    val present = written.select(partCol).distinct().collect()
      .map(_.get(0).toString.toLong).toSet
    val emptied = affected.filterNot(present)
    if (emptied.nonEmpty) {
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach(v =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"$partCol=$v"), true))
    }
  }
}
