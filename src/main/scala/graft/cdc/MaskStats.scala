package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cdc.ChangeFeed.OpUpdateAfter

/** Per-column change-frequency statistics from the update masks — the
  * schema-drift / hot-column audit a CDC operator runs before deciding
  * what to index, what to compact, and which columns a downstream consumer
  * can skip. The `__$update_mask` (usp_cdc_populate_changelog.sql:305)
  * already encodes "which columns did this transaction touch"; this
  * aggregates it per column without building the changelog at all.
  *
  * Shape at scale: one scan of the update-after rows, one explode bounded
  * by the column count (only SET bits survive the filter), then two
  * key-partitioned hash aggregates — (column, key) pre-reduce, then
  * column — so the distinct-key count never needs a count-distinct Expand
  * over the raw feed. Works for both mask encodings via
  * [[ChangelogBuilder.maskBitSet]] (LongType fast path, BinaryType codegen
  * for >64-column tables).
  */
object MaskStats {

  /** (column_name, n_updates, n_keys) per payload column: how many update
    * transactions touched the column, over how many distinct keys. Columns
    * never touched report zeros (the audit's point is seeing them). */
  def perColumn(feed: DataFrame, cfg: CdcTableConfig): DataFrame = {
    val srcCols = ChangeFeed.sourceCols(feed)
    val maskType = feed.schema("update_mask").dataType
    val key = concat_ws("", cfg.keyCols.map(col(_).cast("string")): _*)
    val touched = feed.where(col("operation") === OpUpdateAfter)
      .select(key.as("__key"), explode(array(srcCols.zipWithIndex.map { case (c, i) =>
        when(ChangelogBuilder.maskBitSet(i, maskType), lit(c))
      }: _*)).as("column_name"))
      .where(col("column_name").isNotNull)
    val perKey = touched.groupBy("column_name", "__key")
      .agg(count(lit(1)).as("n"))
    val stats = perKey.groupBy("column_name")
      .agg(sum(col("n")).cast("long").as("n_updates"),
        count(lit(1)).as("n_keys"))
    // zero rows for never-touched columns, so the output enumerates the
    // full schema (broadcast of a literal column list, no second scan)
    val allCols = feed.sparkSession.createDataFrame(
      srcCols.map(Tuple1(_))).toDF("column_name")
    allCols.join(stats, Seq("column_name"), "left")
      .select(col("column_name"),
        coalesce(col("n_updates"), lit(0L)).as("n_updates"),
        coalesce(col("n_keys"), lit(0L)).as("n_keys"))
  }
}
