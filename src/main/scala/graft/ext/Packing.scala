package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assigning documents to fixed-size context windows
  * ("bins") ahead of tokenized training — plus the deterministic
  * hash-split that precedes it in a training-data pipeline.
  *
  * Packing here is CONTIGUOUS-FILL: docs are laid out in a deterministic
  * order (doc_id) per partition key and a doc belongs to the bin where its
  * first token lands (`bin = tokens-before div binTokens`) — a bin can
  * therefore overflow by at most one doc's tokens, which is how streaming
  * packers behave. Unlike first-fit-decreasing this needs no sequential
  * state: one partitioned running sum + integer division, so it scales
  * like any windowed aggregation (partitioned by source shard).
  */
object Packing {

  /** Per-(source, bin) packing summary: docs, packed tokens, fill in
    * basis points of `binTokens`. */
  def packBins(
      corpus: DataFrame,
      binTokens: Int = 512,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    corpus
      .select(col("source"), col(idCol), size(split(col(textCol), " ")).as("n_tokens"))
      .withColumn("__before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", expr(s"__before div $binTokens"))
      .groupBy("source", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens_packed"))
      .withColumn("fill_bp", expr(s"n_tokens_packed * 10000 div $binTokens"))
  }

  /** Deterministic hash split (train/val/test by content hash, the
    * standard leakage-proof split): bucket = first 4 md5 hex chars mod
    * 100 → 98/1/1. Engine-portable: Spark `conv(h,16,10)` ≙ DuckDB
    * `('0x'||h)::BIGINT`. */
  def hashSplit(
      corpus: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val bucket = (conv(substring(md5(col(textCol).cast("binary")), 1, 4), 16, 10)
      .cast("long") % 100).as("bucket")
    corpus
      .select(col(idCol), size(split(col(textCol), " ")).as("n_tokens"), bucket)
      .withColumn("split",
        when(col("bucket") < 98, lit("train"))
          .when(col("bucket") < 99, lit("val"))
          .otherwise(lit("test")))
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"))
  }
}
