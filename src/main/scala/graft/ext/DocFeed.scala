package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Derived document corpus for the dedup/text-analysis operators (E1/E3).
  *
  * The driver fixture `documents.parquet` contains zero exact-duplicate
  * texts (verified at every SF), so deduplication over it would be vacuous.
  * Like the CDC feed (ChangeFeed.fromOrders), we derive a corpus with known
  * duplicates as a pure deterministic function of the fixture, mirrored
  * 1:1 by the DuckDB oracle (ExtOracle.corpusSql):
  *
  *   - every base document, unchanged;
  *   - `doc_id % 10 == 0` → an EXACT duplicate (same text, new id + source);
  *   - `doc_id % 10 == 1` → a NEAR duplicate (two tokens appended).
  */
object DocFeed {

  val ExactDupOffset = 1000000L
  val NearDupOffset = 2000000L

  def withDups(documents: DataFrame): DataFrame = {
    val base = documents.select("doc_id", "text", "lang", "source", "n_chars")
    val exact = documents.where(col("doc_id") % 10 === 0).select(
      (col("doc_id") + lit(ExactDupOffset)).as("doc_id"),
      col("text"), col("lang"), lit("dup_exact").as("source"), col("n_chars"))
    val near = documents.where(col("doc_id") % 10 === 1).select(
      (col("doc_id") + lit(NearDupOffset)).as("doc_id"),
      concat(col("text"), lit(" qq zz")).as("text"),
      col("lang"), lit("dup_near").as("source"),
      (col("n_chars") + lit(6L)).as("n_chars"))
    base.unionByName(exact).unionByName(near)
  }
}
