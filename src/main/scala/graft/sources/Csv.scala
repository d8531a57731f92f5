package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink — the other text interchange format a corpus pipeline
  * meets (spreadsheet exports, DB dumps, eval-set deliveries). Same
  * scale-first contract as [[JsonLines]]: explicit schema (no inference
  * pass), FAILFAST (a malformed line fails the shard instead of becoming
  * silent NULLs), newline-delimited so files split by byte range.
  *
  * Quoting is pinned EXPLICITLY on both write and read (RFC 4180 style:
  * `"` quotes, doubled-quote escape) rather than trusting defaults —
  * Spark's default ESCAPE is backslash, which round-trips through Spark
  * but surprises every external RFC-4180 consumer; fields with the
  * delimiter, quotes, or leading/trailing spaces survive either way and
  * `ext_csv_roundtrip` grades the fingerprints after a write+read against
  * the direct-read oracle.
  *
  * Embedded NEWLINES are the one CSV feature deliberately not supported:
  * reading them needs `multiLine`, which forces one-file-one-task parsing
  * — the scale price is wrong, and JSONL ([[JsonLines]]) is the right
  * format for newline-bearing text.
  */
object Csv {

  private val opts = Map(
    "header" -> "false",
    "sep" -> ",",
    "quote" -> "\"",
    "escape" -> "\"", // RFC 4180 doubled quotes, not backslash
    // a distinct token, because CSV cannot express NULL-vs-empty any
    // other way; a field whose real text equals the token is the one
    // (documented) ambiguity inherent to the format
    "nullValue" -> "NULL",
    // Spark's WRITER trims field whitespace by default (the reader does
    // not) - edge spaces would be silently lost on the way out
    "ignoreLeadingWhiteSpace" -> "false",
    "ignoreTrailingWhiteSpace" -> "false",
    "mode" -> "FAILFAST")

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").options(opts).csv(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).options(opts).csv(path)

  /** Export to CSV and read back with the frame's own schema. */
  def roundTrip(df: DataFrame, path: String): DataFrame = {
    write(df, path)
    read(df.sparkSession, path, df.schema)
  }
}
