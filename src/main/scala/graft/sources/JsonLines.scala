package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the de-facto interchange format for LLM
  * training corpora (one JSON object per line: CommonCrawl derivatives,
  * HuggingFace dumps, most public text datasets ship this way). The
  * reference engine's surface is parquet-only; a corpus pipeline needs the
  * text-format bridge too, and it needs it with scale-safe defaults.
  *
  * Read contract, chosen for 100 TB not convenience:
  *  - EXPLICIT schema, always. Schema inference is a full extra pass over
  *    the data before the real read — a doubled scan at corpus scale, and
  *    nondeterministic under drifting shards. Callers pass the schema they
  *    expect (usually a parquet stage's own `df.schema`).
  *  - FAILFAST mode. The PERMISSIVE default turns a corrupt line into a
  *    row of NULLs, silently — a data bug becomes a training bug. Failing
  *    the task surfaces the bad shard instead.
  *  - No `multiLine`. JSONL is newline-delimited, so Spark splits files
  *    by byte range and parallelizes within a file like any text source;
  *    multiLine JSON forces one-file-one-record-one-task.
  *
  * Losslessness of the round-trip is GRADED, not assumed: the
  * `ext_jsonl_roundtrip` query re-fingerprints the corpus after a
  * write+read through this module against the same DuckDB oracle as the
  * direct parquet read (`fp_doc` is an md5 of the text — one escaped
  * newline or mangled unicode point and the hashes diverge).
  */
object JsonLines {

  /** Write `df` as JSON-Lines under `path` (one object per line, one file
    * per partition — the layout every external JSONL consumer expects). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read JSON-Lines under `path` with an explicit expected `schema` —
    * FAILFAST on malformed lines, no inference pass. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Export `df` to JSONL at `path` and read it back with `df`'s own
    * schema — the stage boundary a mixed-format pipeline crosses when a
    * tool in the middle only speaks text. */
  def roundTrip(df: DataFrame, path: String): DataFrame = {
    write(df, path)
    read(df.sparkSession, path, df.schema)
  }
}
