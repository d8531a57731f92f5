package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink — the other columnar container a lakehouse pipeline
  * meets beside parquet (Hive-era warehouses, Trino/Presto exports). The
  * format carries its own schema, but the read still PINS one explicitly
  * (the [[JsonLines]]/[[Csv]] contract): a file written with a drifted
  * schema fails loudly at analysis instead of surfacing as silent NULL
  * columns mid-pipeline.
  *
  * Scale notes: ORC is splittable by stripe and carries per-stripe min/max
  * indexes, so filter pushdown and partition-parallel scans work exactly
  * as with parquet (Spark's native vectorized reader handles both);
  * `ext_orc_roundtrip` grades byte-losslessness through the format for
  * strings, BINARY media payloads, and a nested metadata struct — the
  * types a multimodal corpus actually ships.
  */
object Orc {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Export to ORC and read back with the frame's own schema. */
  def roundTrip(df: DataFrame, path: String): DataFrame = {
    write(df, path)
    read(df.sparkSession, path, df.schema)
  }
}
