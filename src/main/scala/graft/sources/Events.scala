package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture-schema adapter for the `events` stream table.
  *
  * The driver's fixture has shipped `ts` under two parquet encodings across
  * rounds: TIMESTAMP(NANOS) — which Spark 4 only reads under
  * `spark.sql.legacy.parquet.nanosAsLong=true`, surfacing as a nanos
  * LongType — and TIMESTAMP(MICROS), which reads natively as
  * TIMESTAMP_NTZ. All downstream code (epoch-second derivations
  * `ts div 1000000000`, streaming event-time `timestamp_micros(ts div
  * 1000)`) is written against the nanos-long contract, and the DuckDB
  * oracles read the SAME files via `epoch_ns(ts) // 1000000000` — which is
  * encoding-independent. [[normalize]] upgrades either encoding to the
  * nanos-long contract so both engines stay bit-aligned whichever fixture
  * vintage is mounted.
  */
object Events {

  /** Rewrite `ts` to epoch NANOS (LongType) whatever its source encoding.
    * Pure column expressions — works on streaming frames too. The session
    * runs in UTC, so an NTZ wall-clock equals its instant and the cast to
    * TIMESTAMP shifts nothing. */
  def normalize(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df
    case TimestampNTZType | TimestampType =>
      df.withColumn("ts", expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000"))
    case other =>
      throw new IllegalArgumentException(s"unsupported events.ts encoding: $other")
  }

  /** Batch-read the fixture with `ts` normalized to epoch nanos. The
    * legacy nanos flag is set (session-wide — it is consulted at execution
    * as well as planning, so it cannot be scoped to one read) for the
    * NANOS-vintage fixture; it is a no-op on the MICROS vintage.
    *
    * @note the flag is never restored: after any `read`, EVERY later
    *       TIMESTAMP(NANOS) parquet read in the same session surfaces as
    *       LongType. Harmless for the fixture tables (none are
    *       NANOS-encoded except events itself), but ad-hoc sessions
    *       reading other NANOS parquet after calling this will see longs
    *       where they expected timestamps. */
  def read(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalize(s.read.parquet(s"$dir/events.parquet"))
  }
}
