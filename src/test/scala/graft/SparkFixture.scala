package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local session for the whole suite (ScalaTest runs suites in
  * one forked JVM; re-creating sessions per suite is the slow path). */
trait SparkFixture {
  lazy val spark: SparkSession = SparkFixture.session

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Hand-built CDC feed with a single key column `k` and one payload
    * column `v` (mask ordinals: k=0, v=1). */
  def feedKV(rows: Seq[(Long, Long, Int, Long, String, String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (lsn, seq, op, mask, t, k, v) => (lsn, seq, op, mask, ts(t), k, v) }
      .toDF("start_lsn", "seqval", "operation", "update_mask", "commit_time", "k", "v")
  }
}

object SparkFixture {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
