package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Join co-location via bucketing — the third leg of the join-scale tripod
  * (broadcast for small dims: [[Analytics]]; salting for skew: [[SkewJoin]];
  * bucketing for repeated big⋈big joins on a stable key).
  *
  * Both sides are written as bucketed, bucket-sorted tables on the join
  * key; Spark then plans the equi-join with ZERO exchange — each task reads
  * matching bucket files from both sides. At 100 TB this turns every
  * repeated join on the key into a shuffle-free map-side merge, paying the
  * bucket-write once instead of a shuffle per join. The bucketed-join plan
  * shape is locked by PlanShapeSpec.
  */
object CoLocate {

  // ONE temp warehouse and FIXED table names per JVM: repeated invocations
  // overwrite in place, so a long session (bench loops, property tests)
  // holds at most one bucketed copy of each side on disk and two catalog
  // entries — not an unbounded accumulation. Caveat: a DataFrame returned
  // by a PREVIOUS invocation must be consumed before the next one
  // overwrites its files (the normal use is write→join→aggregate→done).
  private lazy val base = Files.createTempDirectory("graft_buckets")

  /** Write both sides bucketed on `key` (external tables under a temp
    * warehouse path) and return their shuffle-free equi-join. */
  def bucketedEquiJoin(
      spark: SparkSession,
      left: DataFrame,
      right: DataFrame,
      key: String,
      buckets: Int = 8): DataFrame = {
    def save(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite")
        .option("path", base.resolve(name).toString)
        .bucketBy(buckets, key).sortBy(key)
        .saveAsTable(name)
      spark.table(name)
    }
    // MERGE hint: at test scale the planner would broadcast the smaller
    // side (also shuffle-free, but it doesn't exercise co-location); the
    // hint pins the sort-merge strategy this operator exists to feed —
    // with both sides bucket-aligned it plans with zero Exchange.
    save(left, "graft_bkt_l").hint("merge")
      .join(save(right, "graft_bkt_r"), Seq(key))
  }
}
