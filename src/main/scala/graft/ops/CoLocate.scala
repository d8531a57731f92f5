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

  // ONE temp warehouse per JVM, removed on exit; table names are suffixed
  // per invocation so a DataFrame returned by an earlier call stays valid
  // (and concurrent callers can't clobber each other's files). Disk use is
  // bounded by session length, not unbounded across JVMs — the shutdown
  // hook reclaims everything.
  private lazy val base = {
    val dir = Files.createTempDirectory("graft_buckets")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(p: java.nio.file.Path): Unit = {
        if (Files.isDirectory(p)) {
          val s = Files.list(p)
          try s.forEach(rm) finally s.close() // unclosed streams hold FDs
        }
        Files.deleteIfExists(p)
      }
      try rm(dir) catch { case scala.util.control.NonFatal(_) => () }
    }))
    dir
  }
  private val invocation = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Write both sides bucketed on `key` (external tables under a temp
    * warehouse path) and return their shuffle-free equi-join. */
  def bucketedEquiJoin(
      spark: SparkSession,
      left: DataFrame,
      right: DataFrame,
      key: String,
      buckets: Int = 8): DataFrame = {
    val n = invocation.incrementAndGet()
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
    save(left, s"graft_bkt_l_$n").hint("merge")
      .join(save(right, s"graft_bkt_r_$n"), Seq(key))
  }
}
