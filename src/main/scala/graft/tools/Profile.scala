package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, DocFeed}

/** Dev-only stage profiler for the slowest graded queries — times each
  * sub-stage of the MinHash near-dup pipeline in isolation so regressions
  * can be localized without the Spark UI. Not part of the graded surface.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val corpus = DocFeed.withDups(spark.read.parquet(s"$sfDir/documents.parquet")).cache()
    time("corpus count")(corpus.count())

    val raw = time("rawShingles build")(Dedup.rawShingles(corpus).cache())
    time("rawShingles count")(println("  rows=" + raw.count()))
    val sigs = time("minhashSignatures")(Dedup.minhashSignatures(raw).cache())
    time("minhashSignatures count")(println("  rows=" + sigs.count()))
    val bands = time("bands+selfjoin")(
      Dedup.bands(sigs).groupBy("band", "sig").count().where(col("count") > 1))
    time("bucket histogram")(bands.orderBy(desc("count")).show(5, truncate = false))
    val pairs = time("nearDuplicatePairs full")(Dedup.nearDuplicatePairs(corpus))
    time("nearDuplicatePairs count")(println("  pairs=" + pairs.count()))
    // second run: everything warm, mirrors bench steady-state
    time("nearDuplicatePairs again")(println("  pairs=" + Dedup.nearDuplicatePairs(corpus).count()))
    spark.stop()
  }
}
