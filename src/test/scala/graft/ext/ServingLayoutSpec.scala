package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The shared fold-read pruning helpers: the affected-partition literal
  * set must reach a layout scan as a STATIC partition filter whatever
  * type directory-name inference gave the partition column — a mistyped
  * literal set would cast the partition ATTRIBUTE and risk reading
  * everything. */
class ServingLayoutSpec extends AnyFunSuite with graft.SparkFixture {

  private def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    p.flatMap {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansOf(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansOf(a.executedPlan)
      case _ => Nil
    }

  test("affectedValues collects a sorted distinct literal set") {
    val s = spark
    import s.implicits._
    val vals = ServingLayout.affectedValues(
      Seq(3L, 1L, 3L, 7L, 1L).toDF("b").select($"b"))
    assert(vals == Seq(1L, 3L, 7L))
  }

  test("affectedValues REJECTS non-integral boxed partition values instead " +
      "of truncating them through Number.longValue") {
    val s = spark
    import s.implicits._
    val e = intercept[IllegalArgumentException] {
      ServingLayout.affectedValues(Seq(1.5d).toDF("b").select($"b"))
    }
    assert(e.getMessage.contains("non-integral"),
      s"a boxed Double must hit the integral-contract rejection, got: $e")
  }

  test("partitionIn prunes an INFERRED-IntegerType partition column statically") {
    val s = spark
    import s.implicits._
    val base = graft.TempDirs.create("graft_slayout_t")
    val path = base.resolve("t").toString
    (0L until 40L).map(i => (i, i % 4)).toDF("id", "b")
      .repartition(col("b")).write.partitionBy("b").parquet(path)
    val stored = s.read.parquet(path) // b infers as IntegerType
    assert(stored.schema("b").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val pruned = stored.where(
      ServingLayout.partitionIn(col("b"), stored.schema("b").dataType, Seq(1L, 3L)))
    // collect() — not count(), which runs a SEPARATE QueryExecution and
    // leaves this frame's scan metrics untouched
    assert(pruned.collect().length == 20)
    val scans = scansOf(pruned.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    scans.foreach { f =>
      val read = f.metrics.get("numPartitions").map(_.value)
      assert(read.contains(2L),
        s"the literal set must prune the scan to 2 of 4 partitions, read $read")
    }
    // empty set → nothing read, no crash
    val none = stored.where(
      ServingLayout.partitionIn(col("b"), stored.schema("b").dataType, Seq.empty))
    assert(none.count() == 0L)
  }
}
