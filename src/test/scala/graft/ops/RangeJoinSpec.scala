package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class RangeJoinSpec extends AnyFunSuite with SparkFixture {

  test("point-in-range equals the brute-force cross filter, bounds inclusive") {
    val s = spark
    import s.implicits._
    // ranges deliberately overlapping, adjacent, bucket-spanning, and
    // degenerate (lo == hi); width 10 so several ranges cross bucket edges
    val rangeRows = Seq(
      (1L, 0L, 5L), (2L, 3L, 27L), (3L, 10L, 10L), (4L, 8L, 12L),
      (5L, 25L, 55L), (6L, 40L, 41L), (7L, 90L, 99L))
    val ranges = rangeRows.toDF("range_id", "lo", "hi")
    val points = (0L to 100L by 3L).map(p => Tuple1(p)).toDF("p")

    val got = RangeJoin.pointInRange(points, "p", ranges, "lo", "hi", bucketWidth = 10L)
      .select("p", "range_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      p <- 0L to 100L by 3L
      (id, lo, hi) <- rangeRows if p >= lo && p <= hi
    } yield (p, id)).toSet
    assert(got == want)
  }

  test("bucket width does not change the result (expansion is result-invisible)") {
    val s = spark
    import s.implicits._
    val ranges = Seq((1L, 2L, 95L), (2L, 14L, 18L)).toDF("range_id", "lo", "hi")
    val points = (0L to 99L by 7L).map(p => Tuple1(p)).toDF("p")
    val at = (w: Long) =>
      RangeJoin.pointInRange(points, "p", ranges, "lo", "hi", w)
        .select("p", "range_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at(1L) == at(10L) && at(10L) == at(1000L))
  }

  test("colliding column names are rejected") {
    val s = spark
    import s.implicits._
    val ranges = Seq((1L, 2L, 9L)).toDF("p", "lo", "hi")
    val points = Seq(Tuple1(1L)).toDF("p")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInRange(points, "p", ranges, "lo", "hi", 10L)
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("interval overlap plans an equi-join on the bucket, never a nested loop") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 0L, 95L)).toDF("lid", "llo", "lhi")
    val right = Seq((2L, 30L, 150L)).toDF("rid", "rlo", "rhi")
    val plan = RangeJoin.intervalOverlap(left, "llo", "lhi", right, "rlo", "rhi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"overlap join must hash on the bucket key:\n$plan")
  }

  test("interval overlap equals brute force; multi-bucket pairs emit exactly once") {
    val s = spark
    import s.implicits._
    // widths far beyond the bucket (w=10): pair (1,101) shares MANY
    // buckets; touching endpoints (2,102) overlap; disjoint (3,103);
    // negative coords (4,104); containment (5,105)
    val left = Seq(
      (1L, 0L, 95L), (2L, 10L, 20L), (3L, 0L, 4L), (4L, -25L, -7L), (5L, 40L, 80L)
    ).toDF("lid", "llo", "lhi")
    val right = Seq(
      (101L, 30L, 150L), (102L, 20L, 29L), (103L, 5L, 9L), (104L, -9L, 3L), (105L, 50L, 60L)
    ).toDF("rid", "rlo", "rhi")
    for (w <- Seq(1L, 7L, 10L, 1000L)) {
      val got = RangeJoin.intervalOverlap(left, "llo", "lhi", right, "rlo", "rhi", w)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val brute = left.crossJoin(right)
        .where(col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq === brute.toSeq, s"bucket width $w")
      assert(got.length === got.distinct.length, s"duplicate pairs at width $w")
    }
  }
}
