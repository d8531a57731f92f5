package graft.ops

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
}
