package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class FeaturesSpec extends AnyFunSuite with SparkFixture {

  private def run(rows: Seq[(Long, Long, Long, String)], nDim: Long = 10L) = {
    val s = spark
    import s.implicits._
    val events = rows.toDF("event_id", "user_id", "t_s", "event_type")
    val dim = (1L to nDim).map(k => (k, k % 5)).toDF("c_custkey", "c_nationkey")
    Features.purchaseFeatures(events, dim, nDim)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5))))
      .toMap
  }

  test("trailing views count only the PAST hour — a later view never leaks") {
    val got = run(Seq(
      (1L, 7L, 1000L, "view"),
      (2L, 7L, 4000L, "view"), // 3000s before purchase: inside [t-3600, t]
      (3L, 7L, 7000L, "purchase"),
      (4L, 7L, 7001L, "view") // AFTER the purchase: must not count
    ))
    // user 7 -> custkey 8 -> nation 3; view@1000 is 6000s old (outside);
    // both 3000s gaps exceed the 1800s session gap -> purchase = session 3
    assert(got == Map(3L -> ((3L, 1L, 3L, -1L))))
  }

  test("session ordinal and previous-purchase gap across session breaks") {
    val got = run(Seq(
      (1L, 2L, 100L, "purchase"),
      (2L, 2L, 200L, "purchase"), // same session, gap 100
      (3L, 2L, 5000L, "purchase"), // 4800s later: session 2, gap 4800
      (4L, 9L, 100L, "purchase") // other user: isolated
    ))
    assert(got(1L) == ((3L, 0L, 1L, -1L))) // custkey 3 -> nation 3
    assert(got(2L) == ((3L, 0L, 1L, 100L)))
    assert(got(3L) == ((3L, 0L, 2L, 4800L)))
    assert(got(4L) == ((0L, 0L, 1L, -1L))) // custkey 10 -> nation 0
  }

  test("a same-second view is a RANGE-frame peer and counts") {
    val got = run(Seq(
      (1L, 1L, 500L, "view"),
      (2L, 1L, 500L, "purchase")))
    assert(got(2L)._2 == 1L)
  }
}
