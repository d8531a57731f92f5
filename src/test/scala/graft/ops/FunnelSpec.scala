package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class FunnelSpec extends AnyFunSuite with SparkFixture {

  private def run(rows: Seq[(Long, Long, Long, String)]) = {
    val s = spark
    import s.implicits._
    Funnel.sequentialFunnel(
      rows.toDF("event_id", "user_id", "t_s", "event_type"),
      "user_id", "t_s", "event_id",
      Seq(
        "a" -> (col("event_type") === "a"),
        "b" -> (col("event_type") === "b"),
        "c" -> (col("event_type") === "c")))
      .collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getLong(4)))).toMap
  }

  test("ordering is enforced: steps before their predecessor do not count") {
    val got = run(Seq(
      // user 1: full ordered funnel a@10 b@20 c@30
      (1L, 1L, 10L, "a"), (2L, 1L, 20L, "b"), (3L, 1L, 30L, "c"),
      // user 2: b BEFORE a -> only reaches stage 1 via the later a; the
      // early b must not count, but the b at 40 does
      (4L, 2L, 5L, "b"), (5L, 2L, 10L, "a"), (6L, 2L, 40L, "b"),
      // user 3: c only -> stage 0
      (7L, 3L, 10L, "c"),
      // user 4: a then c (no b) -> stage 1, c must not count
      (8L, 4L, 10L, "a"), (9L, 4L, 20L, "c")))
    assert(got(1L) == ((10L, 20L, 30L, 3L)))
    assert(got(2L) == ((10L, 40L, -1L, 2L)))
    assert(got(3L) == ((-1L, -1L, -1L, 0L)))
    assert(got(4L) == ((10L, -1L, -1L, 1L)))
  }

  test("earliest qualifying event wins, not the first in event order") {
    val got = run(Seq(
      (1L, 1L, 10L, "a"),
      (2L, 1L, 50L, "b"), (3L, 1L, 20L, "b"), // the 20 one qualifies and is earlier
      (4L, 1L, 25L, "c")))
    assert(got(1L) == ((10L, 20L, 25L, 3L)))
  }

  test("same-instant completion: tiebreak id order decides at-or-after") {
    // a and b at the same t: b's id sorts AFTER a's -> b counts (>= semantics)
    val got = run(Seq((1L, 1L, 10L, "a"), (2L, 1L, 10L, "b")))
    assert(got(1L) == ((10L, 10L, -1L, 2L)))
    // b's id sorts BEFORE a's -> b precedes a in the total order, no count
    val got2 = run(Seq((2L, 1L, 10L, "a"), (1L, 1L, 10L, "b")))
    assert(got2(1L) == ((10L, -1L, -1L, 1L)))
  }

  test("conversion window: steps beyond the first-anchor bound do not count") {
    val s = spark
    import s.implicits._
    def runW(rows: Seq[(Long, Long, Long, String)], w: Long) =
      Funnel.sequentialFunnel(
        rows.toDF("event_id", "user_id", "t_s", "event_type"),
        "user_id", "t_s", "event_id",
        Seq("a" -> (col("event_type") === "a"), "b" -> (col("event_type") === "b"),
          "c" -> (col("event_type") === "c")),
        withinS = Some(w))
        .collect()
        .map(r => r.getLong(0) -> ((
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          r.getLong(4)))).toMap
    val rows = Seq(
      // user 1: a@10 b@40 c@60 — all within w=100 of the anchor
      (1L, 1L, 10L, "a"), (2L, 1L, 40L, "b"), (3L, 1L, 60L, "c"),
      // user 2: a@10 b@50 c@200 — c beyond the window, stage stops at 2
      (4L, 2L, 10L, "a"), (5L, 2L, 50L, "b"), (6L, 2L, 200L, "c"),
      // user 3: ANCHORED at the first a@10, so b@300 is out even though
      // a@250 + b@300 would convert under a later anchor
      (7L, 3L, 10L, "a"), (8L, 3L, 250L, "a"), (9L, 3L, 300L, "b"))
    val got = runW(rows, 100L)
    assert(got(1L) == ((40L, 60L, 3L)))
    assert(got(2L) == ((50L, -1L, 2L)))
    assert(got(3L) == ((-1L, -1L, 1L)))
    // boundary is inclusive: b exactly at anchor + w counts
    assert(runW(Seq((1L, 9L, 0L, "a"), (2L, 9L, 100L, "b")), 100L)(9L) ==
      ((100L, -1L, 2L)))
  }
}
