package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class JourneysSpec extends AnyFunSuite with SparkFixture {

  private def ev(rows: (Long, Long, Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "user_id", "t_s", "event_type")
  }

  test("sessionPaths: ordered folds, gap split, truncation marker, top-k total order") {
    // user 1: one session a>b>c, then (gap) a>b>c again; user 2: a>b>c
    val df = ev(
      (1L, 1L, 10L, "a"), (2L, 1L, 20L, "b"), (3L, 1L, 30L, "c"),
      (4L, 1L, 5000L, "a"), (5L, 1L, 5010L, "b"), (6L, 1L, 5020L, "c"),
      (7L, 2L, 10L, "a"), (8L, 2L, 15L, "b"), (9L, 2L, 20L, "c"),
      (10L, 3L, 10L, "z"))
    val got = Journeys.sessionPaths(df, "user_id", "t_s", "event_id", "event_type",
        gapS = 1800L, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq("a>b>c" -> 3L, "z" -> 1L))
  }

  test("sessionPaths truncates long sessions with the marker") {
    val rows = (1L to 15L).map(i => (i, 1L, i * 10L, s"e${i % 3}"))
    val got = Journeys.sessionPaths(ev(rows: _*), "user_id", "t_s", "event_id",
        "event_type", gapS = 1800L, k = 5, maxLen = 12)
      .collect().map(_.getString(0))
    assert(got.length == 1)
    assert(got.head.endsWith(">…"), s"expected truncation marker, got ${got.head}")
    assert(got.head.count(_ == '>') == 12, "12 kept events + marker = 12 separators")
  }

  test("sessionPaths bounds state: a bot session far beyond maxLen yields " +
      "the same truncated path as a maxLen+1 session; exactly-maxLen gets no marker") {
    // the rank<=maxLen+1 pre-filter means a 500-event session and a
    // 6-event session fold to the SAME path at maxLen=5 — and a session of
    // exactly maxLen keeps its full path unmarked (boundary: the marker
    // needs rank maxLen+1 to EXIST, not its payload)
    val bot = (1L to 500L).map(i => (i, 1L, i * 2L, s"e${i % 4}"))
    val six = (1L to 6L).map(i => (1000L + i, 2L, i * 2L, s"e${i % 4}"))
    val five = (1L to 5L).map(i => (2000L + i, 3L, i * 2L, s"e${i % 4}"))
    val got = Journeys.sessionPaths(ev(bot ++ six ++ five: _*), "user_id", "t_s",
        "event_id", "event_type", gapS = 1800L, k = 10, maxLen = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("e1>e2>e3>e0>e1>…" -> 2L, "e1>e2>e3>e0>e1" -> 1L))
  }

  test("same-instant events order by the id tiebreak") {
    val got = Journeys.sessionPaths(
        ev((2L, 1L, 10L, "b"), (1L, 1L, 10L, "a")),
        "user_id", "t_s", "event_id", "event_type", gapS = 1800L, k = 5)
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("a>b"))
  }

  test("eventTransitions: counts, per-from shares, cross-user isolation") {
    // user 1: a->b, b->a, a->b ; user 2: b->c (no transition from u1 to u2)
    val df = ev(
      (1L, 1L, 10L, "a"), (2L, 1L, 20L, "b"), (3L, 1L, 30L, "a"), (4L, 1L, 40L, "b"),
      (5L, 2L, 10L, "b"), (6L, 2L, 20L, "c"))
    val got = Journeys.eventTransitions(df, "user_id", "t_s", "event_id", "event_type")
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(("a", "b")) == ((2L, 10000L))) // a only ever goes to b
    assert(got(("b", "a")) == ((1L, 5000L)))  // b splits 1/1 between a and c
    assert(got(("b", "c")) == ((1L, 5000L)))
    assert(got.size == 3, "no cross-user phantom transitions")
  }
}
