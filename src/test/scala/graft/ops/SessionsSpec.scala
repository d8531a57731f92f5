package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class SessionsSpec extends AnyFunSuite with SparkFixture {

  test("gaps-and-islands: gap strictly greater than gapS opens a new session") {
    val s = spark
    import s.implicits._
    // user 1: [0, 1000] | gap 1900 | [2900, 4000, 5800]  (1800 == gapS stays)
    // user 2: single event
    val events = Seq(
      (1L, 10L, 0L), (1L, 11L, 1000L), (1L, 12L, 2900L), (1L, 13L, 4000L),
      (1L, 14L, 5800L),
      (2L, 20L, 7L))
      .toDF("user_id", "event_id", "t_s")

    val out = Sessions.sessionize(events, "user_id", "t_s", "event_id", gapS = 1800L)
      .orderBy("user_id", "session_seq")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(out == Seq(
      (1L, 1L, 2L, 0L, 1000L),
      (1L, 2L, 3L, 2900L, 5800L),
      (2L, 1L, 1L, 7L, 7L)))
  }

  test("matches a brute-force sessionization of the fixture events") {
    val s = spark
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Events.read(s, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), expr("ts div 1000000000").as("t_s"))
    val got = Sessions.sessionize(ev, "user_id", "t_s", "event_id", gapS = 1800L)
      .select("user_id", "session_seq", "n_events", "session_start_s", "session_end_s")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    // driver-side reference implementation over the same (tiny) fixture
    val rows = ev.collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(0)))
      .groupBy(_._1)
    val want = rows.flatMap { case (uid, es) =>
      val sorted = es.map { case (_, t, id) => (t, id) }.sortBy(identity).map(_._1)
      val sessions = sorted.foldLeft(List.empty[List[Long]]) {
        case (cur :: rest, t) if t - cur.head <= 1800L => (t :: cur) :: rest
        case (acc, t) => List(t) :: acc
      }.reverse
      sessions.zipWithIndex.map { case (ts, i) =>
        (uid, (i + 1).toLong, ts.size.toLong, ts.last, ts.head)
      }
    }.toSet
    assert(got == want)
  }
}
