package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class AsOfJoinSpec extends AnyFunSuite with SparkFixture {

  test("backward as-of join: >= match, carry-forward, ties, and no-match NULLs") {
    val s = spark
    import s.implicits._
    val probes = Seq(
      (1L, "A", 5L), (2L, "A", 10L), (3L, "A", 15L), (4L, "A", 25L),
      (5L, "A", 30L), // two marks tie at t=30 -> larger mark id wins
      (6L, "B", 50L)) // user with no marks at all
      .toDF("event_id", "user", "t")
    val marks = Seq(
      ("A", 10L, 100L), ("A", 20L, 101L), ("A", 30L, 102L), ("A", 30L, 103L))
      .toDF("user", "mt", "mark_id")

    val out = AsOfJoin.backward(probes, marks, Seq("user"),
        leftTime = "t", rightTime = "mt", payload = Seq("mark_id"), tieBreak = "mark_id")
      .orderBy("event_id").collect()

    val got = out.map(r => (r.getLong(0),
      if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got == Seq(
      1L -> -1L,   // before any mark
      2L -> 100L,  // mark AT the probe time matches (>= semantics)
      3L -> 100L,  // carried forward
      4L -> 101L,  // superseded by the later mark
      5L -> 103L,  // tie at t=30: greatest tieBreak wins
      6L -> -1L))  // user never marked
  }

  test("nearest as-of join: direction choice, distance-0, equidistance, and edges") {
    val s = spark
    import s.implicits._
    val probes = Seq(
      (1L, "A", 5L),   // only forward exists (before all marks)
      (2L, "A", 12L),  // backward at 10 (d=2) beats forward at 20 (d=8)
      (3L, "A", 18L),  // forward at 20 (d=2) beats backward at 10 (d=8)
      (4L, "A", 15L),  // equidistant (10 vs 20) -> backward wins
      (5L, "A", 20L),  // same-instant mark -> distance 0, backward frame
      (6L, "A", 99L),  // only backward exists (after all marks)
      (7L, "B", 50L))  // user with no marks -> NULL
      .toDF("event_id", "user", "t")
    val marks = Seq(("A", 10L, 100L), ("A", 20L, 101L))
      .toDF("user", "mt", "mark_id")

    val out = AsOfJoin.nearest(probes, marks, Seq("user"),
        leftTime = "t", rightTime = "mt", payload = Seq("mark_id"), tieBreak = "mark_id")
      .orderBy("event_id").collect()
    val got = out.map(r => (r.getLong(0),
      if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got == Seq(
      1L -> 100L, 2L -> 100L, 3L -> 101L, 4L -> 100L,
      5L -> 101L, 6L -> 101L, 7L -> -1L))
  }

  test("nearest equals the per-row brute-force closest mark on a random-ish set") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random layout: probes and marks interleaved
    val probes = (1L to 40L).map(i => (i, s"u${i % 3}", (i * 37) % 100))
      .toDF("event_id", "user", "t")
    val markRows = (1L to 15L).map(i => (s"u${i % 3}", (i * 23) % 100, 1000L + i))
    val marks = markRows.toDF("user", "mt", "mark_id")

    val out = AsOfJoin.nearest(probes, marks, Seq("user"),
        leftTime = "t", rightTime = "mt", payload = Seq("mark_id"), tieBreak = "mark_id")
      .orderBy("event_id").collect()

    out.foreach { r =>
      val (id, user, t) = (r.getLong(0), r.getString(1), r.getLong(2))
      val cands = markRows.filter(_._1 == user)
      if (cands.isEmpty) assert(r.isNullAt(3), s"probe $id should be unmatched")
      else {
        val bestD = cands.map(m => math.abs(m._2 - t)).min
        val back = cands.filter(m => m._2 <= t && t - m._2 == bestD)
        // backward wins at equidistance; ties within a direction: backward
        // takes the max tieBreak, forward the min
        val expect =
          if (back.nonEmpty) back.map(_._3).max
          else cands.filter(m => m._2 - t == bestD).map(_._3).min
        assert(r.getLong(3) == expect, s"probe $id at t=$t")
      }
    }
  }

  test("selfNearest (single-scan) matches nearest over the split sides") {
    val s = spark
    import org.apache.spark.sql.functions._
    val e = graft.sources.Events.read(s, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000000000").as("t_s"), col("event_type"))

    val viaSelf = AsOfJoin.selfNearest(e, Seq("user_id"), "t_s",
        col("event_type") === "purchase",
        Seq("event_id" -> "ref_event_id", "t_s" -> "ref_t_s"), "ref_event_id")
      .drop("event_type").collect().map(_.toSeq).toSet

    val marks = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("t_s").as("m_t"),
        col("event_id").as("ref_event_id"), col("t_s").as("ref_t_s"))
    val viaTwo = AsOfJoin.nearest(e.drop("event_type"), marks, Seq("user_id"),
        "t_s", "m_t", Seq("ref_event_id", "ref_t_s"), "ref_event_id")
      .collect().map(_.toSeq).toSet
    assert(viaSelf == viaTwo && viaSelf.nonEmpty)
  }

  test("a NULL payload field on the latest mark is carried, not resurrected") {
    val s = spark
    import s.implicits._
    val probes = Seq((1L, "A", 30L)).toDF("event_id", "user", "t")
    val marks = Seq(
      ("A", 10L, Option(5L), Option(100L)),   // older mark, both fields set
      ("A", 20L, None: Option[Long], Option(200L))) // latest mark: a is NULL
      .toDF("user", "mt", "a", "b")
    val row = AsOfJoin.backward(probes, marks, Seq("user"),
        "t", "mt", payload = Seq("a", "b"), tieBreak = "b")
      .head()
    // the probe must take the ENTIRE latest mark: a=NULL (not 5 from t=10)
    assert(row.isNullAt(row.fieldIndex("a")),
      "stale mark's value must not fill the latest mark's NULL field")
    assert(row.getAs[Long]("b") == 200L)
  }

  test("selfBackward (single-scan) matches backward over the split sides") {
    val s = spark
    import org.apache.spark.sql.functions._
    val e = graft.sources.Events.read(s, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000000000").as("t_s"), col("event_type"))

    val viaSelf = AsOfJoin.selfBackward(e, Seq("user_id"), "t_s",
        col("event_type") === "purchase",
        Seq("event_id" -> "ref_event_id", "t_s" -> "ref_t_s"), "ref_event_id")
      .drop("event_type").collect().map(_.toSeq).toSet

    val marks = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("t_s").as("m_t"),
        col("event_id").as("ref_event_id"), col("t_s").as("ref_t_s"))
    val viaTwo = AsOfJoin.backward(e.drop("event_type"), marks, Seq("user_id"),
        "t_s", "m_t", Seq("ref_event_id", "ref_t_s"), "ref_event_id")
      .collect().map(_.toSeq).toSet
    assert(viaSelf == viaTwo && viaSelf.nonEmpty)
  }

  test("selfForward: earliest at-or-after mark, same-instant match, min-id tie, " +
      "trailing no-match NULLs") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val e = Seq(
      (1L, 7L, 100L, "view"), // -> mark 3 (next at 200)
      (2L, 7L, 200L, "purchase"), // a mark IS a probe too: matches itself (>=)
      (3L, 7L, 200L, "purchase"), // same instant: min-id tie -> 2
      (4L, 7L, 300L, "view"), // no future mark -> NULLs
      (5L, 9L, 50L, "view") // other user isolated -> NULLs
    ).toDF("event_id", "user_id", "t_s", "event_type")
    val got = AsOfJoin.selfForward(e, Seq("user_id"), "t_s",
        col("event_type") === "purchase",
        Seq("event_id" -> "ref_event_id"), "ref_event_id")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> -1L, 5L -> -1L))
  }

  test("payload name collision with a left column is rejected") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, "A", 5L)).toDF("event_id", "user", "t")
    val r = Seq(("A", 1L, 2L)).toDF("user", "mt", "t")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, Seq("user"), "t", "mt", Seq("t"), "t")
    }
    assert(e.getMessage.contains("collides"))
  }
}
