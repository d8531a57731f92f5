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
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    val e = s.read.parquet("/root/testdata/sf0.001/events.parquet")
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
