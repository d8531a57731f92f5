package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class ProfileSpec extends AnyFunSuite with SparkFixture {

  test("columnStats: nulls, rendered min/max, exact rendered ndv per kind") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(3L), Some(1.005), Some("b")),
      (Some(1L), Some(1.009), Some("a")), // same cents as 1.005 -> 1 rendered value
      (None, Some(2.50), None),
      (Some(3L), None, Some("a")))
      .toDF("k", "price", "tag")
    val got = Profile.columnStats(df, Seq(
        "k" -> Profile.IntCol, "price" -> Profile.CentsCol, "tag" -> Profile.StrCol))
      .collect().map(r => r.getString(0) -> r).toMap

    val k = got("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 1 && k.getLong(3) == 2)
    assert(k.getLong(4) == 1 && k.getLong(5) == 3) // min_i / max_i
    val p = got("price")
    assert(p.getLong(2) == 1 && p.getLong(3) == 2, "cents-granular ndv: 100,100,250")
    assert(p.getLong(4) == 100 && p.getLong(5) == 250)
    val t = got("tag")
    assert(t.getLong(2) == 1 && t.getLong(3) == 2)
    assert(t.isNullAt(4) && t.isNullAt(5), "string columns carry no integer bounds")
    assert(t.getString(6) == "a" && t.getString(7) == "b")
  }

  test("ndv never plans an Expand (the multi-countDistinct trap)") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (i.toLong, (i % 7).toLong)).toDF("a", "b")
    val plan = Profile.columnStats(df,
        Seq("a" -> Profile.IntCol, "b" -> Profile.IntCol))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"profile must not use the Expand plan:\n$plan")
  }
}
