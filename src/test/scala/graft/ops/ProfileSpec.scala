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

  test("columnHistograms: exact integer binning, bounds, and null exclusion") {
    val s = spark
    import s.implicits._
    // k in [0, 99]: 16 bins over span 100 -> bin = k*16/100
    val df = ((0L to 99L).map(Some(_)) :+ None).map(k => Tuple1(k)).toDF("k")
    val got = Profile.columnHistograms(df, Seq("k" -> Profile.IntCol), bins = 16)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val want = (0L to 99L).groupBy(k => k * 16 / 100).view.mapValues(_.size.toLong).toMap
    assert(got == want)
    assert(got.values.sum == 100, "the null row must not be binned")
    assert(got.keys.max == 15 && got.keys.min == 0)
  }

  test("columnHistograms: a constant column lands in bin 0") {
    val s = spark
    import s.implicits._
    val df = Seq(7L, 7L, 7L).map(Tuple1(_)).toDF("k")
    val got = Profile.columnHistograms(df, Seq("k" -> Profile.IntCol), bins = 16)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 3L)))
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

  test("percentile ranks: ties share the strictly-below share, groups isolate") {
    val s = spark
    import s.implicits._
    val df = (Seq(10L, 20L, 20L, 30L).map(("a", _)) ++ Seq(("b", 7L))).toDF("g", "v")
    val got = Profile.percentileRanks(df, "g", "v").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("v"), r.getAs[Long]("pct_bp")))
      .toSet
    // group a (n=4): 10 -> 0 below -> 0; both 20s -> 1 below -> 2500; 30 -> 7500
    assert(got == Set(("a", 10L, 0L), ("a", 20L, 2500L), ("a", 30L, 7500L),
      ("b", 7L, 0L)))
  }

  test("Tukey fences count exactly the values beyond 1.5*IQR") {
    val s = spark
    import s.implicits._
    // group a: 1..8 with one far outlier 100 and one far-low -100.
    // n=10 -> Q1 rank ceil(10/4)=3, Q3 rank ceil(30/4)=8
    val df = ((Seq(-100L, 100L) ++ (1L to 8L)).map(("a", _)) ++
      Seq(("b", 5L), ("b", 5L), ("b", 5L), ("b", 5L))).toDF("g", "v")
    val got = Profile.outlierFences(df, "g", "v").collect()
      .map(r => r.getAs[String]("g") -> (r.getAs[Long]("n_rows"), r.getAs[Long]("p25_v"),
        r.getAs[Long]("p75_v"), r.getAs[Long]("n_low"), r.getAs[Long]("n_high"))).toMap
    // sorted a: -100,1..8,100 -> rank3 = 2, rank8 = 7; IQR=5
    // fences(x2): lo 2*2-15=-11 -> v< -5.5; hi 14+15=29 -> v>14.5
    assert(got("a") === ((10L, 2L, 7L, 1L, 1L)))
    assert(got("b") === ((4L, 5L, 5L, 0L, 0L)), "constant group has no outliers")
  }
}
