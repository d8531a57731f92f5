package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class AnalyticsSpec extends AnyFunSuite with SparkFixture {

  test("rollup emits detail, per-region and grand-total rows that reconcile") {
    val s = spark
    import s.implicits._
    val region = Seq((1L, "R1"), (2L, "R2")).toDF("r_regionkey", "r_name")
    val nation = Seq((10L, 1L, "N1"), (11L, 1L, "N2"), (12L, 2L, "N3"))
      .toDF("n_nationkey", "n_regionkey", "n_name")
    val customer = Seq((100L, 10L), (101L, 11L), (102L, 12L), (103L, 12L))
      .toDF("c_custkey", "c_nationkey")
    val orders = Seq(
      (100L, 10.00), (100L, 20.00), (101L, 5.00), (102L, 7.50), (103L, 2.25), (103L, 0.25))
      .toDF("o_custkey", "o_totalprice")

    val out = Analytics.revenueRollup(orders, customer, nation, region)
      .orderBy("gid", "r_name", "n_name").collect()

    val detail = out.filter(_.getLong(2) == 0L)
    val regional = out.filter(_.getLong(2) == 1L)
    val total = out.filter(_.getLong(2) == 3L)
    assert(detail.length == 3 && regional.length == 2 && total.length == 1)

    def cents(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getAs[Long]("revenue_cents")).sum
    assert(cents(detail) == 4500L && cents(regional) == 4500L && cents(total) == 4500L)
    assert(total.head.getAs[Long]("n_orders") == 6L)
    // distinct customers do NOT simply add up across levels (102,103 share
    // a nation): the rollup recomputes them per grouping set
    assert(total.head.getAs[Long]("n_customers") == 4L)
    val r2 = regional.find(_.getAs[String]("r_name") == "R2").get
    assert(r2.getAs[Long]("n_customers") == 2L && r2.getAs[Long]("n_orders") == 3L)
  }

  test("movingUserActivity trailing frame is value-bounded and inclusive") {
    val s = spark
    import s.implicits._
    // user 1: events at t = 0, 3600 (exactly one window back — INCLUDED),
    // 3601 (t=0 now out of range), and a same-second pair at t = 9000;
    // user 2 isolated at t = 3600
    val events = Seq(
      (1L, 1L, 0L, 1.0),
      (2L, 1L, 3600L, 2.0),
      (3L, 1L, 3601L, 4.0),
      (4L, 1L, 9000L, 8.0),
      (5L, 1L, 9000L, 16.0),
      (6L, 2L, 3600L, 32.0))
      .toDF("event_id", "user_id", "t", "value")
      .withColumn("ts", col("t") * 1000000000L).drop("t")
    val got = Analytics.movingUserActivity(events)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_1h"), r.getAs[Long]("cents_1h"))).toMap
    assert(got(1L) == (1L, 100L))
    assert(got(2L) == (2L, 300L), "t-3600 is inside the inclusive frame")
    assert(got(3L) == (2L, 600L), "t=0 fell out, t=3600 still in")
    // RANGE frame: same-second peers see each other regardless of order
    assert(got(4L) == (2L, 2400L) && got(5L) == (2L, 2400L))
    assert(got(6L) == (1L, 3200L), "users are isolated")
  }

  test("cube emits all four grouping sets and they reconcile") {
    val s = spark
    import s.implicits._
    val orders = Seq(
      ("1-URGENT", "O", 10.0), ("1-URGENT", "F", 20.0),
      ("2-HIGH", "O", 40.0), ("2-HIGH", "O", 80.0)
    ).toDF("o_orderpriority", "o_orderstatus", "o_totalprice")
    val rows = Analytics.ordersCube(orders).collect()
      .map(r => (Option(r.getAs[String]("o_orderpriority")),
        Option(r.getAs[String]("o_orderstatus")), r.getAs[Long]("gid"),
        r.getAs[Long]("n_orders"), r.getAs[Long]("revenue_cents")))
    assert(rows.length === 3 + 2 + 2 + 1) // leaves + prio margins + status margins + grand
    assert(rows.contains((None, None, 3L, 4L, 15000L)), "grand total, gid=3")
    assert(rows.contains((Some("2-HIGH"), None, 1L, 2L, 12000L)), "priority margin")
    assert(rows.contains((None, Some("O"), 2L, 3L, 13000L)), "status margin (cube-only)")
    assert(rows.contains((Some("1-URGENT"), Some("F"), 0L, 1L, 2000L)))
  }

  test("gap fill emits zero rows for missing hours and carries the metric forward") {
    val s = spark
    import s.implicits._
    // type A: hours 0 and 3 (gap 1-2); type B: only hour 2 (leading gap)
    val events = Seq(
      ("A", 100L, 1.0), ("A", 3600L * 3, 5.0), ("A", 3600L * 3 + 10, 2.0),
      ("B", 3600L * 2, 7.0)
    ).toDF("event_type", "t", "value")
      .withColumn("ts", col("t") * 1000000000L).drop("t")
    val got = Analytics.gapFillHourly(events, "event_type").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour_id"),
        r.getAs[Long]("n_events"), r.getAs[Long]("cents_locf"))).toSet
    assert(got === Set(
      ("A", 0L, 1L, 100L), ("A", 1L, 0L, 100L), ("A", 2L, 0L, 100L), ("A", 3L, 2L, 500L),
      ("B", 0L, 0L, 0L), ("B", 1L, 0L, 0L), ("B", 2L, 1L, 700L), ("B", 3L, 0L, 700L)))
  }

  test("hourly anomalies: NULL deviation with no baseline, zero-filled " +
      "gap hours dilute it, a spike over 2x the trailing mean flags") {
    val s = spark
    import s.implicits._
    // one event in each of hours 0..3, nothing in hour 4, EIGHT in hour 5
    val rows = (0 to 3).map(h => ("A", 3600L * h + 5, 1.0)) ++
      (1 to 8).map(i => ("A", 3600L * 5 + i, 1.0))
    val events = rows.toDF("event_type", "t", "value")
      .withColumn("ts", col("t") * 1000000000L).drop("t")
    val got = Analytics.hourlyAnomalies(events, "event_type").collect()
      .map(r => r.getAs[Long]("hour_id") -> ((r.getAs[Long]("n_events"),
        r.getAs[Long]("baseline_sum"), r.getAs[Long]("baseline_hours"),
        Option(r.getAs[Any]("dev_bp")).map(_.asInstanceOf[Long]),
        r.getAs[Long]("is_spike")))).toMap
    assert(got(0L) == ((1L, 0L, 0L, None, 0L)), "first hour has no baseline")
    assert(got(1L) == ((1L, 1L, 1L, Some(10000L), 0L)))
    // hour 4 is a GRID row: zero events over baseline 1+1+1+1
    assert(got(4L) == ((0L, 4L, 4L, Some(0L), 0L)))
    // hour 5: 8 events vs baseline sum 4 over 5 hours -> 8*5*10^4/4 = 10x
    assert(got(5L) == ((8L, 4L, 5L, Some(100000L), 1L)))
  }

  test("basket rules: support/confidence/lift math, support cut, hot-basket skip") {
    val s = spark
    import s.implicits._
    val baskets = (Seq(
      (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L),
      (4L, 2L), (4L, 3L),
      (5L, 1L), (5L, 2L), (5L, 3L),
      (5L, 1L) // duplicate membership row collapses
    ) ++ (10L to 19L).map(m => (6L, m))) // hot basket: skipped, not exploded
      .toDF("g", "m")
    val got = Analytics.basketRules(baskets, "g", "m", maxGroupSize = 8, minSupport = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // N = 5 capped baskets; c(1)=4, c(2)=4, c(3)=3
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)), "hot basket must not contribute")
    assert(got((1L, 2L)) == ((3L, 6000L, 7500L, 7500L, 9375L)))
    assert(got((1L, 3L)) == ((2L, 4000L, 5000L, 6666L, 8333L)))
    assert(got((2L, 3L)) == ((2L, 4000L, 5000L, 6666L, 8333L)))
  }

  test("exact quantiles select real elements at the ceil(p*n) rank") {
    val s = spark
    import s.implicits._
    // odd group: 1..5 -> p50 = rank 3 = 3, p90 = rank ceil(4.5)=5 -> 5
    // even group with ties: [10,10,20,30] -> p50 = rank 2 = 10, p90 = rank 4 = 30
    val df = (Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 5L)) ++
      Seq(("b", 10L), ("b", 10L), ("b", 20L), ("b", 30L))).toDF("g", "v")
    val got = Analytics.exactQuantiles(df, "g", "v").collect()
      .map(r => r.getAs[String]("g") -> (r.getAs[Long]("n_rows"), r.getAs[Long]("min_v"),
        r.getAs[Long]("p50_v"), r.getAs[Long]("p90_v"), r.getAs[Long]("max_v"))).toMap
    assert(got("a") === ((5L, 1L, 3L, 5L, 5L)))
    assert(got("b") === ((4L, 10L, 10L, 30L, 30L)))
  }
}
