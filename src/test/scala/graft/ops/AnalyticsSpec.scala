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
}
