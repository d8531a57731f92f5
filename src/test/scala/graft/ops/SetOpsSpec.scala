package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The graded ext_set_ops query computes user segments with a single-scan
  * flag aggregation; this pins it equal to the literal Dataset
  * except()/intersect() formulation (which re-scans per segment). */
class SetOpsSpec extends AnyFunSuite with SparkFixture {

  test("flag aggregation equals the literal except/intersect segments") {
    val s = spark
    val e = graft.sources.Events.read(s, "/root/testdata/sf0.001")
    val v = e.where(col("event_type") === "view").select("user_id").distinct()
    val p = e.where(col("event_type") === "purchase").select("user_id").distinct()
    val literal = Map(
      "both" -> v.intersect(p).count(),
      "purchase_only" -> p.except(v).count(),
      "view_only" -> v.except(p).count())

    val flagged = graft.SparkEntry.queries("ext_set_ops")(s, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(flagged == literal, s"flagged=$flagged literal=$literal")
  }
}
