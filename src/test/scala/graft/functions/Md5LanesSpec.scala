package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class Md5LanesSpec extends AnyFunSuite with SparkFixture {

  test("md5_lanes equals the composable md5/concat/substring formulation") {
    val s = spark
    import s.implicits._
    val df = Seq("a b c", "", "zz qq", "the quick brown fox", "ü≠")
      .toDF("sh")
    val n = 12
    val lanes = df.select(
      Md5Lanes.md5Lanes(col("sh"), n).as("fast") +:
        (0 until n).map(h =>
          substring(md5(concat(lit(s"${h / 4}:"), col("sh"))), (h % 4) * 8 + 1, 8)
            .as(s"ref_$h")): _*)
    lanes.collect().foreach { r =>
      val fast = r.getAs[scala.collection.Seq[Long]]("fast")
        .map(v => f"$v%08x")
      val ref = (0 until n).map(h => r.getAs[String](s"ref_$h"))
      assert(fast == ref, s"lane mismatch for row $r")
    }
  }
}
