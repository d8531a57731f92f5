package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class SkewJoinSpec extends AnyFunSuite with SparkFixture {

  test("salted join equals the plain join and spreads the hot key") {
    val s = spark
    import s.implicits._
    // 900 of 1000 rows share one hot key
    val facts = (1 to 1000).map(i => (i.toLong, if (i <= 900) "hot" else s"k$i"))
      .toDF("row_id", "key")
    val dims = (Seq("hot") ++ (901 to 1000).map(i => s"k$i")).map(k => (k, s"dim_$k"))
      .toDF("key", "attr")

    val plain = facts.join(dims, Seq("key")).select("row_id", "key", "attr")
      .collect().toSet
    val salted = SkewJoin.saltedInnerJoin(facts, dims, Seq("key"), salt = 8, col("row_id"))
      .select("row_id", "key", "attr").collect().toSet
    assert(salted == plain)

    // the hot key's rows really do land on several salt sub-keys
    val saltSpread = facts.where($"key" === "hot")
      .select(pmod(hash($"row_id"), lit(8)).as("s")).distinct().count()
    assert(saltSpread >= 6, s"900 hot rows should cover most of 8 salts, got $saltSpread")
  }
}
