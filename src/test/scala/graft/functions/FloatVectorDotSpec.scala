package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.functions.FloatVectorDot.floatVectorDot

class FloatVectorDotSpec extends AnyFunSuite with SparkFixture {

  test("matches the HOF formulation bit-for-bit on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)
    val diff = emb.select(
      (floatVectorDot(col("embedding"), col("embedding")) - hof).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff == 0.0d, "sequential double summation must be identical")
  }

  test("length mismatch and NULL elements yield NULL; NULL input yields NULL") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("mismatch", Array(1.0f, 2.0f), Array(1.0f)),
      ("nullelem", Array(1.0f, 2.0f), null.asInstanceOf[Array[Float]]),
      ("ok", Array(1.0f, 2.0f), Array(3.0f, 4.0f)))
      .toDF("case", "a", "b")
    val got = df.select(col("case"), floatVectorDot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got("mismatch").isEmpty)
    assert(got("nullelem").isEmpty)
    assert(got("ok").contains(11.0d))
  }

  test("registered for SQL via GraftExtensions") {
    val dot = spark.sql(
      "SELECT float_vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head().getDouble(0)
    assert(dot == 11.0d)
    val topk = spark.sql(
      """SELECT top_k_by_score(s, id, 2) AS ids FROM VALUES
        |  (0.1D, 1L), (0.9D, 2L), (0.5D, 3L) AS t(s, id)""".stripMargin)
      .head().getAs[scala.collection.Seq[Long]]("ids").toSeq
    assert(topk == Seq(2L, 3L))
  }

  test("participates in codegen evaluation without falling back") {
    val s = spark
    import s.implicits._
    // 1000 rows through the expression — would throw on codegen bugs and
    // silently fall back only with a WARN; the value check is the contract
    val n = Seq.fill(1000)((Array(0.5f, 0.5f), Array(2.0f, 2.0f))).toDF("a", "b")
      .select(floatVectorDot(col("a"), col("b")).as("d"))
      .where(col("d") === 2.0d).count()
    assert(n == 1000)
  }
}
