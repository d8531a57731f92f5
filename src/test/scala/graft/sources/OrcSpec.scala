package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class OrcSpec extends AnyFunSuite with SparkFixture {

  test("round-trip preserves arbitrary binary, nested structs, unicode and NULLs") {
    val s = spark
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("t", StringType),
      StructField("payload", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("n", IntegerType),
        StructField("tag", StringType))))))
    // payloads deliberately NOT valid UTF-8 (0xFF 0xFE, PNG magic, zeros):
    // the binary column must survive as raw bytes, not as text
    val rows = Seq(
      Row(1L, "plain", Array[Byte](-1, -2, 0, 65), Row(4, "bin")),
      Row(2L, "café 你好", Array[Byte](-119, 0x50, 0x4e, 0x47), Row(4, "png")),
      Row(3L, null, Array.empty[Byte], Row(0, null)),
      Row(4L, "nulls", null, null))
    val df = s.createDataFrame(s.sparkContext.parallelize(rows, 2), schema)
    val out = graft.TempDirs.create("graft_orc_spec").resolve("t").toString
    val rt = Orc.roundTrip(df, out)
    def render(r: Row) = (r.getLong(0), Option(r.get(1)),
      Option(r.get(2)).map(_.asInstanceOf[Array[Byte]].toSeq),
      Option(r.get(3)).map(_.toString))
    assert(rt.orderBy("id").collect().map(render).toSeq
      === df.orderBy("id").collect().map(render).toSeq)
  }
}
