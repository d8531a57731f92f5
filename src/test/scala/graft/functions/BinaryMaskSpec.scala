package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.cdc.{CdcTableConfig, ChangelogBuilder}

class BinaryMaskSpec extends AnyFunSuite with SparkFixture {

  test("binary mask bit agrees with the LongType shift path on every ordinal 0..63") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42) // deterministic corpus incl. edge masks
    val masks = Seq(0L, -1L, 1L, Long.MinValue, Long.MaxValue, 1L << 63, 0xFFL) ++
      Seq.fill(200)(rnd.nextLong())
    val bytes = masks.map { m =>
      (m, java.nio.ByteBuffer.allocate(8).putLong(m).array())
    }
    val df = bytes.toDF("lm", "bm")
    val checks = (0 until 64).flatMap { i =>
      Seq(
        (shiftright(col("lm"), i).bitwiseAND(lit(1L)) === lit(1L)).as(s"l_$i"),
        BinaryMaskBit.binaryMaskBit(col("bm"), i).as(s"b_$i"))
    }
    df.select(checks: _*).collect().foreach { r =>
      (0 until 64).foreach { i =>
        assert(r.getAs[Boolean](s"l_$i") == r.getAs[Boolean](s"b_$i"),
          s"bit $i diverged")
      }
    }
  }

  test("ordinals beyond the mask width read as unset; short masks work") {
    val s = spark
    import s.implicits._
    // 1-byte mask 0b1010_0001: bits 0,5,7 set; everything >=8 unset
    val df = Seq(Array(0xA1.toByte)).toDF("bm")
    val got = df.select(
      (Seq(0, 5, 7, 1, 6, 8, 15, 200).map(i =>
        BinaryMaskBit.binaryMaskBit(col("bm"), i).as(s"o_$i"))): _*).head()
    assert(got.getAs[Boolean]("o_0") && got.getAs[Boolean]("o_5") && got.getAs[Boolean]("o_7"))
    Seq(1, 6, 8, 15, 200).foreach(i => assert(!got.getAs[Boolean](s"o_$i"), s"ordinal $i"))
  }

  test("a >64-column feed flows through maskGated/unpivoted with a binary mask") {
    val s = spark
    import s.implicits._
    val nCols = 70
    // one update pair touching columns 0 (the key), 65 and 69 — the mask
    // needs 9 bytes, impossible to encode in a long
    def maskBytes(bits: Seq[Int]): Array[Byte] = {
      val arr = new Array[Byte](9)
      bits.foreach(b => arr(arr.length - 1 - b / 8) =
        (arr(arr.length - 1 - b / 8) | (1 << (b % 8))).toByte)
      arr
    }
    val mask = maskBytes(Seq(0, 65, 69))
    val payload = (0 until nCols).map(i => s"c_$i")
    val metaBefore = Seq[Any](10L, 0L, 3, mask, ts("1995-01-01 00:00:10"))
    val metaAfter = Seq[Any](10L, 0L, 4, mask, ts("1995-01-01 00:00:10"))
    def vals(suffix: String): Seq[Any] = (0 until nCols).map {
      case 0 => "key1"
      case i => s"v$i$suffix"
    }
    val schema = org.apache.spark.sql.types.StructType(
      Seq(
        org.apache.spark.sql.types.StructField("start_lsn", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("seqval", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("operation", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("update_mask", org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.types.StructField("commit_time", org.apache.spark.sql.types.TimestampType)) ++
        payload.map(c => org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)))
    val rows = Seq(
      org.apache.spark.sql.Row.fromSeq(metaBefore ++ vals("a")),
      org.apache.spark.sql.Row.fromSeq(metaAfter ++ vals("b")))
    val feed = s.createDataFrame(s.sparkContext.parallelize(rows), schema)
    val cfg = CdcTableConfig("wide", Seq("c_0"))
    val long = ChangelogBuilder.unpivoted(feed, cfg)
    val byCol = long.select("operation", "column_name", "value").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getString(2)).toMap
    // only the masked columns survive the NULL drop (key erased to c_0 too)
    assert(byCol.keySet.map(_._2) == Set("c_0", "c_65", "c_69"))
    assert(byCol((3, "c_65")) == "v65a" && byCol((4, "c_65")) == "v65b")
    assert(byCol((3, "c_69")) == "v69a" && byCol((4, "c_69")) == "v69b")
    // and the pairing produces old/new rows for the two non-key columns
    val pairs = ChangelogBuilder.updatePairs(feed, cfg)
      .select("column_name", "old_value", "new_value").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(pairs("c_65") == (("v65a", "v65b")) && pairs("c_69") == (("v69a", "v69b")))
  }
}
