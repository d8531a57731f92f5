package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.functions.ZValue

/** Z-order layout semantics: the Morton interleave's exact bit placement,
  * and the property the layout exists for — every output file covers a
  * localized rectangle in BOTH dimensions, unlike a single-column sort
  * which localizes only its leading dimension. */
class ZOrderSpec extends AnyFunSuite with SparkFixture {

  test("interleave places a's bits at even and b's at odd positions") {
    assert(ZValue.interleave(0L, 0L) == 0L)
    assert(ZValue.interleave(1L, 0L) == 1L) // bit 0 of a → z bit 0
    assert(ZValue.interleave(0L, 1L) == 2L) // bit 0 of b → z bit 1
    assert(ZValue.interleave(3L, 0L) == 5L) // 0b11 → 0b0101
    assert(ZValue.interleave(0L, 3L) == 10L) // 0b11 → 0b1010
    // full 31-bit inputs fill the 62 z bits, never the sign bit: signed
    // ordering of z stays Morton ordering
    assert(ZValue.interleave(0x7fffffffL, 0x7fffffffL) == 0x3fffffffffffffffL)
    assert(ZValue.interleave(0x7fffffffL, 0x7fffffffL) > 0L)
    // inputs are masked to 31 bits; bits above contribute nothing
    assert(ZValue.interleave(1L << 40, 0L) == 0L)
  }

  test("wide (epoch-nano-scale) domains normalize without overflow; empty input writes") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft_zwide")
    // spans ~1.7e18: the naive (x-lo)*32767 would wrap a long
    val wide = (0 until 64).map(i => (i.toLong * 27_000_000_000_000_000L, i.toLong))
      .toDF("t", "k")
    val wideDir = base.resolve("wide").toString
    ZOrder.zOrderedWrite(wide, "t", "k", wideDir, numFiles = 4)
    val back = spark.read.parquet(wideDir)
    assert(back.count() == 64)
    // files must still partition the wide dimension into ordered slices —
    // overflow would shuffle rows into arbitrary files
    val spans = back.withColumn("f", input_file_name())
      .groupBy("f").agg(min("t").as("lo"), max("t").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(spans.length > 1)
    spans.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 < lo2, "per-file wide-dim ranges must stay disjoint and ordered")
    case _ => ()
    }
    val emptyDir = base.resolve("empty").toString
    ZOrder.zOrderedWrite(wide.where(lit(false)), "t", "k", emptyDir, numFiles = 4)
    assert(spark.read.parquet(emptyDir).count() == 0)
  }

  test("z-ordered files localize BOTH dimensions; a 1-d sort smears the second") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").cast("long").as("a"), col("l_partkey").cast("long").as("b"))
    val base = Files.createTempDirectory("graft_zspec")
    val zDir = base.resolve("z").toString
    val oneDimDir = base.resolve("onedim").toString
    ZOrder.zOrderedWrite(li.select(col("a").as("l_orderkey"), col("b").as("l_partkey")),
      "l_orderkey", "l_partkey", zDir, numFiles = 16)
    // the contrast layout: range-sorted on the FIRST dimension only
    li.repartitionByRange(16, col("a")).sortWithinPartitions(col("a")).write.parquet(oneDimDir)

    def avgSpan(dir: String, dim: String): Double = {
      val spans = spark.read.parquet(dir)
        .select(col("l_orderkey").as("a"), col("l_partkey").as("b"))
        .withColumn("f", input_file_name())
        .groupBy("f").agg((max(col(dim)) - min(col(dim))).as("span"))
      spans.agg(avg("span")).head().getDouble(0)
    }
    val globalB = li.agg((max("b") - min("b")).cast("double")).head().getDouble(0)

    val zSpanB = avgSpan(zDir, "b")
    // 16 z-range files over a 2-d Morton curve → each file's box is
    // localized in both dims (~global/4 per dim); assert a loose bound
    assert(zSpanB < globalB / 2,
      s"z-order must localize the second dimension: avg span $zSpanB vs global $globalB")
    val zSpanA = avgSpan(zDir, "a")
    val globalA = li.agg((max("a") - min("a")).cast("double")).head().getDouble(0)
    assert(zSpanA < globalA / 2,
      s"z-order must localize the first dimension too: $zSpanA vs $globalA")

    // the 1-d sorted layout's SECOND-dimension span stays near-global per
    // file (computed on the original layout files, not the rewrite)
    val oneDimSpanB = {
      val spans = spark.read.parquet(oneDimDir)
        .withColumn("f", input_file_name())
        .groupBy("f").agg((max(col("b")) - min(col("b"))).as("span"))
      spans.agg(avg("span")).head().getDouble(0)
    }
    assert(oneDimSpanB > zSpanB * 2,
      s"1-d sort must smear dim b (${oneDimSpanB}) vs z-order ($zSpanB)")
  }
}
