package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.ext.{Dedup, DocFeed}

class NfcNormalizeSpec extends AnyFunSuite with SparkFixture {

  test("decomposed accents compose; composed and ASCII text pass through unchanged") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("café", "café"), // NFD -> NFC
      ("café", "café"), // already composed
      ("plain ascii", "plain ascii"),
      ("äö", "äö"), // umlauts
      ("", "")).toDF("raw", "want")
    val bad = df
      .select(NfcNormalize.nfcNormalize(col("raw")).as("got"), col("want"))
      .where(col("got") =!= col("want"))
    assert(bad.count() === 0)
  }

  test("normalization is idempotent and NULL-propagating") {
    val s = spark
    import s.implicits._
    val df = Seq(Some("résumé"), Some("x"), None).toDF("t")
    val out = df.select(
      NfcNormalize.nfcNormalize(NfcNormalize.nfcNormalize(col("t"))).as("twice"),
      NfcNormalize.nfcNormalize(col("t")).as("once")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getString(0) == r.getString(1))
    }
    assert(out.count(_.isNullAt(0)) === 1)
  }

  test("normalized dedup collapses the planted NFC/NFD pair but not distinct texts") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "shared body" + DocFeed.AccentNfc),
      (2L, "shared body" + DocFeed.AccentNfd), // canonically equal to 1
      (3L, "shared body"), // prefix only - distinct
      (4L, "other text"),
      (5L, "other text") // byte-exact dup of 4
    ).toDF("doc_id", "text")
    val groups = Dedup.normalizedExactGroups(corpus)
      .where(col("n_copies") > 1).orderBy("keep_id").collect()
    assert(groups.map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies"),
      r.getAs[Long]("n_raw_forms"))).toSeq ===
      Seq((1L, 2L, 2L), (4L, 2L, 1L)))
  }
}
