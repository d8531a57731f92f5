package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, TempDirs}

/** The JSONL bridge must be byte-lossless through text escaping — the
  * characters that break naive line formats (embedded newlines, quotes,
  * backslashes, non-ASCII) are exactly what a web corpus is full of. */
class JsonLinesSpec extends AnyFunSuite with SparkFixture {

  test("round-trip preserves hostile text byte-for-byte") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "plain ascii text", "en"),
      (2L, "line one\nline two\nline three", "en"),
      (3L, "quote \" backslash \\ tab\tslash /", "en"),
      (4L, "unicode: café 中文 😀 naïve", "fr"),
      (5L, "trailing space   ", "en"),
      (6L, "", "und"))
    val df = rows.toDF("doc_id", "text", "lang")
    val out = TempDirs.create("jsonl_spec").resolve("docs").toString
    val back = JsonLines.roundTrip(df, out)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(back.size == rows.size)
    rows.foreach { case (id, text, lang) =>
      assert(back(id) == ((text, lang)), s"doc $id must survive the text format")
    }
  }

  test("read is parallel-friendly: multiple part files, one frame") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
      .repartition(8)
    val out = TempDirs.create("jsonl_spec").resolve("parts").toString
    JsonLines.write(df, out)
    val files = new java.io.File(out).listFiles().count(_.getName.startsWith("part-"))
    assert(files == 8, s"one JSONL file per partition, got $files")
    val back = JsonLines.read(spark, out, df.schema)
    assert(back.count() == 100L)
    assert(back.agg(sum("doc_id")).head().getLong(0) == 5050L)
  }
}
