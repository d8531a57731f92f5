package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class CsvSpec extends AnyFunSuite with SparkFixture {

  test("round-trip preserves delimiters, quotes, unicode, nulls and edge whitespace") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "plain text", Some(10L)),
      (2L, "comma, inside", Some(20L)),
      (3L, "a \"quoted\" phrase, with comma", Some(30L)),
      (4L, "json-ish {\"url\": \"https://x.example.com/d/1?a=b\"}", Some(40L)),
      (5L, " leading and trailing ", Some(50L)),
      (6L, "café привет 你好", Some(60L)),
      (7L, null, None),
      (8L, "", Some(0L)) // empty string must not come back as NULL
    ).toDF("id", "t", "n")
    val out = graft.TempDirs.create("graft_csv_spec").resolve("t").toString
    val rt = Csv.roundTrip(df, out)
    val a = df.orderBy("id").collect().map(r => (r.get(0), Option(r.get(1)), Option(r.get(2))))
    val b = rt.orderBy("id").collect().map(r => (r.get(0), Option(r.get(1)), Option(r.get(2))))
    assert(a.toSeq === b.toSeq)
  }
}
