package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.cdc.{ChangeFeed, ChangelogBuilder, CdcTableConfig}

/** The full CDC→index maintenance lifecycle (ext_cdc_bm25_lifecycle /
  * ext_cdc_ann_lifecycle): the second changelog window's op semantics and
  * the result-visibility contract (a fold row must DIFFER from its
  * no-delta baseline, or the graded hash proves nothing about the fold).
  */
class CdcLifecycleSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"
  private val docsCfg = CdcTableConfig("documents", Seq("doc_id"))

  test("lifecycle feed: deletes and inserts are sentinel-only, the second " +
      "revision pairs rev2->rev3, and every LSN sits after the first window") {
    val s = spark
    import s.implicits._
    val docs = Seq((6L, "t six", "en"), (7L, "t seven", "en"), (8L, "t eight", "en"))
      .toDF("doc_id", "text", "lang")
    val cl = ChangelogBuilder.build(ChangeFeed.fromDocumentsLifecycle(docs), docsCfg)
      .collect().map(r => (r.getAs[String]("doc_id"),
        Option(r.getAs[String]("column_name")),
        Option(r.getAs[String]("old_value")), Option(r.getAs[String]("new_value"))))
      .toSet
    assert(cl === Set(
      ("7", None, Some("DELETED RECORD"), None),
      ((6L + ChangeFeed.DocsInsertOffset).toString, None, None, Some("NEW RECORD")),
      ("8", Some("text"), Some("t eight rev2"), Some("t eight rev3"))))
    val lsns = ChangeFeed.fromDocumentsLifecycle(docs)
      .select("start_lsn").collect().map(_.getLong(0))
    assert(lsns.forall(_ >= ChangeFeed.DocsLifecycleLsn))
  }

  test("bm25 lifecycle fold is result-visible over the updates-only delta " +
      "fold, and deleted docs are unretrievable") {
    val s = spark
    val life = graft.SparkEntry.queries("ext_cdc_bm25_lifecycle")(s, sf).collect()
    val base = graft.SparkEntry.queries("ext_cdc_bm25_delta")(s, sf).collect()
    assert(life.nonEmpty)
    assert(life.map(_.toSeq).toSeq != base.map(_.toSeq).toSeq,
      "the lifecycle window (inserts+deletes) must change the graded result")
    val deleted = life.map(_.getAs[Long]("doc_id"))
      .filter(id => id % 10 == 7 && id < DocFeed.ExactDupOffset)
    assert(deleted.isEmpty, s"deleted docs retrieved: ${deleted.toSeq}")
  }

  test("ann lifecycle fold is result-visible over the updates-only delta " +
      "fold, and deleted vectors are gone from the index") {
    val s = spark
    val life = graft.SparkEntry.queries("ext_cdc_ann_lifecycle")(s, sf).collect()
    val base = graft.SparkEntry.queries("ext_cdc_ann_delta")(s, sf).collect()
    assert(life.nonEmpty)
    assert(life.map(_.toSeq).toSeq != base.map(_.toSeq).toSeq,
      "the lifecycle window (inserts+deletes+negation re-embed) must change the result")
    val deleted = life.map(_.getAs[Long]("neighbor_id"))
      .filter(id => id % 10 == 7 && id < DocFeed.ExactDupOffset)
    assert(deleted.isEmpty, s"deleted vectors surfaced as neighbors: ${deleted.toSeq}")
  }
}
