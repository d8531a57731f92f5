package graft.cdc

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Pins the reference semantics of the changelog transform
  * (usp_cdc_populate_changelog.sql:261-396) on hand-built feeds: mask
  * gating, UNPIVOT NULL-drop, before⋈after pairing (default vs compat),
  * NULL transitions (default vs strictNulls), truncation, sentinels, and
  * id assignment.
  */
class ChangelogBuilderSpec extends AnyFunSuite with SparkFixture {

  private val cfg = CdcTableConfig("t", Seq("k"))
  private val MaskK = 1L // bit 0 = k
  private val MaskV = 2L // bit 1 = v

  test("mask gate nulls columns whose update-mask bit is unset") {
    val feed = feedKV(Seq((1L, 0L, 3, MaskV, "1995-01-01 00:00:00", "a", "x")))
    val row = ChangelogBuilder.maskGated(feed, cfg).select("k", "v").head()
    assert(row.isNullAt(0), "k bit unset -> gated to NULL")
    assert(row.getString(1) == "x", "v bit set -> value kept (erased to string)")
  }

  test("mask gate truth table over both ordinals") {
    for ((mask, kKept, vKept) <- Seq((0L, false, false), (MaskK, true, false),
        (MaskV, false, true), (MaskK | MaskV, true, true))) {
      val feed = feedKV(Seq((1L, 0L, 3, mask, "1995-01-01 00:00:00", "a", "x")))
      val row = ChangelogBuilder.maskGated(feed, cfg).select("k", "v").head()
      assert(!row.isNullAt(0) == kKept, s"mask=$mask k")
      assert(!row.isNullAt(1) == vKept, s"mask=$mask v")
    }
  }

  test("unpivot drops NULLs: only mask-selected, non-NULL values survive") {
    val feed = feedKV(Seq(
      (1L, 0L, 3, MaskV, "1995-01-01 00:00:00", "a", "x"),
      (2L, 0L, 3, MaskV, "1995-01-01 00:00:00", "b", null))) // v set but NULL
    val long = ChangelogBuilder.unpivoted(feed, cfg).collect()
    assert(long.length == 1)
    assert(long.head.getAs[String]("column_name") == "v")
    assert(long.head.getAs[String]("value") == "x")
  }

  test("update pairs join before/after per (lsn, seqval, column, pk)") {
    val feed = feedKV(Seq(
      (1L, 0L, 3, MaskV, "1995-01-01 00:00:00", "a", "old"),
      (1L, 0L, 4, MaskV, "1995-01-01 00:00:00", "a", "new")))
    val rows = ChangelogBuilder.updatePairs(feed, cfg).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("k") == "a")
    assert(r.getAs[String]("column_name") == "v")
    assert(r.getAs[String]("old_value") == "old")
    assert(r.getAs[String]("new_value") == "new")
    assert(r.getAs[String]("table_name") == "t")
  }

  test("same-txn double update: default pairs per seqval, compat cross-matches") {
    val feed = feedKV(Seq(
      (1L, 0L, 3, MaskV, "1995-01-01 00:00:00", "a", "A"),
      (1L, 0L, 4, MaskV, "1995-01-01 00:00:00", "a", "B"),
      (1L, 1L, 3, MaskV, "1995-01-01 00:00:00", "a", "B"),
      (1L, 1L, 4, MaskV, "1995-01-01 00:00:00", "a", "C")))
    val byDefault = ChangelogBuilder.updatePairs(feed, cfg)
      .select("old_value", "new_value").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(byDefault == Set("A" -> "B", "B" -> "C"), "seqval in join key -> exact pairing")
    // compat drops seqval from the key like the reference (:361-364): 2x2 fan-out
    val compat = ChangelogBuilder.updatePairs(feed, cfg.copy(compatMode = true))
      .select("old_value", "new_value").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(compat == Set("A" -> "B", "A" -> "C", "B" -> "B", "B" -> "C"))
  }

  test("NULL transitions: default drops them (reference :321,:340), strictNulls keeps") {
    val feed = feedKV(Seq(
      // v set TO NULL
      (1L, 0L, 3, MaskV, "1995-01-01 00:00:00", "a", "x"),
      (1L, 0L, 4, MaskV, "1995-01-01 00:00:00", "a", null),
      // v set FROM NULL
      (2L, 0L, 3, MaskV, "1995-01-01 00:00:00", "b", null),
      (2L, 0L, 4, MaskV, "1995-01-01 00:00:00", "b", "y")))
    assert(ChangelogBuilder.updatePairs(feed, cfg).count() == 0,
      "inner join after NULL-drop loses both transitions, like the reference")
    val strict = ChangelogBuilder.updatePairs(feed, cfg.copy(strictNulls = true))
      .select("k", "old_value", "new_value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(strict == Set(("a", "x", null), ("b", null, "y")))
  }

  test("compatMode truncates erased values to 128 chars (VARCHAR(128), :148-150)") {
    val long = "x" * 200
    val feed = feedKV(Seq(
      (1L, 0L, 3, MaskV, "1995-01-01 00:00:00", "a", long),
      (1L, 0L, 4, MaskV, "1995-01-01 00:00:00", "a", long + "!")))
    val dflt = ChangelogBuilder.updatePairs(feed, cfg).head()
    assert(dflt.getAs[String]("old_value").length == 200, "default mode: no truncation")
    val compat = ChangelogBuilder.updatePairs(feed, cfg.copy(compatMode = true)).head()
    assert(compat.getAs[String]("old_value").length == 128)
    assert(compat.getAs[String]("new_value").length == 128)
  }

  test("sentinels: DELETED RECORD / NEW RECORD with NULL column_name (:365-386)") {
    val feed = feedKV(Seq(
      (1L, 0L, ChangeFeed.OpDelete, 3L, "1995-01-01 00:00:00", "a", "x"),
      (2L, 0L, ChangeFeed.OpInsert, 3L, "1995-01-01 00:00:00", "b", "y")))
    val rows = ChangelogBuilder.sentinels(feed, cfg).collect()
      .map(r => (r.getAs[String]("k"), r.getAs[String]("column_name"),
        r.getAs[String]("old_value"), r.getAs[String]("new_value"))).toSet
    assert(rows == Set(("a", null, "DELETED RECORD", null), ("b", null, null, "NEW RECORD")))
  }

  test("withIds assigns contiguous ids in sort order, continuing from offset") {
    val feed = feedKV(Seq(
      (1L, 0L, ChangeFeed.OpInsert, 3L, "1995-01-02 00:00:00", "b", "y"),
      (2L, 0L, ChangeFeed.OpInsert, 3L, "1995-01-01 00:00:00", "a", "x")))
    val out = ChangelogBuilder.withIds(ChangelogBuilder.build(feed, cfg), cfg, offset = 10L)
      .orderBy("changelog_id").collect()
    assert(out.map(_.getAs[Long]("changelog_id")).toSeq == Seq(11L, 12L))
    // commit_time ascending drives the order: the 01-01 insert gets the lower id
    assert(out.head.getAs[String]("k") == "a")
  }

  test("withIdsDistributed produces identical rows to withIds") {
    val feed = feedKV((1 to 40).map(i =>
      (i.toLong, 0L, ChangeFeed.OpInsert, 3L, f"1995-01-${i % 20 + 1}%02d 00:00:00", s"k$i", s"v$i")))
    val a = ChangelogBuilder.withIds(ChangelogBuilder.build(feed, cfg), cfg).collect().toSet
    val b = ChangelogBuilder.withIdsDistributed(ChangelogBuilder.build(feed, cfg), cfg).collect().toSet
    assert(a == b)
  }

  test("docs bridge feed: inserts are payload-less, update-afters carry the new text") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (10L, "alpha body", "en"), // %10=0 insert
      (18L, "beta body", "en"), // %10=8 revision
      (19L, "gamma body", "en"), (29L, "delta body", "en") // %10=9 burst
    ).toDF("doc_id", "text", "lang")
    val cfg = CdcTableConfig("documents", Seq("doc_id"))
    val cl = ChangelogBuilder.withIds(
      ChangelogBuilder.build(ChangeFeed.fromDocuments(docs), cfg), cfg)
    val textRows = cl.where(col("column_name") === "text")
      .select(col("doc_id"), col("old_value"), col("new_value"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    // the inserted doc contributes a sentinel only — no text payload
    assert(!textRows.contains("10"), "insert sentinels carry no values")
    assert(textRows("18") == (("beta body", "beta body rev2")))
    assert(textRows("19") == (("gamma body", "shared boilerplate body")))
    assert(textRows("29") == (("delta body", "shared boilerplate body")))
    // the record-level sentinel for the insert still exists
    assert(cl.where(col("doc_id") === "10" && col("column_name").isNull).count() == 1)
  }

  test("composite primary keys flow through the whole pipeline") {
    val s = spark
    import s.implicits._
    val feed = Seq(
      (1L, 0L, 3, 4L, ts("1995-01-01 00:00:00"), 7L, 2, "old"),
      (1L, 0L, 4, 4L, ts("1995-01-01 00:00:00"), 7L, 2, "new"),
      (2L, 0L, 1, 7L, ts("1995-01-02 00:00:00"), 8L, 1, "z"))
      .toDF("start_lsn", "seqval", "operation", "update_mask", "commit_time", "k1", "k2", "v")
    val ccfg = CdcTableConfig("ct", Seq("k1", "k2"))
    val out = ChangelogBuilder.withIds(ChangelogBuilder.build(feed, ccfg), ccfg)
      .orderBy("changelog_id").collect()
    assert(out.length == 2)
    val upd = out.head
    assert(upd.getAs[String]("k1") == "7" && upd.getAs[String]("k2") == "2",
      "keys erased to string and carried per-column")
    assert(upd.getAs[String]("column_name") == "v")
    val del = out(1)
    assert(del.getAs[String]("old_value") == "DELETED RECORD")
    assert(del.getAs[String]("k1") == "8" && del.getAs[String]("k2") == "1")
  }

  test("validation: >64 payload columns and missing key columns are rejected") {
    val feed = feedKV(Seq((1L, 0L, 3, 1L, "1995-01-01 00:00:00", "a", "x")))
    val bad = intercept[IllegalArgumentException] {
      ChangelogBuilder.maskGated(feed, CdcTableConfig("t", Seq("nope")))
    }
    assert(bad.getMessage.contains("must exist in feed"))
  }

  // CdcTableConfig's documented precondition: the default-mode updatePairs
  // aggregation assumes at most ONE before and ONE after image per
  // (start_lsn, seqval, column, pk). Asserted here over BOTH fixture feeds
  // so a feed change violating it fails loudly instead of silently
  // collapsing M×N pairs to one.
  test("fixture feeds: at most one image per (lsn, seqval, op, column, pk) pair key") {
    val feeds = Seq(
      ChangeFeed.fromOrders(spark.read.parquet("/root/testdata/sf0.001/orders.parquet")) ->
        CdcTableConfig("orders", Seq("o_orderkey")),
      ChangeFeed.fromLineitem(spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")) ->
        CdcTableConfig("lineitem", Seq("l_orderkey", "l_linenumber")))
    for ((feed, fcfg) <- feeds) {
      val keys = Seq("start_lsn", "seqval", "operation", "column_name") ++
        fcfg.keyCols.map(ChangelogBuilder.keyId)
      val dups = ChangelogBuilder.unpivoted(feed, fcfg)
        .groupBy(keys.map(col): _*).count().where(col("count") > 1).count()
      assert(dups == 0L, s"${fcfg.tableName}: pair-key groups with >1 image")
    }
  }
}
