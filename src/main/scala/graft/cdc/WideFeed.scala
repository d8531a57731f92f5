package graft.cdc

import org.apache.spark.sql.DataFrame

import graft.cdc.ChangeFeed._

/** A 72-column CDC feed exercising the BINARY update-mask path end-to-end.
  *
  * The reference's `__$update_mask` is a width-unlimited VARBINARY
  * (usp_cdc_populate_changelog.sql:305) — a source table with more than 64
  * payload columns cannot encode its mask in a BIGINT, so the bit gate must
  * address bytes. The repo's LongType fast path covers ≤64 columns; this
  * feed synthesizes a 72-column table off `orders` (6 real columns + 66
  * derived BIGINTs) whose masks set bits on BOTH sides of the 64-bit
  * boundary, driving the whole changelog build through the codegen
  * [[graft.functions.BinaryMaskBit]] expression
  * (ChangelogBuilder.maskBitSet dispatches on the mask's BinaryType).
  *
  * The derived columns are integer expressions in the Spark∩DuckDB dialect
  * intersection, shared verbatim between [[wideProjection]] (Spark
  * `selectExpr`) and the oracle's derived-table source — the two sides
  * cannot drift.
  */
object WideFeed {

  /** 66 derived columns on top of the 6 real orders columns → 72 total,
    * ordinals 0..71; w<k> has ordinal k+6. Pure integer math, identical in
    * both engines. */
  val NumDerived = 66

  val WideCols: Seq[String] = OrdersCols ++ (0 until NumDerived).map(k => s"w$k")
  require(WideCols.size == 72)

  private def derived(k: Int): String =
    s"CAST((o_orderkey * ${k + 2} + ${7 * k + 3}) % 1000 AS BIGINT)"

  /** The widened-source projection, usable as Spark selectExpr items AND as
    * a DuckDB derived-table SELECT list. */
  val wideProjection: Seq[String] =
    OrdersCols ++ (0 until NumDerived).map(k => s"${derived(k)} AS w$k")

  /** Ordinal of a wide column = its position in [[WideCols]] (≙
    * fn_cdc_get_column_ordinal over the feed schema). */
  def ordinal(c: String): Int = {
    val i = WideCols.indexOf(c)
    require(i >= 0, s"unknown wide column $c")
    i
  }

  /** Big-endian fixed-width (9-byte = 72-bit) mask hex for a set of column
    * ordinals — byte 0 is most significant, bit i lives in byte
    * length-1-i/8 at in-byte position i%8 (the BinaryMaskBit convention). */
  def maskHex(ordinals: Set[Int]): String = {
    val nBytes = (WideCols.size + 7) / 8
    val bytes = Array.fill(nBytes)(0)
    ordinals.foreach { i =>
      require(i >= 0 && i < WideCols.size, s"ordinal $i out of range")
      bytes(nBytes - 1 - i / 8) |= 1 << (i % 8)
    }
    bytes.map(b => f"$b%02x").mkString
  }

  val AllBitsHex: String = maskHex(WideCols.indices.toSet)

  /** Deterministic wide feed (m = o_orderkey % 10):
    *   m=0 → insert; m=1 → delete (mask irrelevant for sentinels)
    *   m∈{2,3} → update gating a LOW bit (o_orderstatus, ordinal 2) and two
    *             HIGH bits (w59 ordinal 65, w65 ordinal 71 — the top bit)
    *   m=4 → update whose mask sets ONLY bit 64 (w58): w58 changes AND
    *         o_orderstatus changes but is NOT masked — the high-byte gate
    *         must emit w58 and suppress the unmasked status change
    *   m=7 → update gating bit 0 (the PK, ordinal 0 — PK-in-value-list,
    *         SURVEY §2.8) together with bit 70 (w64)
    */
  val spec: FeedSpec = FeedSpec(
    table = s"(SELECT ${wideProjection.mkString(", ")} FROM orders)",
    srcCols = WideCols,
    lsn = "o_orderkey",
    branches = Seq(
      FeedBranch("o_orderkey % 10 = 0", OpInsert, 0L, 0, maskHex = Some(AllBitsHex)),
      FeedBranch("o_orderkey % 10 = 1", OpDelete, 0L, 0, maskHex = Some(AllBitsHex)),
      FeedBranch("o_orderkey % 10 IN (2, 3)", OpUpdateBefore, 0L, 0,
        maskHex = Some(maskHex(Set(ordinal("o_orderstatus"), ordinal("w59"), ordinal("w65"))))),
      FeedBranch("o_orderkey % 10 IN (2, 3)", OpUpdateAfter, 0L, 0,
        Map("o_orderstatus" -> "'X'", "w59" -> "w59 + 1", "w65" -> "w65 + 7"),
        maskHex = Some(maskHex(Set(ordinal("o_orderstatus"), ordinal("w59"), ordinal("w65"))))),
      FeedBranch("o_orderkey % 10 = 4", OpUpdateBefore, 0L, 0,
        maskHex = Some(maskHex(Set(ordinal("w58"))))),
      FeedBranch("o_orderkey % 10 = 4", OpUpdateAfter, 0L, 0,
        Map("w58" -> "w58 + 3", "o_orderstatus" -> "'Z'"),
        maskHex = Some(maskHex(Set(ordinal("w58"))))),
      FeedBranch("o_orderkey % 10 = 7", OpUpdateBefore, 0L, 0,
        maskHex = Some(maskHex(Set(ordinal("o_orderkey"), ordinal("w64"))))),
      FeedBranch("o_orderkey % 10 = 7", OpUpdateAfter, 0L, 0,
        Map("w64" -> "w64 + 11"),
        maskHex = Some(maskHex(Set(ordinal("o_orderkey"), ordinal("w64")))))))

  val cfg: CdcTableConfig = CdcTableConfig("orders_wide", Seq("o_orderkey"))

  /** The Spark-side feed: widen orders with the SAME projection strings the
    * oracle's derived table uses, then run the shared FeedSpec explode. */
  def fromOrders(orders: DataFrame): DataFrame =
    spec.toFeed(orders.selectExpr(wideProjection: _*))
}
