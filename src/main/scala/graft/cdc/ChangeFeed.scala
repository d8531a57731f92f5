package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC change-feed contract + the deterministic synthetic feed fixture.
  *
  * The engine's input is a change feed mirroring the rowset of SQL Server's
  * `fn_cdc_get_all_changes_<instance>` TVF
  * (reference: usp_cdc_populate_changelog.sql:285-292,:319): metadata columns
  * followed by the full source-row image.
  *
  * Metadata columns (FIXTURES.md B1):
  *   - `start_lsn  BIGINT`    ≙ `__$start_lsn VARBINARY(10)` — monotone per txn
  *   - `seqval     BIGINT`    ≙ `__$seqval` — order within txn
  *   - `operation  INT`       ≙ `__$operation` — 1=del, 2=ins, 3=upd-before, 4=upd-after
  *   - `update_mask BIGINT`   ≙ `__$update_mask VARBINARY` — bit i ⇔ i-th source column changed
  *   - `commit_time TIMESTAMP`≙ `fn_cdc_map_lsn_to_time(__$start_lsn)` (:278)
  *
  * All remaining columns are the source table's columns, in schema order; the
  * mask bit for a column is its ordinal in that order (≙
  * `fn_cdc_get_column_ordinal`, :305 — resolved at plan-build time here).
  */
object ChangeFeed {

  val MetaCols: Seq[String] = Seq("start_lsn", "seqval", "operation", "update_mask", "commit_time")

  val OpDelete = 1
  val OpInsert = 2
  val OpUpdateBefore = 3
  val OpUpdateAfter = 4

  /** Source (payload) columns of a feed = everything that isn't metadata,
    * in ordinal order. ≙ cursor over sys.columns (:295). */
  def sourceCols(feed: DataFrame): Seq[String] =
    feed.columns.toSeq.filterNot(MetaCols.contains)

  // ---------------------------------------------------------------------
  // Synthetic deterministic feed over the `orders` fixture (FIXTURES.md B1).
  // Pure function of `orders`; mirrored 1:1 by OrdersCdcOracle.feedSql so
  // the DuckDB oracle reproduces the identical feed.
  // ---------------------------------------------------------------------

  val OrdersCols: Seq[String] =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  // mask bit = ordinal in OrdersCols
  val BitPk: Long = 1L << 0
  val BitCust: Long = 1L << 1
  val BitStatus: Long = 1L << 2
  val BitTotal: Long = 1L << 3
  val BitDate: Long = 1L << 4
  val BitPrio: Long = 1L << 5
  val AllBits: Long = 63L

  /** Deterministic CDC feed derived from `orders` (m = o_orderkey % 10):
    *   m=0      → insert (op 2)
    *   m=1      → delete (op 1)
    *   m∈{2,3}  → update of o_orderstatus + o_totalprice
    *   m=4      → update setting o_orderpriority to NULL   (pins SURVEY §7.5.1)
    *   m=5      → same-txn double update, two seqvals      (pins SURVEY §7.5.2)
    *   m=7      → update with the PK mask bit set           (pins SURVEY §2.8)
    *   m∈{6,8,9}→ unchanged (no feed rows)
    */
  def fromOrders(orders: DataFrame): DataFrame = {
    val m = col("o_orderkey") % 10

    def branch(filter: Column, op: Int, mask: Long, seq: Long,
               overrides: Map[String, Column] = Map.empty): DataFrame =
      orders.where(filter).select(
        (Seq(
          col("o_orderkey").cast("long").as("start_lsn"),
          lit(seq).as("seqval"),
          lit(op).as("operation"),
          lit(mask).as("update_mask"),
          col("o_orderdate").as("commit_time")) ++
          OrdersCols.map(c => overrides.getOrElse(c, col(c)).as(c))): _*)

    Seq(
      branch(m === 0, OpInsert, AllBits, 0),
      branch(m === 1, OpDelete, AllBits, 0),
      branch(m.isin(2, 3), OpUpdateBefore, BitStatus | BitTotal, 0),
      branch(m.isin(2, 3), OpUpdateAfter, BitStatus | BitTotal, 0,
        Map("o_orderstatus" -> lit("X"), "o_totalprice" -> (col("o_totalprice") + lit(1.0)))),
      branch(m === 4, OpUpdateBefore, BitPrio, 0),
      branch(m === 4, OpUpdateAfter, BitPrio, 0,
        Map("o_orderpriority" -> lit(null).cast("string"))),
      branch(m === 5, OpUpdateBefore, BitStatus, 0),
      branch(m === 5, OpUpdateAfter, BitStatus, 0, Map("o_orderstatus" -> lit("A"))),
      branch(m === 5, OpUpdateBefore, BitStatus, 1, Map("o_orderstatus" -> lit("A"))),
      branch(m === 5, OpUpdateAfter, BitStatus, 1, Map("o_orderstatus" -> lit("B"))),
      branch(m === 7, OpUpdateBefore, BitPk | BitStatus, 0),
      branch(m === 7, OpUpdateAfter, BitPk | BitStatus, 0, Map("o_orderstatus" -> lit("Y")))
    ).reduce(_ unionByName _)
  }
}
