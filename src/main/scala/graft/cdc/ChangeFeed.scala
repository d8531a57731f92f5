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

  /** Deterministic CDC feed over `orders` (m = o_orderkey % 10):
    *   m=0      → insert (op 2)
    *   m=1      → delete (op 1)
    *   m∈{2,3}  → update of o_orderstatus + o_totalprice
    *   m=4      → update setting o_orderpriority to NULL   (pins SURVEY §7.5.1)
    *   m=5      → same-txn double update, two seqvals      (pins SURVEY §7.5.2)
    *   m=7      → update with the PK mask bit set           (pins SURVEY §2.8)
    *   m∈{6,8,9}→ unchanged (no feed rows)
    *
    * start_lsn = o_orderkey; commit_time = base + lsn seconds (monotone in
    * lsn, adjacent txns in the same minute — FeedSpec scaladoc).
    */
  val ordersSpec: FeedSpec = FeedSpec(
    table = "orders",
    srcCols = OrdersCols,
    lsn = "o_orderkey",
    branches = Seq(
      FeedBranch("o_orderkey % 10 = 0", OpInsert, AllBits, 0),
      FeedBranch("o_orderkey % 10 = 1", OpDelete, AllBits, 0),
      FeedBranch("o_orderkey % 10 IN (2, 3)", OpUpdateBefore, BitStatus | BitTotal, 0),
      FeedBranch("o_orderkey % 10 IN (2, 3)", OpUpdateAfter, BitStatus | BitTotal, 0,
        Map("o_orderstatus" -> "'X'", "o_totalprice" -> "o_totalprice + 1.0")),
      FeedBranch("o_orderkey % 10 = 4", OpUpdateBefore, BitPrio, 0),
      FeedBranch("o_orderkey % 10 = 4", OpUpdateAfter, BitPrio, 0,
        Map("o_orderpriority" -> "NULL")),
      FeedBranch("o_orderkey % 10 = 5", OpUpdateBefore, BitStatus, 0),
      FeedBranch("o_orderkey % 10 = 5", OpUpdateAfter, BitStatus, 0, Map("o_orderstatus" -> "'A'")),
      FeedBranch("o_orderkey % 10 = 5", OpUpdateBefore, BitStatus, 1, Map("o_orderstatus" -> "'A'")),
      FeedBranch("o_orderkey % 10 = 5", OpUpdateAfter, BitStatus, 1, Map("o_orderstatus" -> "'B'")),
      FeedBranch("o_orderkey % 10 = 7", OpUpdateBefore, BitPk | BitStatus, 0),
      FeedBranch("o_orderkey % 10 = 7", OpUpdateAfter, BitPk | BitStatus, 0,
        Map("o_orderstatus" -> "'Y'"))))

  def fromOrders(orders: DataFrame): DataFrame = ordersSpec.toFeed(orders)

  /** Retention fixture: same branches, LSNs spaced ×256 so commit_time
    * (base + lsn seconds) crosses DAY boundaries at every SF — a
    * partition-level retention sweep needs multiple `commit_date`
    * partitions to exist before it can drop any. Orderkeys are dense from
    * 1, so sf0.001's ~1500 orders span ~4.4 days; the Jan-3 cutoff drops
    * two days and keeps the rest at every SF. */
  val ordersRetentionSpec: FeedSpec = ordersSpec.copy(lsn = "o_orderkey * 256")

  def fromOrdersRetention(orders: DataFrame): DataFrame = ordersRetentionSpec.toFeed(orders)

  /** CDC feed over the DOCUMENTS corpus — the bridge fixture between the
    * changelog pipeline and the curation operators (production training
    * corpora are commonly maintained FROM an OLTP change feed): 80% of
    * docs arrive as inserts (payload-less sentinels, :377-386), doc_id%10=8
    * docs get a text revision (unique new content), doc_id%10=9 docs are
    * all overwritten with one shared boilerplate body (a within-batch
    * duplicate burst). The update-after rows carry the new text in the
    * EAV changelog — the changelog IS the corpus delta. */
  val DocsCols: Seq[String] = Seq("doc_id", "text", "lang")
  val BitDocText: Long = 1L << 1
  val DocsAllBits: Long = 7L
  val docsSpec: FeedSpec = FeedSpec(
    table = "documents",
    srcCols = DocsCols,
    lsn = "doc_id",
    branches = Seq(
      FeedBranch("doc_id % 10 <= 7", OpInsert, DocsAllBits, 0),
      FeedBranch("doc_id % 10 = 8", OpUpdateBefore, BitDocText, 0),
      FeedBranch("doc_id % 10 = 8", OpUpdateAfter, BitDocText, 0,
        Map("text" -> "text || ' rev2'")),
      FeedBranch("doc_id % 10 = 9", OpUpdateBefore, BitDocText, 0),
      FeedBranch("doc_id % 10 = 9", OpUpdateAfter, BitDocText, 0,
        Map("text" -> "'shared boilerplate body'"))))

  def fromDocuments(docs: DataFrame): DataFrame = docsSpec.toFeed(docs)

  /** The documents feed's SECOND activity window — the full index-
    * maintenance lifecycle the CDC→index bridges fold (inserts AND deletes,
    * not just revisions). LSNs sit strictly after every [[docsSpec]]
    * transaction ([[DocsLifecycleLsn]] + doc_id > max doc_id), so the two
    * windows union into ONE monotone changelog stream and a maintenance
    * consumer takes this window with a plain commit-time predicate — the
    * reference's windowed-consumption contract
    * (usp_cdc_query_data.sql:9-70) applied to derived-state maintenance.
    *
    * Branches (m = doc_id % 10): m=7 docs are DELETED (sentinel-only rows,
    * :365-376 — the changelog carries no payload for record ops); m=6 docs
    * spawn a NEW document keyed doc_id + [[DocsInsertOffset]] (sentinel-only
    * too, :377-386 — consumers must FETCH inserted content from the source
    * by key, which is why the index folds do pointed lookups, never a
    * rescan); m=8 docs get a SECOND revision (old value = the ' rev2' text
    * the first window left behind). */
  val DocsLifecycleLsn = 50000000L
  val DocsInsertOffset = 30000000L
  val docsLifecycleSpec: FeedSpec = FeedSpec(
    table = "documents",
    srcCols = DocsCols,
    lsn = s"doc_id + $DocsLifecycleLsn",
    branches = Seq(
      FeedBranch("doc_id % 10 = 7", OpDelete, DocsAllBits, 0),
      FeedBranch("doc_id % 10 = 6", OpInsert, DocsAllBits, 0,
        Map("doc_id" -> s"doc_id + $DocsInsertOffset",
          "text" -> "text || ' fresh'")),
      FeedBranch("doc_id % 10 = 8", OpUpdateBefore, BitDocText, 0,
        Map("text" -> "text || ' rev2'")),
      FeedBranch("doc_id % 10 = 8", OpUpdateAfter, BitDocText, 0,
        Map("text" -> "text || ' rev3'"))))

  def fromDocumentsLifecycle(docs: DataFrame): DataFrame = docsLifecycleSpec.toFeed(docs)

  /** Deterministic LATER SNAPSHOT of `orders` for [[SnapshotDiff]] — the
    * snapshot-shaped restatement of [[ordersSpec]]'s m-conventions
    * (m = o_orderkey % 10): m=1 rows are gone (deletes), m∈{2,3} carry
    * o_orderstatus='X' and o_totalprice+1.0, m=4 has o_orderpriority
    * NULLed (the NULL-transition case the batch pipeline only sees under
    * strictNulls), and one NEW row per m=0 keyed `-o_orderkey` (inserts;
    * negation cannot collide with real keys). Mirrored 1:1 by
    * OrdersCdcOracle.snapshotDiffSql. */
  def ordersSnapshotAfter(orders: DataFrame): DataFrame =
    orders.where(expr("o_orderkey % 10 <> 1"))
      .withColumn("o_orderstatus",
        when(expr("o_orderkey % 10 IN (2, 3)"), lit("X")).otherwise(col("o_orderstatus")))
      .withColumn("o_totalprice",
        when(expr("o_orderkey % 10 IN (2, 3)"), col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderpriority",
        when(expr("o_orderkey % 10 = 4"), lit(null).cast("string"))
          .otherwise(col("o_orderpriority")))
      .unionByName(orders.where(expr("o_orderkey % 10 = 0"))
        .withColumn("o_orderkey", -col("o_orderkey")))

  // ---------------------------------------------------------------------
  // Additive schema drift: a column that starts existing mid-stream.
  // ---------------------------------------------------------------------

  /** The EAV changelog's schema-evolution story (SURVEY §1.2): because the
    * output is (column_name, old_value, new_value) rows, ADDING a source
    * column needs no DDL on the sink — a new `column_name` simply starts
    * appearing. The reference would re-generate its dynamic SQL from
    * sys.columns on the next run (usp_cdc_populate_changelog.sql:295) and
    * its changelog table likewise absorbs the column with zero ALTERs.
    *
    * This spec models the drift INSIDE one feed: `o_clerk` (a derived
    * 7th column, ordinal 6) exists in the schema throughout, but its mask
    * bit is only ever SET for transactions after [[DriftLsn]] — before
    * that LSN the column is never emitted, exactly what a CDC stream whose
    * source gained a column mid-history looks like to consumers. */
  val DriftLsn = 700L
  val BitClerk: Long = 1L << 6
  val DriftCols: Seq[String] = OrdersCols :+ "o_clerk"

  /** Derived clerk value, shared VERBATIM between the Spark projection and
    * the oracle's derived-table source (the WideFeed pattern) — `||` with
    * an integer operand coerces to string in both dialects. */
  val ClerkProjection = "'C' || (o_orderkey % 97) AS o_clerk"

  val ordersDriftSpec: FeedSpec = FeedSpec(
    table = s"(SELECT orders.*, $ClerkProjection FROM orders)",
    srcCols = DriftCols,
    lsn = "o_orderkey",
    branches = Seq(
      // inserts/deletes carry the all-columns mask OF THEIR ERA: bit 6
      // exists only for transactions after the column appeared — same
      // split as the update branches (sentinel rows carry no column
      // values, so the mask is the only place the era shows)
      FeedBranch(s"o_orderkey % 10 = 0 AND o_orderkey <= $DriftLsn", OpInsert, AllBits, 0),
      FeedBranch(s"o_orderkey % 10 = 0 AND o_orderkey > $DriftLsn",
        OpInsert, AllBits | BitClerk, 0),
      FeedBranch(s"o_orderkey % 10 = 1 AND o_orderkey <= $DriftLsn", OpDelete, AllBits, 0),
      FeedBranch(s"o_orderkey % 10 = 1 AND o_orderkey > $DriftLsn",
        OpDelete, AllBits | BitClerk, 0),
      // pre-drift updates: identical to ordersSpec — bit 6 never set
      FeedBranch(s"o_orderkey % 10 IN (2, 3) AND o_orderkey <= $DriftLsn",
        OpUpdateBefore, BitStatus | BitTotal, 0),
      FeedBranch(s"o_orderkey % 10 IN (2, 3) AND o_orderkey <= $DriftLsn",
        OpUpdateAfter, BitStatus | BitTotal, 0,
        Map("o_orderstatus" -> "'X'", "o_totalprice" -> "o_totalprice + 1.0")),
      // post-drift updates additionally change the NEW column
      FeedBranch(s"o_orderkey % 10 IN (2, 3) AND o_orderkey > $DriftLsn",
        OpUpdateBefore, BitStatus | BitTotal | BitClerk, 0),
      FeedBranch(s"o_orderkey % 10 IN (2, 3) AND o_orderkey > $DriftLsn",
        OpUpdateAfter, BitStatus | BitTotal | BitClerk, 0,
        Map("o_orderstatus" -> "'X'", "o_totalprice" -> "o_totalprice + 1.0",
          "o_clerk" -> "'C' || ((o_orderkey + 1) % 97)")),
      FeedBranch("o_orderkey % 10 = 4", OpUpdateBefore, BitPrio, 0),
      FeedBranch("o_orderkey % 10 = 4", OpUpdateAfter, BitPrio, 0,
        Map("o_orderpriority" -> "NULL"))))

  def fromOrdersDrift(orders: DataFrame): DataFrame =
    ordersDriftSpec.toFeed(orders.selectExpr("*", ClerkProjection))

  // ---------------------------------------------------------------------
  // NON-additive schema drift: a column that STOPS existing mid-stream.
  // ---------------------------------------------------------------------

  /** The other half of the sys.columns-re-read contract
    * (usp_cdc_populate_changelog.sql:295): because the reference
    * regenerates its dynamic SQL from the CURRENT source schema every run,
    * a DROPPED column silently vanishes from all subsequent populate
    * windows — no error, no tombstone — while history keeps its EAV rows
    * under the old name (the sink needs no DDL either way).
    *
    * Era model: `o_orderpriority` (ordinal 5 — deliberately the LAST
    * column, so the surviving ordinals 0..4 are identical under both SQL
    * Server's gap-preserving column_id and a compacted re-read) exists
    * through [[DropLsn]] and is gone after. Era-2 feeds simply lack the
    * column: [[ChangelogBuilder.maskGated]] derives its column list from
    * the feed schema, which IS the re-read. The m=4 branch (whose only
    * payload was the dropped column) cannot exist post-drop. */
  val DropLsn = 700L
  val PostDropCols: Seq[String] = OrdersCols.filterNot(_ == "o_orderpriority")
  val PostDropAllBits: Long = 31L // bits 0..4 — the all-columns mask of era 2

  private def restrict(spec: FeedSpec, cond: String): FeedSpec =
    spec.copy(branches = spec.branches.map(b => b.copy(cond = s"(${b.cond}) AND $cond")))

  /** Era 1: the standard orders feed at/before the drop, plus an m=6
    * branch (unused by [[ordersSpec]]) updating o_orderpriority to a
    * NON-NULL value — the witness that history KEEPS the dropped column's
    * EAV rows (the m=4 NULL-transition rows are dropped by the default
    * inner pairing and would leave the name unobserved). */
  val ordersPreDropSpec: FeedSpec = {
    val r = restrict(ordersSpec, s"o_orderkey <= $DropLsn")
    r.copy(branches = r.branches ++ Seq(
      FeedBranch(s"o_orderkey % 10 = 6 AND o_orderkey <= $DropLsn", OpUpdateBefore, BitPrio, 0),
      FeedBranch(s"o_orderkey % 10 = 6 AND o_orderkey <= $DropLsn", OpUpdateAfter, BitPrio, 0,
        Map("o_orderpriority" -> "'5-LOW'"))))
  }

  /** Era 2: the re-read schema — five columns, five mask bits, no m=4. */
  val ordersPostDropSpec: FeedSpec = FeedSpec(
    table = "orders",
    srcCols = PostDropCols,
    lsn = "o_orderkey",
    branches = Seq(
      FeedBranch(s"o_orderkey % 10 = 0 AND o_orderkey > $DropLsn", OpInsert, PostDropAllBits, 0),
      FeedBranch(s"o_orderkey % 10 = 1 AND o_orderkey > $DropLsn", OpDelete, PostDropAllBits, 0),
      FeedBranch(s"o_orderkey % 10 IN (2, 3) AND o_orderkey > $DropLsn",
        OpUpdateBefore, BitStatus | BitTotal, 0),
      FeedBranch(s"o_orderkey % 10 IN (2, 3) AND o_orderkey > $DropLsn",
        OpUpdateAfter, BitStatus | BitTotal, 0,
        Map("o_orderstatus" -> "'X'", "o_totalprice" -> "o_totalprice + 1.0")),
      FeedBranch(s"o_orderkey % 10 = 5 AND o_orderkey > $DropLsn", OpUpdateBefore, BitStatus, 0),
      FeedBranch(s"o_orderkey % 10 = 5 AND o_orderkey > $DropLsn", OpUpdateAfter, BitStatus, 0,
        Map("o_orderstatus" -> "'A'")),
      FeedBranch(s"o_orderkey % 10 = 5 AND o_orderkey > $DropLsn", OpUpdateBefore, BitStatus, 1,
        Map("o_orderstatus" -> "'A'")),
      FeedBranch(s"o_orderkey % 10 = 5 AND o_orderkey > $DropLsn", OpUpdateAfter, BitStatus, 1,
        Map("o_orderstatus" -> "'B'")),
      FeedBranch(s"o_orderkey % 10 = 7 AND o_orderkey > $DropLsn",
        OpUpdateBefore, BitPk | BitStatus, 0),
      FeedBranch(s"o_orderkey % 10 = 7 AND o_orderkey > $DropLsn",
        OpUpdateAfter, BitPk | BitStatus, 0, Map("o_orderstatus" -> "'Y'"))))

  def fromOrdersPreDrop(orders: DataFrame): DataFrame = ordersPreDropSpec.toFeed(orders)

  /** The era-2 feed frame has NO o_orderpriority column at all — consumers
    * see the re-read schema, exactly like the regenerated TVF rowset. */
  def fromOrdersPostDrop(orders: DataFrame): DataFrame = ordersPostDropSpec.toFeed(orders)

  // ---------------------------------------------------------------------
  // TYPE-CHANGE drift: a column whose type changes mid-stream RE-ERASES.
  // ---------------------------------------------------------------------

  /** The third clause of the sys.columns-re-read contract
    * (usp_cdc_populate_changelog.sql:295 with the CONVERT at :271-277): a
    * column whose TYPE changes mid-stream re-erases under the new type in
    * all subsequent windows — same name, same mask bit, different
    * rendering. History keeps the old rendering; nothing migrates.
    *
    * Era model: o_totalprice is DOUBLE through [[TypeChangeLsn]]
    * (erasure "124.45") and BIGINT after (an ALTER to integer cents-less
    * pricing; erasure "124"). The floor projection is written in the
    * Spark∩DuckDB dialect intersection; the update override adds an
    * INTEGER 1 so the override's type stays BIGINT on both engines. */
  val TypeChangeLsn = 700L

  private val TypedOrders =
    "(SELECT o_orderkey, o_custkey, o_orderstatus, " +
      "CAST(floor(o_totalprice) AS BIGINT) AS o_totalprice, " +
      "o_orderdate, o_orderpriority FROM orders)"

  /** Era 1: the standard orders feed at/before the type change. */
  val ordersPreTypeSpec: FeedSpec = restrict(ordersSpec, s"o_orderkey <= $TypeChangeLsn")

  /** Era 2: same branches, same ordinals — the SOURCE re-read now carries
    * o_totalprice as BIGINT (the m∈{2,3} override becomes `+ 1`, integer
    * in both dialects). */
  val ordersPostTypeSpec: FeedSpec = {
    val r = restrict(ordersSpec, s"o_orderkey > $TypeChangeLsn")
    r.copy(
      table = TypedOrders,
      branches = r.branches.map { b =>
        if (b.overrides.contains("o_totalprice"))
          b.copy(overrides = b.overrides + ("o_totalprice" -> "o_totalprice + 1"))
        else b
      })
  }

  def fromOrdersPreType(orders: DataFrame): DataFrame = ordersPreTypeSpec.toFeed(orders)

  def fromOrdersPostType(orders: DataFrame): DataFrame =
    ordersPostTypeSpec.toFeed(orders.selectExpr("o_orderkey", "o_custkey", "o_orderstatus",
      "CAST(floor(o_totalprice) AS BIGINT) AS o_totalprice", "o_orderdate", "o_orderpriority"))

  // ---------------------------------------------------------------------
  // RENAME drift: the column re-reads under a NEW name, same ordinal.
  // ---------------------------------------------------------------------

  /** The fourth clause of the sys.columns-re-read contract
    * (usp_cdc_populate_changelog.sql:295): `sp_rename` PRESERVES
    * column_id, so a renamed column keeps its ordinal and therefore its
    * update-mask bit — subsequent windows simply erase the same source
    * column under the NEW name. History keeps the old-name EAV rows; no
    * migration, no tombstone, no sink DDL (rename is the drift class that
    * changes NEITHER the branch set nor the mask bits — only the string
    * in column_name).
    *
    * Era model: `o_orderpriority` re-reads as `o_priority_class` after
    * [[RenameLsn]]. Era 1 reuses [[ordersPreDropSpec]] (its m=6 witness
    * pins the OLD name in history); era 2 is the same standard feed with
    * the column renamed in the re-read projection plus the m=6 witness
    * under the NEW name — same BitPrio bit on both sides. */
  val RenameLsn: Long = DropLsn
  val RenamedCols: Seq[String] =
    OrdersCols.map(c => if (c == "o_orderpriority") "o_priority_class" else c)
  private val RenamedOrders =
    "(SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, " +
      "o_orderpriority AS o_priority_class FROM orders)"

  val ordersPostRenameSpec: FeedSpec = {
    val r = restrict(ordersSpec, s"o_orderkey > $RenameLsn")
    r.copy(
      table = RenamedOrders,
      srcCols = RenamedCols,
      branches = r.branches.map { b =>
        b.overrides.get("o_orderpriority") match {
          case Some(v) => b.copy(
            overrides = (b.overrides - "o_orderpriority") + ("o_priority_class" -> v))
          case None => b
        }
      } ++ Seq(
        FeedBranch(s"o_orderkey % 10 = 6 AND o_orderkey > $RenameLsn",
          OpUpdateBefore, BitPrio, 0),
        FeedBranch(s"o_orderkey % 10 = 6 AND o_orderkey > $RenameLsn",
          OpUpdateAfter, BitPrio, 0, Map("o_priority_class" -> "'5-LOW'"))))
  }

  def fromOrdersPostRename(orders: DataFrame): DataFrame =
    ordersPostRenameSpec.toFeed(orders.selectExpr(
      "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
      "o_orderpriority AS o_priority_class"))

  // ---------------------------------------------------------------------
  // Key-LIFECYCLE fixture: updated-then-DELETED and delete-then-REINSERTED
  // keys, for the delete-aware live-rows state materialization.
  // ---------------------------------------------------------------------

  /** Two phases (separate transactions per key — phase 2's lsn offsets by
    * 1,000,000 so each key's later events genuinely commit later):
    * phase 1 updates m=8 keys and deletes m=9; phase 2 deletes m=8 and
    * REINSERTS + updates m=9. m∈{2,3} stay the live update-only control.
    * The fold that ignores deletes (the EAV audit, [[StateMaintain
    * .stateLong]]) keeps m=8's history; the LIVE materialization
    * ([[StateMaintain.stateLive]]) must drop m=8 and resurrect m=9. */
  val ordersLifecyclePhase1: FeedSpec = FeedSpec(
    table = "orders",
    srcCols = OrdersCols,
    lsn = "o_orderkey",
    branches = Seq(
      FeedBranch("o_orderkey % 10 = 8", OpUpdateBefore, BitStatus, 0),
      FeedBranch("o_orderkey % 10 = 8", OpUpdateAfter, BitStatus, 0,
        Map("o_orderstatus" -> "'D'")),
      FeedBranch("o_orderkey % 10 = 9", OpDelete, AllBits, 0),
      FeedBranch("o_orderkey % 10 IN (2, 3)", OpUpdateBefore, BitStatus | BitTotal, 0),
      FeedBranch("o_orderkey % 10 IN (2, 3)", OpUpdateAfter, BitStatus | BitTotal, 0,
        Map("o_orderstatus" -> "'X'", "o_totalprice" -> "o_totalprice + 1.0"))))

  val ordersLifecyclePhase2: FeedSpec = FeedSpec(
    table = "orders",
    srcCols = OrdersCols,
    lsn = "o_orderkey + 1000000",
    branches = Seq(
      FeedBranch("o_orderkey % 10 = 8", OpDelete, AllBits, 0),
      FeedBranch("o_orderkey % 10 = 9", OpInsert, AllBits, 0),
      FeedBranch("o_orderkey % 10 = 9", OpUpdateBefore, BitStatus, 1),
      FeedBranch("o_orderkey % 10 = 9", OpUpdateAfter, BitStatus, 1,
        Map("o_orderstatus" -> "'Z'"))))

  def fromOrdersLifecycle(orders: DataFrame): DataFrame =
    ordersLifecyclePhase1.toFeed(orders)
      .unionByName(ordersLifecyclePhase2.toFeed(orders))

  // ---------------------------------------------------------------------
  // Composite-PK twin over `lineitem` (FIXTURES.md B1; reference composite
  // key split usp_cdc_populate_changelog.sql:82-133). Key =
  // (l_orderkey, l_linenumber); start_lsn = l_orderkey*8 + l_linenumber
  // (monotone per order, unique per line).
  // ---------------------------------------------------------------------

  val LineitemCols: Seq[String] = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")

  private def liBit(c: String): Long = 1L << LineitemCols.indexOf(c)
  val LiAllBits: Long = (1L << LineitemCols.size) - 1

  /** m = (l_orderkey * 7 + l_linenumber) % 10 spreads ops across lines of
    * the same order; includes the same pinned edge cases as the orders
    * feed (NULL transition, double update, PK-bit update). */
  val lineitemSpec: FeedSpec = FeedSpec(
    table = "lineitem",
    srcCols = LineitemCols,
    lsn = "l_orderkey * 8 + l_linenumber",
    branches = {
      def m(v: String) = s"(l_orderkey * 7 + l_linenumber) % 10 $v"
      Seq(
        FeedBranch(m("= 0"), OpInsert, LiAllBits, 0),
        FeedBranch(m("= 1"), OpDelete, LiAllBits, 0),
        FeedBranch(m("IN (2, 3)"), OpUpdateBefore, liBit("l_quantity") | liBit("l_extendedprice"), 0),
        FeedBranch(m("IN (2, 3)"), OpUpdateAfter, liBit("l_quantity") | liBit("l_extendedprice"), 0,
          Map("l_quantity" -> "l_quantity + 1.0", "l_extendedprice" -> "l_extendedprice + 2.0")),
        FeedBranch(m("= 4"), OpUpdateBefore, liBit("l_returnflag"), 0),
        FeedBranch(m("= 4"), OpUpdateAfter, liBit("l_returnflag"), 0,
          Map("l_returnflag" -> "NULL")),
        FeedBranch(m("= 5"), OpUpdateBefore, liBit("l_linestatus"), 0),
        FeedBranch(m("= 5"), OpUpdateAfter, liBit("l_linestatus"), 0, Map("l_linestatus" -> "'A'")),
        FeedBranch(m("= 5"), OpUpdateBefore, liBit("l_linestatus"), 1, Map("l_linestatus" -> "'A'")),
        FeedBranch(m("= 5"), OpUpdateAfter, liBit("l_linestatus"), 1, Map("l_linestatus" -> "'B'")),
        FeedBranch(m("= 7"), OpUpdateBefore, liBit("l_linenumber") | liBit("l_linestatus"), 0),
        FeedBranch(m("= 7"), OpUpdateAfter, liBit("l_linenumber") | liBit("l_linestatus"), 0,
          Map("l_linestatus" -> "'Y'")))
    },
    dedupKeys = Seq("l_orderkey", "l_linenumber"))

  def fromLineitem(lineitem: DataFrame, materializeDedup: Boolean = false): DataFrame =
    lineitemSpec.toFeed(lineitem, materializeDedup)
}
