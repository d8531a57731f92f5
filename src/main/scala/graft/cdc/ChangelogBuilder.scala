package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Per-source-table configuration for the changelog pipeline.
  *
  * @param tableName  logical name written into changelog.table_name
  *                   (≙ constant 'dbo.&lt;t&gt;', usp_cdc_populate_changelog.sql:279)
  * @param keyCols    primary-key columns (≙ @tablePK comma-split, :82-85);
  *                   composite keys supported
  * @param compatMode bug-for-bug fidelity with the reference: join key drops
  *                   `seqval` (:361-364 — same-txn multi-updates cross-match),
  *                   values truncated to 128 chars (VARCHAR(128), :148-150),
  *                   checkpoint resumes from max+1min (:203)
  * @param strictNulls keep updates that set a column TO/FROM NULL (the
  *                   reference's UNPIVOT+INNER JOIN silently drops them,
  *                   :321,:340 — SURVEY §7.5.1); uses a full-outer join
  *
  * PRECONDITION on the feed (default mode): at most ONE before image
  * (op=3) and ONE after image (op=4) per (start_lsn, seqval, column, pk) —
  * what SQL Server CDC itself guarantees per transaction
  * (usp_cdc_populate_changelog.sql:340). [[ChangelogBuilder.updatePairs]]
  * exploits it to collapse the before⋈after join into a single-pass
  * conditional aggregation; a feed violating it silently collapses to one
  * pair (max per side) where the reference's inner join would fan out
  * M×N. Feed authors: ChangelogBuilderSpec's "at most one image per pair
  * key" test shows how to assert the precondition over a new feed.
  */
final case class CdcTableConfig(
    tableName: String,
    keyCols: Seq[String],
    compatMode: Boolean = false,
    strictNulls: Boolean = false)

/** The reference's generated INSERT…SELECT re-expressed as one declarative
  * DataFrame tree (SURVEY §3.2; generated text usp_cdc_populate_changelog
  * .sql:261-396):
  *
  * {{{
  * Sort(commit_time, pk…, column_name)                        :390-394
  * └── UnionAll                                               :365, :376
  *     ├── UPDATE: Join(inner, lsn+seqval+column+pk)          :340,:361-364
  *     │     ├── before: Unpivot(old) ∘ maskGate ∘ op=3       :302-321
  *     │     └── after:  Unpivot(new) ∘ maskGate ∘ op=4       :353-354
  *     ├── DELETE sentinels ('DELETED RECORD')                :366-375
  *     └── INSERT sentinels ('NEW RECORD')                    :377-386
  * }}}
  *
  * Every stage is a pure `DataFrame => DataFrame`; Catalyst does predicate
  * placement, column pruning and join-strategy selection (SURVEY §4), so the
  * reference's manual text-level optimizations need no hand-rolling. The
  * whole tree touches the feed exactly twice (pairs via one aggregation
  * pass, sentinels via one filtered scan) — see PlanAudit.
  */
object ChangelogBuilder {
  import ChangeFeed._

  /** Output value columns common to all branches. */
  val ValueCols: Seq[String] = Seq("column_name", "old_value", "new_value")

  def keyId(k: String): String = s"__key_$k"

  /** Type erasure ≙ CONVERT(SQL_VARIANT → VARCHAR(128)) (:271-277,:103-109).
    * Truncation to 128 chars only in compatMode (it is a VARCHAR(128)
    * artifact, not a semantic goal — SURVEY §1.3). */
  def erase(c: Column, cfg: CdcTableConfig): Column = {
    val s = c.cast("string")
    if (cfg.compatMode) substring(s, 1, 128) else s
  }

  /** ≙ fn_cdc_is_bit_set(fn_cdc_get_column_ordinal(inst, col), __$update_mask)
    * (:304-305). Ordinal resolves at plan-build time from the feed schema;
    * the bit test dispatches on the mask's type: LongType masks (≤64
    * payload columns) are plain codegen'd integer ops; BinaryType masks
    * (≙ the reference's width-unlimited VARBINARY, :305) go through the
    * codegen [[graft.functions.BinaryMaskBit]] expression — big-endian, so
    * the two encodings agree bit-for-bit (BinaryMaskSpec property). */
  def maskBitSet(ordinal: Int, maskType: org.apache.spark.sql.types.DataType = LongType): Column =
    maskType match {
      case org.apache.spark.sql.types.BinaryType =>
        graft.functions.BinaryMaskBit.binaryMaskBit(col("update_mask"), ordinal)
      case _ => shiftright(col("update_mask"), ordinal).bitwiseAND(lit(1L)) === lit(1L)
    }

  /** Stage 1 — mask-gate projection over the update rows (:302-310): null
    * out columns whose mask bit is unset, erase survivors to string (one
    * common type is what lets heterogeneous columns share a single unpivoted
    * value column — ≙ the SQL_VARIANT trick, :291-292,:307). */
  def maskGated(feed: DataFrame, cfg: CdcTableConfig): DataFrame = {
    val srcCols = sourceCols(feed)
    val ordinal = srcCols.zipWithIndex.toMap
    val maskType = feed.schema("update_mask").dataType
    require(maskType == org.apache.spark.sql.types.BinaryType || srcCols.size <= 64,
      s"a LongType update_mask supports <=64 payload columns, got ${srcCols.size}; " +
        "use a BinaryType mask for wider tables")
    require(cfg.keyCols.forall(srcCols.contains), s"key columns ${cfg.keyCols} must exist in feed")
    feed.where(col("operation").isin(OpUpdateBefore, OpUpdateAfter)).select(
      (MetaCols.map(col) ++
        cfg.keyCols.map(k => erase(col(k), cfg).as(keyId(k))) ++
        srcCols.map(c => when(maskBitSet(ordinal(c), maskType), erase(col(c), cfg)).as(c))): _*)
  }

  /** Stage 2 — wide → long (:321,:354). Spark's unpivot keeps NULLs; the
    * explicit filter replicates T-SQL UNPIVOT's NULL drop — the mechanism
    * that keeps only mask-selected columns (SURVEY §2.8). PK columns
    * participate as value columns too (IN-list includes all columns, :329). */
  def unpivoted(feed: DataFrame, cfg: CdcTableConfig): DataFrame = {
    val srcCols = sourceCols(feed)
    val keyIds = cfg.keyCols.map(keyId)
    maskGated(feed, cfg)
      .unpivot(
        (MetaCols ++ keyIds).map(col).toArray,
        srcCols.map(col).toArray,
        "column_name", "value")
      .where(col("value").isNotNull)
  }

  /** Stage 3 — before⋈after pairing (:340,:361-364), one row per
    * (transaction, key, changed column) carrying old_value + new_value.
    *
    * Default mode pairs per `(start_lsn, seqval, column, pk)` — and since
    * CDC emits at most ONE before and ONE after image per such key, the
    * equi-join collapses into a single-pass conditional AGGREGATION: one
    * scan, one shuffle, map-side partial aggregation, instead of a
    * self-join reading the feed twice. The inner-join semantics (a pair
    * survives only when both sides survived the NULL-drop) become a
    * post-aggregation filter; `strictNulls` keeps one-sided groups
    * (≙ full-outer).
    *
    * compatMode drops seqval from the key like the reference (:361-364),
    * whose POINT is the many-to-many fan-out across same-transaction
    * updates — only expressible as a real join, so it keeps the shuffled
    * self-join (both sides equal-size: correctly not broadcast). */
  def updatePairs(feed: DataFrame, cfg: CdcTableConfig): DataFrame = {
    val keyIds = cfg.keyCols.map(keyId)
    val long = unpivoted(feed, cfg)
    if (!cfg.compatMode) {
      val groupKeys = Seq("start_lsn", "seqval", "column_name") ++ keyIds
      val agged = long
        .groupBy(groupKeys.map(col): _*)
        .agg(
          max(col("commit_time")).as("commit_time"),
          max(when(col("operation") === OpUpdateBefore, col("value"))).as("old_value"),
          max(when(col("operation") === OpUpdateAfter, col("value"))).as("new_value"))
      val paired =
        if (cfg.strictNulls) agged
        else agged.where(col("old_value").isNotNull && col("new_value").isNotNull)
      paired.select(
        (Seq(col("commit_time"), lit(cfg.tableName).as("table_name")) ++
          cfg.keyCols.map(k => col(keyId(k)).as(k)) ++
          ValueCols.map(col)): _*)
    } else {
      val joinKeys = Seq("start_lsn", "column_name") ++ keyIds
      val before = long.where(col("operation") === OpUpdateBefore)
        .select(joinKeys.map(col) ++
          Seq(col("commit_time").as("__b_ct"), col("value").as("old_value")): _*)
      val after = long.where(col("operation") === OpUpdateAfter)
        .select(joinKeys.map(col) ++
          Seq(col("commit_time").as("__a_ct"), col("value").as("new_value")): _*)
      val joinType = if (cfg.strictNulls) "full_outer" else "inner"
      before.join(after, joinKeys, joinType).select(
        (Seq(coalesce(col("__b_ct"), col("__a_ct")).as("commit_time"),
          lit(cfg.tableName).as("table_name")) ++
          cfg.keyCols.map(k => col(keyId(k)).as(k)) ++
          ValueCols.map(col)): _*)
    }
  }

  /** Stage 4 — DELETE/INSERT record-level sentinel rows (:365-386):
    * column_name NULL, old_value='DELETED RECORD' / new_value='NEW RECORD'.
    * The reference generates two UNION'd SELECTs over the change table;
    * one filtered scan with a conditional projection is equivalent and
    * halves the feed reads. */
  def sentinels(feed: DataFrame, cfg: CdcTableConfig): DataFrame =
    feed.where(col("operation").isin(OpDelete, OpInsert)).select(
      (Seq(col("commit_time"), lit(cfg.tableName).as("table_name")) ++
        cfg.keyCols.map(k => erase(col(k), cfg).as(k)) ++
        Seq(lit(null).cast("string").as("column_name"),
          when(col("operation") === OpDelete, lit("DELETED RECORD"))
            .otherwise(lit(null).cast("string")).as("old_value"),
          when(col("operation") === OpInsert, lit("NEW RECORD"))
            .otherwise(lit(null).cast("string")).as("new_value"))): _*)

  /** The full changelog transform: updates ∪ sentinels (:365,:376).
    * Output: commit_time, table_name, one string column per key,
    * column_name, old_value, new_value — unsorted, no surrogate id (see
    * [[withIds]] / [[withIdsDistributed]]). */
  def build(feed: DataFrame, cfg: CdcTableConfig): DataFrame =
    updatePairs(feed, cfg).unionByName(sentinels(feed, cfg))

  /** The reference's changelog ordering (:390-394) is (commit_time, pk…,
    * column_name); we add old/new value as final tiebreakers so the order —
    * and therefore surrogate-id assignment — is total and deterministic
    * (the reference's ties fall to SQL Server's nondeterministic sort). */
  def sortColumns(cfg: CdcTableConfig): Seq[Column] =
    Seq(col("commit_time").asc_nulls_first) ++
      cfg.keyCols.map(k => col(k).asc_nulls_first) ++
      Seq(col("column_name").asc_nulls_first,
        col("old_value").asc_nulls_first,
        col("new_value").asc_nulls_first)

  /** Changelog → WIDE current state: one row per key, one `last_<col>`
    * column per payload column holding its latest new_value by
    * changelog_id — the inverse reshaping of [[unpivoted]] (EAV long →
    * wide), i.e. what a consumer materializes to mirror the source table.
    * One hash aggregation; `max_by(...) FILTER (WHERE ...)` is the
    * engine-portable conditional argmax (DuckDB: `arg_max` + FILTER).
    *
    * Input contract: default-mode changelogs only (new_value non-null on
    * column rows) — max_by and DuckDB's arg_max disagree on NULL values,
    * see the oracle-side note in CdcOracle.stateSql. */
  def stateWide(changelogWithIds: DataFrame, cfg: CdcTableConfig, srcCols: Seq[String]): DataFrame = {
    val lastCols = srcCols.map(c =>
      expr(s"max_by(new_value, changelog_id) FILTER (WHERE column_name = '$c')")
        .as(s"last_$c"))
    changelogWithIds
      .where(col("column_name").isNotNull)
      .groupBy(cfg.keyCols.map(col): _*)
      .agg(lastCols.head, (lastCols.tail :+
        max(col("changelog_id")).as("last_change_id") :+
        count(lit(1)).as("n_changes")): _*)
  }

  /** Surrogate id ≙ BIGINT IDENTITY(1,1) + insert ORDER BY (:144,:390-394):
    * row_number over the batch sort + a persisted per-table running offset.
    * The single-partition window is bounded by MICRO-BATCH size, not table
    * size (SURVEY §7.5.4) — use [[withIdsDistributed]] for huge batches. */
  def withIds(changelog: DataFrame, cfg: CdcTableConfig, offset: Long = 0L): DataFrame =
    changelog.withColumn("changelog_id",
      (row_number().over(Window.orderBy(sortColumns(cfg): _*)) + lit(offset)).cast(LongType))

  /** Scale path for huge batches: global sort (range-partitioned, stays
    * distributed) then zipWithIndex — contiguous ids without funnelling the
    * batch through one window partition. Costs one extra job (zipWithIndex's
    * partition-count pass) and an RDD boundary; only worth it when a batch
    * outgrows a single task. */
  def withIdsDistributed(changelog: DataFrame, cfg: CdcTableConfig, offset: Long = 0L): DataFrame = {
    val spark = changelog.sparkSession
    val sorted = changelog.orderBy(sortColumns(cfg): _*)
    val outSchema = StructType(sorted.schema.fields :+
      StructField("changelog_id", LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L + offset))
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
