package graft.oracle

import graft.cdc.FeedSpec

/** Generic DuckDB mirror of the changelog pipeline for any [[FeedSpec]] —
  * one generator drives the orders feed, the composite-key lineitem twin,
  * and the compat variants, so Spark and oracle cannot drift per-table.
  *
  * @param joinOnSeqval default true (exact same-txn pairing); false ≙ the
  *                     reference's seqval-less join fan-out
  *                     (usp_cdc_populate_changelog.sql:361-364)
  * @param truncate128  ≙ compatMode VARCHAR(128) erasure (:148-150)
  * @param fullOuterPairs ≙ strictNulls: keep updates that set a column
  *                     TO/FROM NULL — the before⋈after pairing becomes a
  *                     FULL OUTER join, so one-sided groups survive with a
  *                     NULL old_value or new_value (the reference's inner
  *                     join drops them, :340 — SURVEY §7.5.1)
  */
final class CdcOracle(
    spec: FeedSpec,
    keyCols: Seq[String],
    tableName: String,
    joinOnSeqval: Boolean = true,
    truncate128: Boolean = false,
    fullOuterPairs: Boolean = false) {

  private val srcCols = spec.srcCols
  require(keyCols.forall(srcCols.contains))

  private def erase(e: String): String =
    if (truncate128) s"substr(CAST($e AS VARCHAR), 1, 128)" else s"CAST($e AS VARCHAR)"

  /** Bit test for ordinal `i` of the update mask. LongType masks shift a
    * BIGINT; binary masks (spec.binaryMask — the >64-column path) ride as
    * fixed-width hex strings, and the test addresses the hex char pair
    * `i/8` bytes from the END (big-endian, ≙ graft.functions.BinaryMaskBit:
    * bit i lives in byte length-1-i/8 at in-byte position i%8). */
  private def maskTest(i: Int): String =
    if (!spec.binaryMask) s"(update_mask >> $i) & 1 = 1"
    else {
      val byteFromEnd = i / 8
      s"(('0x' || substr(update_mask, len(update_mask) - ${2 * byteFromEnd + 1}, 2))::BIGINT " +
        s">> ${i % 8}) & 1 = 1"
    }

  private def pk(k: String): String = s"pk_$k"
  private val pkProj: String = keyCols.map(k => s"${erase(k)} AS ${pk(k)}").mkString(", ")
  private val pkOut: String = keyCols.map(k => s"${pk(k)} AS $k").mkString(", ")
  private val pkOrder: String = keyCols.mkString(", ")

  val feedSql: String = spec.feedSql

  /** Mask-gated wide→long unpivot of the update rows, one UNION branch per
    * column (portable; DuckDB UNPIVOT NULL semantics not relied upon). */
  private val unpivotSql: String = srcCols.zipWithIndex.map { case (c, i) =>
    s"SELECT start_lsn, seqval, operation, commit_time, $pkProj, '$c' AS column_name, " +
      s"CASE WHEN ${maskTest(i)} THEN ${erase(c)} END AS value FROM upd"
  }.mkString("\n    UNION ALL\n    ")

  private val pairJoin: String = {
    val keys = Seq("start_lsn") ++ (if (joinOnSeqval) Seq("seqval") else Nil) ++
      Seq("column_name") ++ keyCols.map(pk)
    keys.map(k => s"b.$k = a.$k").mkString(" AND ")
  }

  /** The pairs CTE: inner join (default — both images survived the NULL
    * drop) or FULL OUTER (strictNulls — one-sided groups kept with a NULL
    * value on the missing side, key columns coalesced across sides). */
  private val pairsCte: String =
    if (!fullOuterPairs) {
      val pkB = keyCols.map(k => s"b.${pk(k)}").mkString(", ")
      s"""pairs AS (
         |  SELECT b.commit_time, $pkB, b.column_name, b.value AS old_value, a.value AS new_value
         |  FROM nz b JOIN nz a
         |    ON $pairJoin
         |  WHERE b.operation = 3 AND a.operation = 4
         |)""".stripMargin
    } else {
      val pkC = keyCols.map(k => s"coalesce(b.${pk(k)}, a.${pk(k)}) AS ${pk(k)}").mkString(", ")
      s"""pairs AS (
         |  SELECT coalesce(b.commit_time, a.commit_time) AS commit_time, $pkC,
         |         coalesce(b.column_name, a.column_name) AS column_name,
         |         b.value AS old_value, a.value AS new_value
         |  FROM (SELECT * FROM nz WHERE operation = 3) b
         |  FULL OUTER JOIN (SELECT * FROM nz WHERE operation = 4) a
         |    ON $pairJoin
         |)""".stripMargin
    }

  /** CTE chain from a given feed prelude: update-branch long form → pairs →
    * sentinels → changelog. The prelude must open the WITH and define
    * `feed`. */
  private def ctesFrom(feedPrelude: String): String =
    s"""$feedPrelude, upd AS (
       |  SELECT * FROM feed WHERE operation IN (3, 4)
       |), longf AS (
       |    $unpivotSql
       |), nz AS MATERIALIZED (
       |  SELECT * FROM longf WHERE value IS NOT NULL
       |), $pairsCte, sentinels AS (
       |  SELECT commit_time, $pkProj,
       |         CAST(NULL AS VARCHAR) AS column_name,
       |         'DELETED RECORD' AS old_value, CAST(NULL AS VARCHAR) AS new_value
       |  FROM feed WHERE operation = 1
       |  UNION ALL
       |  SELECT commit_time, $pkProj,
       |         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'NEW RECORD'
       |  FROM feed WHERE operation = 2
       |), changelog AS (
       |  SELECT * FROM pairs UNION ALL SELECT * FROM sentinels
       |)""".stripMargin

  /** Shared CTE prelude: feed → update-branch long form → pairs → sentinels. */
  val changelogCtes: String = ctesFrom(
    s"""WITH feed AS MATERIALIZED (
       |  $feedSql
       |)""".stripMargin)

  /** CTE prelude for the two-batch incremental-resume drive: the feed a
    * resumed populate ACTUALLY consumes. Batch 1 takes everything up to
    * `mid`; batch 2 resumes from the sink HWM — in compat mode from
    * HWM + `gapMinutes` inclusive (usp_cdc_populate_changelog.sql:203),
    * permanently losing rows committed inside the gap; gapMinutes=0 is
    * the lossless default (strictly-greater resume, :200-211 — nothing
    * lost, the union is the whole feed). The HWM is computed from the
    * feed itself (max commit_time ≤ mid), exactly what batch 1 wrote. */
  def resumeCtes(mid: String, gapMinutes: Int): String = ctesFrom(
    if (gapMinutes == 0)
      s"""WITH feed AS MATERIALIZED (
         |  $feedSql
         |)""".stripMargin
    else
      s"""WITH rawfeed AS (
         |  $feedSql
         |), feed AS MATERIALIZED (
         |  SELECT * FROM rawfeed
         |  WHERE commit_time <= TIMESTAMP '$mid'
         |     OR commit_time >= (SELECT max(commit_time) FROM rawfeed
         |                        WHERE commit_time <= TIMESTAMP '$mid') + to_minutes($gapMinutes)
         |)""".stripMargin)

  private val idOrder: String =
    (Seq("commit_time ASC") ++ keyCols.map(k => s"${pk(k)} ASC") ++
      Seq("column_name ASC NULLS FIRST", "old_value ASC NULLS FIRST",
        "new_value ASC NULLS FIRST")).mkString(", ")

  private def changelogSelect(ctes: String): String =
    s"""$ctes
       |SELECT CAST(row_number() OVER (ORDER BY $idOrder) AS BIGINT) AS changelog_id,
       |       commit_time, '$tableName' AS table_name, $pkOut,
       |       column_name, old_value, new_value
       |FROM changelog
       |ORDER BY changelog_id""".stripMargin

  /** Full-pipeline oracle ≙ the flagship cdc_changelog query. */
  val changelogSql: String = changelogSelect(changelogCtes)

  /** Era-composable changelog rows WITHOUT ids: the whole chain as one
    * nestable statement (its WITH sits inside the consumer's CTE), so a
    * multi-era oracle (schema drift across populate windows) can UNION
    * several eras and assign ids across the union. */
  val changelogRowsSql: String =
    s"""$changelogCtes
       |SELECT commit_time, $pkOut, column_name, old_value, new_value
       |FROM changelog""".stripMargin

  /** The deterministic id-assignment ORDER BY over the OUTPUT column names
    * (for consumers that re-sort an era union). */
  val idOrderOut: String =
    (Seq("commit_time ASC") ++ keyCols.map(k => s"$k ASC") ++
      Seq("column_name ASC NULLS FIRST", "old_value ASC NULLS FIRST",
        "new_value ASC NULLS FIRST")).mkString(", ")

  /** Oracle for the two-batch resume drive (see [[resumeCtes]]). The global
    * row_number over the union IS the concatenated per-batch id sequence:
    * batch 1's commit times all precede batch 2's (the HWM separates them),
    * so per-batch sort + id-offset continuation equals one global sort. */
  def resumeChangelogSql(mid: String, gapMinutes: Int): String =
    changelogSelect(resumeCtes(mid, gapMinutes))

  /** Changelog → current-state materialization (long form): latest
    * new_value per (pk, column) by changelog_id; arg_max ≙ Spark max_by.
    *
    * CONTRACT: new_value must be NON-NULL on every column-level row —
    * true of every default-mode changelog (updatePairs filters both sides
    * non-null). With NULLs (a strictNulls changelog) the engines diverge:
    * DuckDB's arg_max SKIPS rows whose value is NULL while Spark's max_by
    * returns the NULL — grade a strictNulls state query only after
    * encoding NULL as a sentinel on both sides. */
  val stateSql: String =
    s"""WITH cl AS (
       |$changelogSql
       |)
       |SELECT $pkOrder, column_name,
       |  arg_max(new_value, changelog_id) AS last_value,
       |  max(changelog_id) AS last_change_id,
       |  count(*) AS n_changes
       |FROM cl WHERE column_name IS NOT NULL
       |GROUP BY $pkOrder, column_name
       |ORDER BY $pkOrder, column_name""".stripMargin

  /** Changelog integrity audit ≙ the ops dashboard a changelog owner
    * watches: totals, id contiguity (ids are row_number-assigned, so
    * max == count unless something was lost), per-branch row counts,
    * distinct keys. */
  val auditSql: String = {
    val keyRepr = keyCols.map(k => s"CAST($k AS VARCHAR)").mkString(" || '|' || ")
    s"""WITH cl AS (
       |$changelogSql
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(max(changelog_id) AS BIGINT) AS max_id,
       |  CAST(count(DISTINCT $keyRepr) AS BIGINT) AS n_keys,
       |  CAST(count(*) FILTER (WHERE column_name IS NOT NULL) AS BIGINT) AS n_updates,
       |  CAST(count(*) FILTER (WHERE old_value = 'DELETED RECORD') AS BIGINT) AS n_deletes,
       |  CAST(count(*) FILTER (WHERE new_value = 'NEW RECORD') AS BIGINT) AS n_inserts,
       |  CAST(CASE WHEN count(*) = max(changelog_id) THEN 1 ELSE 0 END AS BIGINT)
       |    AS ids_contiguous
       |FROM cl""".stripMargin
  }

  /** ≙ StateMaintain.stateLongStrict: the state fold over a strictNulls
    * changelog with NULLs sentinel-encoded BEFORE the argmax (DuckDB's
    * arg_max skips NULL values where Spark's max_by returns them — the
    * one place the engines' aggregate semantics genuinely diverge). */
  def stateStrictSql(sentinel: String): String =
    s"""WITH cl AS (
       |$changelogSql
       |)
       |SELECT $pkOrder, column_name,
       |  arg_max(coalesce(new_value, '$sentinel'), changelog_id) AS last_value,
       |  max(changelog_id) AS last_change_id,
       |  count(*) AS n_changes
       |FROM cl WHERE column_name IS NOT NULL
       |GROUP BY $pkOrder, column_name
       |ORDER BY $pkOrder, column_name""".stripMargin

  /** Point-in-time state ≙ StateMaintain.stateAsOf: [[stateSql]] with the
    * changelog truncated at the AS-OF commit time — the historical-version
    * reconstruction the EAV changelog exists to answer. */
  def stateAsOfSql(asOf: String): String =
    s"""WITH cl AS (
       |$changelogSql
       |)
       |SELECT $pkOrder, column_name,
       |  arg_max(new_value, changelog_id) AS last_value,
       |  max(changelog_id) AS last_change_id,
       |  count(*) AS n_changes
       |FROM cl
       |WHERE column_name IS NOT NULL AND commit_time <= TIMESTAMP '$asOf'
       |GROUP BY $pkOrder, column_name
       |ORDER BY $pkOrder, column_name""".stripMargin

  /** Wide current state ≙ ChangelogBuilder.stateWide: the inverse
    * reshaping of the unpivot, one `last_<col>` per payload column. */
  val stateWideSql: String = {
    val lastCols = srcCols.map(c =>
      s"arg_max(new_value, changelog_id) FILTER (WHERE column_name = '$c') AS last_$c")
      .mkString(",\n       |  ")
    s"""WITH cl AS (
       |$changelogSql
       |)
       |SELECT $pkOrder,
       |  $lastCols,
       |  max(changelog_id) AS last_change_id,
       |  count(*) AS n_changes
       |FROM cl WHERE column_name IS NOT NULL
       |GROUP BY $pkOrder
       |ORDER BY $pkOrder""".stripMargin
  }

  /** Changelog → SCD-type-2 column history: one row per value EPISODE of
    * a (pk, column), bounded by [valid_from_id, valid_to_id) with an open
    * end (and is_current flag) on the latest — the dimension-history
    * materialization a warehouse consumer builds from exactly this
    * changelog. Window is partitioned per (pk, column) and ordered by the
    * unique changelog_id, so lead() is total and engine-portable. */
  val scd2Sql: String = {
    val lead = s"lead(changelog_id) OVER (PARTITION BY $pkOrder, column_name ORDER BY changelog_id)"
    s"""WITH cl AS (
       |$changelogSql
       |)
       |SELECT $pkOrder, column_name, new_value AS value,
       |  changelog_id AS valid_from_id,
       |  $lead AS valid_to_id,
       |  CAST(CASE WHEN $lead IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
       |FROM cl WHERE column_name IS NOT NULL
       |ORDER BY $pkOrder, column_name, valid_from_id""".stripMargin
  }

  /** S1 — bounded LSN-window scan of the change feed. */
  val feedWindowSql: String =
    s"""WITH feed AS MATERIALIZED (
       |  $feedSql
       |)
       |SELECT start_lsn, seqval, operation, update_mask, commit_time
       |FROM feed
       |WHERE start_lsn > 100 AND start_lsn <= 800
       |ORDER BY start_lsn, seqval, operation""".stripMargin

  /** P1 — mask-gate projection (CASE WHEN fn_cdc_is_bit_set …). */
  val maskGateSql: String = {
    val gates = srcCols.zipWithIndex.map { case (c, i) =>
      s"CASE WHEN ${maskTest(i)} THEN ${erase(c)} END AS $c"
    }.mkString(", ")
    s"""WITH feed AS MATERIALIZED (
       |  $feedSql
       |), upd AS (
       |  SELECT * FROM feed WHERE operation IN (3, 4)
       |)
       |SELECT start_lsn, seqval, operation, $gates
       |FROM upd
       |ORDER BY start_lsn, seqval, operation""".stripMargin
  }

  /** R1 — unpivot wide→long with NULL drop. */
  val unpivotStageSql: String =
    s"""$changelogCtes
       |SELECT start_lsn, seqval, operation, $pkOut, column_name, value
       |FROM nz
       |ORDER BY start_lsn, seqval, operation, column_name, value""".stripMargin

  /** J1 — before⋈after pairing. */
  val pairsSql: String =
    s"""$changelogCtes
       |SELECT commit_time, '$tableName' AS table_name, $pkOut,
       |       column_name, old_value, new_value
       |FROM pairs
       |ORDER BY commit_time, $pkOrder, column_name, old_value, new_value""".stripMargin

  /** U1-adjacent — delete/insert sentinel branches. */
  val sentinelsSql: String =
    s"""$changelogCtes
       |SELECT commit_time, '$tableName' AS table_name, $pkOut,
       |       column_name, old_value, new_value
       |FROM sentinels
       |ORDER BY commit_time, $pkOrder, old_value NULLS FIRST""".stripMargin

  /** A1/A2/A4 — window scalar aggregates (checkpoint math). */
  val windowAggSql: String =
    s"""WITH feed AS MATERIALIZED (
       |  $feedSql
       |)
       |SELECT min(commit_time) AS min_time, max(commit_time) AS max_time,
       |       count(*) AS n_changes
       |FROM feed""".stripMargin

  /** S3/P3 — time-range changelog scan, both bounds inclusive. */
  def queryDataSql(from: String, to: String): String =
    s"""$changelogCtes
       |SELECT commit_time, '$tableName' AS table_name, $pkOut,
       |       column_name, old_value, new_value
       |FROM changelog
       |WHERE commit_time >= TIMESTAMP '$from'
       |  AND commit_time <= TIMESTAMP '$to'
       |ORDER BY commit_time, $pkOrder,
       |         column_name NULLS FIRST, old_value NULLS FIRST, new_value NULLS FIRST""".stripMargin

  /** Per-column change-frequency audit over the update masks ≙
    * graft.cdc.MaskStats.perColumn: per payload column, how many update
    * transactions set its mask bit and over how many distinct keys.
    * Never-touched columns report zeros. */
  val maskStatsSql: String = {
    val key = keyCols.map(k => s"CAST($k AS VARCHAR)").mkString(" || '|' || ")
    val branches = srcCols.zipWithIndex.map { case (c, i) =>
      s"""SELECT '$c' AS column_name,
         |  CAST(count(*) FILTER (WHERE ${maskTest(i)}) AS BIGINT) AS n_updates,
         |  CAST(count(DISTINCT CASE WHEN ${maskTest(i)} THEN $key END) AS BIGINT) AS n_keys
         |FROM upd4""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH feed AS MATERIALIZED (
       |  $feedSql
       |), upd4 AS (
       |  SELECT * FROM feed WHERE operation = 4
       |)
       |$branches
       |ORDER BY column_name""".stripMargin
  }

  /** Post-retention changelog ≙ graft.cdc.Retention.expire: ids assigned
    * over the FULL history (retention never reassigns), then the
    * partition-level sweep keeps only days at/after the cutoff. */
  def retentionSql(cutoffDate: String): String =
    s"""WITH cl AS (
       |$changelogSql
       |)
       |SELECT * FROM cl WHERE CAST(commit_time AS DATE) >= DATE '$cutoffDate'
       |ORDER BY changelog_id""".stripMargin

  /** State fold over the RETAINED window only ≙ the retention × state
    * contract: because ids are assigned at append and never reassigned,
    * a state bootstrapped BEFORE a partition expiry and batch-folded from
    * the post-expiry sink equals the state computed from the full history
    * restricted to retained days — this oracle IS that "before" side. */
  def stateAfterRetentionSql(cutoffDate: String): String =
    s"""WITH cl AS (
       |$changelogSql
       |)
       |SELECT $pkOrder, column_name,
       |  arg_max(new_value, changelog_id) AS last_value,
       |  max(changelog_id) AS last_change_id,
       |  count(*) AS n_changes
       |FROM cl
       |WHERE column_name IS NOT NULL AND CAST(commit_time AS DATE) >= DATE '$cutoffDate'
       |GROUP BY $pkOrder, column_name
       |ORDER BY $pkOrder, column_name""".stripMargin

  /** A3 — lexicographic freshness watermark over mm/dd/yyyy strings (the
    * reference's year-boundary bug, kept verbatim as the compat behavior). */
  val freshnessSql: String =
    s"""WITH feed AS MATERIALIZED (
       |  $feedSql
       |)
       |SELECT max(strftime(commit_time, '%m/%d/%Y')) AS freshness
       |FROM feed""".stripMargin
}
