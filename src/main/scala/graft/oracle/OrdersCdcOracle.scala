package graft.oracle

import graft.cdc.ChangeFeed

/** ANSI-SQL mirror of ChangeFeed.fromOrders + ChangelogBuilder.build for the
  * DuckDB oracle. Generated programmatically from the same column list and
  * mask constants as the Spark side so the two can't drift.
  */
object OrdersCdcOracle {
  import ChangeFeed._

  private val srcCols = OrdersCols

  private def sel(op: Int, mask: Long, seq: Long, where: String,
                  overrides: Map[String, String] = Map.empty): String = {
    val proj = srcCols.map(c => overrides.get(c).map(o => s"$o AS $c").getOrElse(c)).mkString(", ")
    s"SELECT CAST(o_orderkey AS BIGINT) AS start_lsn, CAST($seq AS BIGINT) AS seqval, " +
      s"$op AS operation, CAST($mask AS BIGINT) AS update_mask, o_orderdate AS commit_time, " +
      s"$proj FROM orders WHERE $where"
  }

  /** ≙ ChangeFeed.fromOrders — keep branch-for-branch in sync. */
  val feedSql: String = Seq(
    sel(OpInsert, AllBits, 0, "o_orderkey % 10 = 0"),
    sel(OpDelete, AllBits, 0, "o_orderkey % 10 = 1"),
    sel(OpUpdateBefore, BitStatus | BitTotal, 0, "o_orderkey % 10 IN (2,3)"),
    sel(OpUpdateAfter, BitStatus | BitTotal, 0, "o_orderkey % 10 IN (2,3)",
      Map("o_orderstatus" -> "'X'", "o_totalprice" -> "o_totalprice + 1.0")),
    sel(OpUpdateBefore, BitPrio, 0, "o_orderkey % 10 = 4"),
    sel(OpUpdateAfter, BitPrio, 0, "o_orderkey % 10 = 4",
      Map("o_orderpriority" -> "CAST(NULL AS VARCHAR)")),
    sel(OpUpdateBefore, BitStatus, 0, "o_orderkey % 10 = 5"),
    sel(OpUpdateAfter, BitStatus, 0, "o_orderkey % 10 = 5", Map("o_orderstatus" -> "'A'")),
    sel(OpUpdateBefore, BitStatus, 1, "o_orderkey % 10 = 5", Map("o_orderstatus" -> "'A'")),
    sel(OpUpdateAfter, BitStatus, 1, "o_orderkey % 10 = 5", Map("o_orderstatus" -> "'B'")),
    sel(OpUpdateBefore, BitPk | BitStatus, 0, "o_orderkey % 10 = 7"),
    sel(OpUpdateAfter, BitPk | BitStatus, 0, "o_orderkey % 10 = 7", Map("o_orderstatus" -> "'Y'"))
  ).mkString("\n  UNION ALL\n  ")

  /** Mask-gated wide→long unpivot of the update rows, as a UNION ALL per
    * column (portable; DuckDB UNPIVOT NULL semantics not relied upon). */
  private val unpivotSql: String = srcCols.zipWithIndex.map { case (c, i) =>
    s"SELECT start_lsn, seqval, operation, commit_time, " +
      s"CAST(o_orderkey AS VARCHAR) AS pk, '$c' AS column_name, " +
      s"CASE WHEN (update_mask >> $i) & 1 = 1 THEN CAST($c AS VARCHAR) END AS value FROM upd"
  }.mkString("\n    UNION ALL\n    ")

  /** Shared CTE prelude: feed → update-branch long form → pairs → sentinels. */
  val changelogCtes: String =
    s"""WITH feed AS (
       |  $feedSql
       |), upd AS (
       |  SELECT * FROM feed WHERE operation IN (3, 4)
       |), longf AS (
       |    $unpivotSql
       |), nz AS (
       |  SELECT * FROM longf WHERE value IS NOT NULL
       |), pairs AS (
       |  SELECT b.commit_time, b.pk, b.column_name, b.value AS old_value, a.value AS new_value
       |  FROM nz b JOIN nz a
       |    ON b.start_lsn = a.start_lsn AND b.seqval = a.seqval
       |   AND b.column_name = a.column_name AND b.pk = a.pk
       |  WHERE b.operation = 3 AND a.operation = 4
       |), sentinels AS (
       |  SELECT commit_time, CAST(o_orderkey AS VARCHAR) AS pk,
       |         CAST(NULL AS VARCHAR) AS column_name,
       |         'DELETED RECORD' AS old_value, CAST(NULL AS VARCHAR) AS new_value
       |  FROM feed WHERE operation = 1
       |  UNION ALL
       |  SELECT commit_time, CAST(o_orderkey AS VARCHAR),
       |         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'NEW RECORD'
       |  FROM feed WHERE operation = 2
       |), changelog AS (
       |  SELECT * FROM pairs UNION ALL SELECT * FROM sentinels
       |)""".stripMargin

  private val orderBy: String =
    "commit_time ASC, pk ASC, column_name ASC NULLS FIRST, " +
      "old_value ASC NULLS FIRST, new_value ASC NULLS FIRST"

  /** Full-pipeline oracle ≙ the flagship cdc_changelog query. */
  val changelogSql: String =
    s"""$changelogCtes
       |SELECT CAST(row_number() OVER (ORDER BY $orderBy) AS BIGINT) AS changelog_id,
       |       commit_time, 'orders' AS table_name, pk AS o_orderkey,
       |       column_name, old_value, new_value
       |FROM changelog
       |ORDER BY changelog_id""".stripMargin

  /** S1 — bounded LSN-window scan of the change feed. */
  val feedWindowSql: String =
    s"""WITH feed AS (
       |  $feedSql
       |)
       |SELECT start_lsn, seqval, operation, update_mask, commit_time
       |FROM feed
       |WHERE start_lsn > 100 AND start_lsn <= 800
       |ORDER BY start_lsn, seqval, operation""".stripMargin

  /** P1 — mask-gate projection (CASE WHEN fn_cdc_is_bit_set …). */
  val maskGateSql: String = {
    val gates = srcCols.zipWithIndex.map { case (c, i) =>
      s"CASE WHEN (update_mask >> $i) & 1 = 1 THEN CAST($c AS VARCHAR) END AS $c"
    }.mkString(", ")
    s"""WITH feed AS (
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
       |SELECT start_lsn, seqval, operation, pk, column_name, value
       |FROM nz
       |ORDER BY start_lsn, seqval, operation, column_name, value""".stripMargin

  /** J1 — before⋈after pairing. */
  val pairsSql: String =
    s"""$changelogCtes
       |SELECT commit_time, 'orders' AS table_name, pk AS o_orderkey,
       |       column_name, old_value, new_value
       |FROM pairs
       |ORDER BY commit_time, o_orderkey, column_name, old_value, new_value""".stripMargin

  /** U1-adjacent — delete/insert sentinel branches. */
  val sentinelsSql: String =
    s"""$changelogCtes
       |SELECT commit_time, 'orders' AS table_name, pk AS o_orderkey,
       |       column_name, old_value, new_value
       |FROM sentinels
       |ORDER BY commit_time, o_orderkey, old_value NULLS FIRST""".stripMargin

  /** A1/A2/A4 — window scalar aggregates (checkpoint math). */
  val windowAggSql: String =
    s"""WITH feed AS (
       |  $feedSql
       |)
       |SELECT min(commit_time) AS min_time, max(commit_time) AS max_time,
       |       count(*) AS n_changes
       |FROM feed""".stripMargin

  /** S3/P3 — time-range changelog scan at day granularity, both bounds
    * inclusive, upper bound at MIDNIGHT of to_date (the reference's
    * CONVERT(VARCHAR(10),…,101) truncation quirk). */
  val queryDataSql: String =
    s"""$changelogCtes
       |SELECT commit_time, 'orders' AS table_name, pk AS o_orderkey,
       |       column_name, old_value, new_value
       |FROM changelog
       |WHERE commit_time >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND commit_time <= TIMESTAMP '1997-06-01 00:00:00'
       |ORDER BY commit_time, o_orderkey,
       |         column_name NULLS FIRST, old_value NULLS FIRST, new_value NULLS FIRST""".stripMargin

  /** A3 — lexicographic freshness watermark over mm/dd/yyyy strings (the
    * reference's year-boundary bug, kept verbatim as the compat behavior). */
  val freshnessSql: String =
    s"""WITH feed AS (
       |  $feedSql
       |)
       |SELECT max(strftime(commit_time, '%m/%d/%Y')) AS freshness
       |FROM feed""".stripMargin
}
