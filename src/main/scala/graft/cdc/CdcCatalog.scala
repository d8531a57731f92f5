package graft.cdc

import scala.collection.concurrent.TrieMap

/** Registered source table: where its change feed lives and where its
  * changelog is written.
  *
  * ≙ the reference's runtime catalog introspection — sys.tables (:141,:183),
  * cdc.change_tables (:183,:186), sys.columns (:295) — collapsed into an
  * explicit registry (Spark has no SQL-Server-style CDC catalog to scrape).
  */
final case class CdcTableEntry(
    config: CdcTableConfig,
    feedPath: String,
    changelogPath: String)

/** Table registry with the reference's name-resolution quirks.
  *
  * usp_cdc_query_data resolves `<t>%_ChangeLog` by LIKE pattern
  * (usp_cdc_query_data.sql:33-38) while the README documents
  * `<t>_changelog` (README.md:10-13) — we resolve case-insensitively on
  * either suffix (SURVEY §7.5.7).
  */
final class CdcCatalog {
  private val tables = TrieMap.empty[String, CdcTableEntry]

  def register(entry: CdcTableEntry): Unit =
    tables.put(entry.config.tableName.toLowerCase, entry)

  def resolve(name: String): CdcTableEntry = {
    val n = name.toLowerCase
      .stripSuffix("_changelog") // covers _ChangeLog too (lowercased)
    tables.getOrElse(n, throw CdcErrors.unknownTable(name))
  }

  def list: Seq[String] = tables.keys.toSeq.sorted
}
