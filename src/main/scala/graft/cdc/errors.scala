package graft.cdc

/** Validation failures surfaced with reference-matching message content.
  *
  * ≙ RAISERROR(msg, 16, 1) paths in the reference
  * (usp_cdc_populate_changelog.sql:217-229,416-422;
  * usp_cdc_query_data.sql:26-37,60-66).
  */
final class CdcValidationException(message: String) extends RuntimeException(message)

object CdcErrors {
  /** usp_cdc_populate_changelog.sql:217-223 */
  def toDateBeforeCheckpoint(toDate: String, fromDate: String): CdcValidationException =
    new CdcValidationException(
      s"The to date: $toDate is less than the from date: $fromDate that was last used to append the data!")

  /** usp_cdc_populate_changelog.sql:225-229 */
  def toDateBeforeMinLsn(toDate: String, minLsnDate: String): CdcValidationException =
    new CdcValidationException(
      s"The to date: $toDate is less than the minimum lsn date: $minLsnDate available in the cdc data!")

  /** usp_cdc_query_data.sql:26-30 */
  def fromNotBeforeTo(fromDate: String, toDate: String): CdcValidationException =
    new CdcValidationException(
      s"The from date: $fromDate must be less than the to date: $toDate!")

  /** usp_cdc_query_data.sql:33-37 */
  def unknownTable(table: String): CdcValidationException =
    new CdcValidationException(s"The table: $table does not exist!")
}
