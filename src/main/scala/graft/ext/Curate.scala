package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the funnel a training-data pipeline runs
  * before tokenization, composed from the E1/E3 operators —
  *
  *   exact dedup → length gate → repetition (vocab-richness) gate →
  *   language gate
  *
  * Every stage is a filter over the previous one (no re-scans of the
  * source: one pipeline, predicates fused by Catalyst where possible), and
  * every threshold is integer math so the funnel is exactly mirrorable in
  * the oracle.
  */
object Curate {

  final case class Thresholds(
      minTokens: Int = 20,
      maxTokens: Int = 200,
      // keep docs with n_distinct_tokens / n_tokens >= num/den
      distinctRatioNum: Int = 1,
      distinctRatioDen: Int = 2,
      lang: String = "en")

  /** The surviving corpus after all gates. */
  def curate(corpus: DataFrame, t: Thresholds = Thresholds(),
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    stages(corpus, t, textCol, idCol).last._2

  /** (stage-name, DataFrame-after-stage) in funnel order. */
  def stages(corpus: DataFrame, t: Thresholds = Thresholds(),
      textCol: String = "text", idCol: String = "doc_id"): Seq[(String, DataFrame)] = {
    val toks = split(col(textCol), " ")
    val deduped = Dedup.dropExactDuplicates(corpus, textCol, idCol)
    val lengthOk = deduped.where(size(toks).between(t.minTokens, t.maxTokens))
    val qualityOk = lengthOk.where(
      size(array_distinct(toks)) * t.distinctRatioDen >= size(toks) * t.distinctRatioNum)
    val langOk = qualityOk.where(TextOps.predLang(col(textCol)) === t.lang)
    Seq(
      "0_input" -> corpus,
      "1_dedup" -> deduped,
      "2_length" -> lengthOk,
      "3_quality" -> qualityOk,
      "4_language" -> langOk)
  }

  /** The graded funnel report: one row per stage with its surviving count
    * (integers only; ratios are derivable downstream). */
  def funnel(corpus: DataFrame, t: Thresholds = Thresholds(),
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    stages(corpus, t, textCol, idCol)
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("n_rows")).select(lit(name).as("stage"), col("n_rows"))
      }
      .reduce(_ unionByName _)
}
