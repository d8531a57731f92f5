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
    * (integers only; ratios are derivable downstream).
    *
    * Computed in ONE pass, unlike the naive per-stage union of counts
    * (which re-scans the source and re-runs the dedup window once per
    * stage — 5 scans for a 5-stage funnel): each doc gets cumulative
    * survival flags, a single aggregation sums them, and the row-per-stage
    * shape comes from exploding the 5-element result — one scan, one
    * window shuffle, one aggregate at any scale. */
  def funnel(corpus: DataFrame, t: Thresholds = Thresholds(),
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(col(textCol), " ")
    // survival flags mirror stages() exactly, as cumulative conjunctions
    val w = Window.partitionBy(Dedup.fingerprint(col(textCol))).orderBy(col(idCol))
    val flagged = corpus
      .withColumn("__keep1", row_number().over(w) === 1)
      .withColumn("__keep2", col("__keep1") &&
        size(toks).between(t.minTokens, t.maxTokens))
      .withColumn("__keep3", col("__keep2") &&
        size(array_distinct(toks)) * t.distinctRatioDen >= size(toks) * t.distinctRatioNum)
      .withColumn("__keep4", col("__keep3") && TextOps.predLang(col(textCol)) === t.lang)
    val counts = flagged.agg(
      count(lit(1)).as("n0"),
      count(when(col("__keep1"), 1)).as("n1"),
      count(when(col("__keep2"), 1)).as("n2"),
      count(when(col("__keep3"), 1)).as("n3"),
      count(when(col("__keep4"), 1)).as("n4"))
    counts.select(explode(array(
      struct(lit("0_input").as("stage"), col("n0").as("n_rows")),
      struct(lit("1_dedup").as("stage"), col("n1").as("n_rows")),
      struct(lit("2_length").as("stage"), col("n2").as("n_rows")),
      struct(lit("3_quality").as("stage"), col("n3").as("n_rows")),
      struct(lit("4_language").as("stage"), col("n4").as("n_rows")))).as("s"))
      .select(col("s.stage"), col("s.n_rows"))
  }
}
