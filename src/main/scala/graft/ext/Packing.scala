package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assigning documents to fixed-size context windows
  * ("bins") ahead of tokenized training — plus the deterministic
  * hash-split that precedes it in a training-data pipeline.
  *
  * Packing here is CONTIGUOUS-FILL: docs are laid out in a deterministic
  * order (doc_id) per partition key and a doc belongs to the bin where its
  * first token lands (`bin = tokens-before div binTokens`) — a bin can
  * therefore overflow by at most one doc's tokens, which is how streaming
  * packers behave. Unlike first-fit-decreasing this needs no sequential
  * state: one partitioned running sum + integer division, so it scales
  * like any windowed aggregation (partitioned by source shard).
  */
object Packing {

  /** The shared per-doc projection every stratified operator starts from:
    * (strata, doc_id as long, n_tokens as long, __h = engine-portable
    * content md5). ONE definition so the hash recipe and casts cannot
    * drift between sample/budget/packing semantics. */
  private def docStats(
      corpus: DataFrame, strataCol: String, textCol: String, idCol: String): DataFrame =
    corpus.select(col(strataCol), col(idCol).cast("long").as("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"),
      md5(col(textCol).cast("binary")).as("__h"))

  /** Cumulative tokens BEFORE each row under `order`, per stratum — the
    * contiguous-fill running sum [[packBins]] and [[tokenBudget]] share. */
  private def withTokensBefore(
      df: DataFrame, strataCol: String, order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
  }

  /** Per-(source, bin) packing summary: docs, packed tokens, fill in
    * basis points of `binTokens`. */
  def packBins(
      corpus: DataFrame,
      binTokens: Int = 512,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    withTokensBefore(
      docStats(corpus, "source", textCol, idCol), "source", Seq(col("doc_id").asc))
      .withColumn("bin", expr(s"__before div $binTokens"))
      .groupBy("source", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens_packed"))
      .withColumn("fill_bp", expr(s"n_tokens_packed * 10000 div $binTokens"))
  }

  /** Deterministic stratified sample — the training-mix step: per stratum
    * (language), keep the `num/den` fraction of documents that rank first
    * by content hash (md5, engine-portable) with doc_id tiebreak. Keep
    * rule `r * den <= n * num` is exact integer math (kept = floor(n *
    * num/den), no float rate anywhere). Both windows are PARTITIONED by
    * the stratum — per-stratum shuffles, no global funnel. Output is the
    * per-stratum audit row: totals, kept count, and the kept-id checksum.
    */
  def stratifiedSample(
      corpus: DataFrame,
      num: Int = 1,
      den: Int = 10,
      strataCol: String = "lang",
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // windows reference the PROJECTED name ("doc_id"), not idCol — the
    // docStats projection has already renamed the id column
    val rankW = Window.partitionBy(col(strataCol))
      .orderBy(col("__h"), col("doc_id"))
    val nW = Window.partitionBy(col(strataCol))
    docStats(corpus, strataCol, textCol, idCol)
      .withColumn("__r", row_number().over(rankW))
      .withColumn("__n", count(lit(1)).over(nW))
      .where(col("__r") * den <= col("__n") * num)
      .groupBy(strataCol)
      .agg(
        max(col("__n")).as("n_total"),
        count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("sum_kept_ids"))
  }

  /** Token-budget mixture capping — fill each source's token quota: docs
    * rank deterministically per source (content hash, doc_id tiebreak) and
    * a doc is kept while the cumulative tokens BEFORE it are inside the
    * budget (contiguous-fill semantics, like [[packBins]]: the last kept
    * doc may overflow by its own length — how a streaming mixer behaves).
    * One partitioned running sum, no sequential state. Output is the
    * per-source audit row (all integers). */
  def tokenBudget(
      corpus: DataFrame,
      budgetTokens: Long,
      strataCol: String = "source",
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    withTokensBefore(
      docStats(corpus, strataCol, textCol, idCol), strataCol,
      Seq(col("__h"), col("doc_id")))
      .where(col("__before") < budgetTokens)
      .groupBy(strataCol)
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("n_tokens")).as("tokens_kept"),
        sum(col("doc_id")).as("sum_kept_ids"))
  }

  /** Temperature-weighted DOMAIN MIXING — the alpha-sampling that
    * rebalances a multi-source training mix (big crawl hosts thinned,
    * small curated hosts kept), rendered in exact integers: a domain's
    * sampling weight is `floor(sqrt(n_d))` (the alpha = 0.5 temperature —
    * floor-of-double is exact for counts < 2^52, the repo's quantization
    * precedent), its quota is `budget * w_d div sum(w)` with
    * `budget = N * num div den`, and the kept docs are the quota-first
    * under the content-hash rank (md5, doc_id tiebreak — no RNG). The
    * per-domain `kept_id_sum` pins the exact kept SET, not just its size.
    *
    * Scale shape: one PARTITIONED rank window per domain + a 1-row
    * broadcast scalar join for (N, sum w) — no global sort, no collect;
    * the 100 TB path is identical because quotas derive from per-domain
    * aggregates, never from data movement across domains. */
  def domainMix(
      corpusWithMeta: DataFrame,
      budgetNum: Int = 1,
      budgetDen: Int = 2,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val d = corpusWithMeta.select(
      graft.ext.Curate.domainOf(col("meta")).as("domain"),
      col(idCol).cast("long").as("doc_id"),
      md5(col(textCol).cast("binary")).as("__h"))
    val rankW = Window.partitionBy(col("domain")).orderBy(col("__h"), col("doc_id"))
    val nW = Window.partitionBy(col("domain"))
    val ranked = d
      .withColumn("__r", row_number().over(rankW))
      .withColumn("__n", count(lit(1)).over(nW))
      .withColumn("__w", floor(sqrt(col("__n").cast("double"))).cast("long"))
    val scalars = ranked
      .groupBy("domain").agg(max(col("__n")).as("nd"), max(col("__w")).as("wd"))
      .agg(sum(col("nd")).cast("long").as("__tot"), sum(col("wd")).cast("long").as("__sumw"))
    ranked.crossJoin(broadcast(scalars))
      .withColumn("quota", graft.ext.TextOps.intDiv(
        graft.ext.TextOps.intDiv(col("__tot") * budgetNum.toLong, lit(budgetDen.toLong))
          * col("__w"),
        col("__sumw")))
      .groupBy("domain")
      .agg(
        max(col("__n")).as("n_docs"),
        max(col("__w")).as("weight"),
        max(col("quota")).as("quota"),
        count(when(col("__r") <= col("quota"), 1)).as("n_kept"),
        coalesce(sum(when(col("__r") <= col("quota"), col("doc_id"))), lit(0L))
          .as("kept_id_sum"))
  }

  /** Deterministic EPOCH RESHUFFLE — the per-epoch consumption order of
    * the packed corpus: a training run must visit the same bins in a
    * DIFFERENT (but reproducible, resumable) order each epoch. The
    * permutation key is md5("epoch:" + epoch + ":" + source + ":" + bin)
    * — seeded by the epoch, so epoch 0 and epoch 1 are independent
    * permutations, and any worker can re-derive its position without
    * coordination (the property that makes restarts and data-parallel
    * sharding trivial).
    *
    * Output: (epoch, source, bin, ord) with `ord` the bin's 1-based rank
    * within its (epoch, source) shard. Scale shape: the permutation is
    * rank-over-md5 per (epoch, source) — window partitions are bounded
    * by one source's bins, never the whole corpus, and epochs
    * parallelize; a full-corpus global order, when a trainer wants one,
    * is `ORDER BY (epoch, md5 key)` — a range-partitioned sort, no
    * window at all. */
  def epochShuffle(
      corpus: DataFrame,
      epochs: Int = 3,
      binTokens: Int = 512,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(epochs > 0, s"epochs must be positive, got $epochs")
    val bins = packBins(corpus, binTokens, textCol, idCol).select("source", "bin")
    val key = md5(concat_ws(":",
      lit("epoch"), col("epoch"), col("source"), col("bin")).cast("binary"))
    bins
      .withColumn("epoch", explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn("ord", row_number()
        .over(Window.partitionBy("epoch", "source").orderBy(key, col("bin")))
        .cast("long"))
      .select("epoch", "source", "bin", "ord")
  }

  /** Deterministic hash split (train/val/test by content hash, the
    * standard leakage-proof split): bucket = first 4 md5 hex chars mod
    * 100 → 98/1/1. Engine-portable: Spark `conv(h,16,10)` ≙ DuckDB
    * `('0x'||h)::BIGINT`. */
  def hashSplit(
      corpus: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val bucket = (conv(substring(md5(col(textCol).cast("binary")), 1, 4), 16, 10)
      .cast("long") % 100).as("bucket")
    corpus
      .select(col(idCol), size(split(col(textCol), " ")).as("n_tokens"), bucket)
      .withColumn("split",
        when(col("bucket") < 98, lit("train"))
          .when(col("bucket") < 99, lit("val"))
          .otherwise(lit("test")))
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"))
  }

  /** TEMPORAL holdout split with an EMBARGO gap — the time-series
    * complement to the content-hash and cluster-keyed splits: train on
    * the first `trainBp`/10⁴ of the TIME RANGE, drop an `embargoS`-wide
    * buffer (rows whose influence could leak across the boundary —
    * trailing windows, session carryover), test on the rest. The cut is
    * range-based (`lo + (hi − lo) · trainBp div 10⁴`), derived from one
    * aggregate and broadcast — no global sort, no unpartitioned window,
    * so the split costs one scan + one small aggregate at any scale.
    * Membership is pinned by per-split id sums, not just counts. */
  def temporalSplit(
      events: DataFrame,
      timeCol: String,
      idCol: String,
      trainBp: Long = 8000L,
      embargoS: Long = 86400L): DataFrame = {
    require(trainBp >= 0 && trainBp <= 10000, s"trainBp out of [0,10000]: $trainBp")
    val intDiv = graft.ext.TextOps.intDiv _
    val bounds = events.agg(
      min(col(timeCol)).as("__lo"), max(col(timeCol)).as("__hi"))
    events.crossJoin(bounds) // 1-row broadcast aggregate
      .withColumn("__cut",
        col("__lo") + intDiv((col("__hi") - col("__lo")) * trainBp, lit(10000L)))
      .withColumn("split",
        when(col(timeCol) <= col("__cut"), "train")
          .when(col(timeCol) <= col("__cut") + embargoS, "embargo")
          .otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_rows"),
        min(col(timeCol)).as("min_t"), max(col(timeCol)).as("max_t"),
        sum(col(idCol)).as("id_sum"))
  }
}
