package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING on the corpus (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units"): repeatedly find the
  * most frequent adjacent symbol pair and merge it — the loop that
  * produces a tokenizer's merge table. A data engine that prepares LLM
  * corpora should be able to train the tokenizer's vocabulary over the
  * same tables it curates.
  *
  * The 100 TB shape is the real trainer's optimization: pair statistics
  * are computed over the WORD VOCABULARY weighted by word counts, not
  * over the token stream. One corpus-sized aggregate (word → count) up
  * front; every merge round after that touches only the vocabulary table
  * (≈10⁵–10⁶ rows no matter how large the corpus), so 100× more data
  * changes only the first aggregate. Per round: one vocabulary-keyed
  * hash aggregate for pair counts, a TakeOrdered top-1 (never a global
  * sort materialization), a 1-row broadcast cross join to apply the
  * merge, and a `localCheckpoint` so round r+1 plans against a tiny
  * materialized table instead of r rounds of lineage (the kmeansAssign
  * lesson).
  *
  * Engine-portable determinism: symbol sequences are carried as
  * DELIMITED STRINGS — `|l||o||w|` for "low" — so applying a merge is
  * one `replace('|l||o|' → '|lo|')`, which both Spark and DuckDB execute
  * as the same non-overlapping left-to-right scan (exactly BPE's greedy
  * application order; `aaaa` + merge (a,a) → `aa aa`, pinned by spec).
  * The double-pipe boundary makes the pattern unambiguous for multi-char
  * symbols (`|b||c|` cannot match inside `|ab||c|`, where a single
  * delimiter would). Pre-tokenization keeps `[a-z0-9]+` words only — a
  * real trainer pre-tokenizes too, and it guarantees the delimiter
  * cannot occur inside a symbol. Tie-breaks are total: (count desc, s1
  * asc, s2 asc). All counts are exact integers.
  */
object BpeTrain {

  val DefaultRounds = 6
  val WordPattern = "^[a-z0-9]+$"

  /** The merge table after `rounds` BPE iterations: one row per round —
    * (merge_round, s1, s2, pair_count), where (s1, s2) is the pair merged
    * that round and pair_count its corpus-weighted frequency at merge
    * time. */
  def merges(corpus: DataFrame, rounds: Int = DefaultRounds, textCol: String = "text"): DataFrame = {
    require(rounds >= 1, "at least one merge round")
    // the ONLY corpus-sized step: word counts, then symbolize each word
    // as |c1||c2||...||cn|
    val vocab0 = corpus
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w").rlike(WordPattern))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(regexp_replace(col("w"), "(.)", "|$1|").as("s"), col("wc"))

    var vocab = vocab0.localCheckpoint(true)
    val perRound = Seq.newBuilder[DataFrame]
    for (r <- 1 to rounds) {
      val syms = vocab.select(col("wc"), split(expr("btrim(s, '|')"), "\\|\\|").as("a"))
      val pairCounts = syms
        .where(size(col("a")) >= 2)
        .select(col("wc"), explode(expr(
          "transform(sequence(0, size(a)-2), i -> named_struct('s1', a[i], 's2', a[i+1]))")).as("p"))
        .select(col("wc"), col("p.s1"), col("p.s2"))
        .groupBy("s1", "s2").agg(sum(col("wc")).as("pair_count"))
      // total order -> deterministic winner; limit(1) is TakeOrdered
      val top = pairCounts
        .orderBy(col("pair_count").desc, col("s1").asc, col("s2").asc)
        .limit(1)
        .localCheckpoint(true)
      perRound += top.withColumn("merge_round", lit(r))
      if (r < rounds) {
        // 1-row broadcast: every word applies this round's merge
        vocab = vocab.crossJoin(broadcast(top.select(col("s1"), col("s2"))))
          .select(expr(
            "replace(s, concat('|', s1, '||', s2, '|'), concat('|', s1, s2, '|'))").as("s"),
            col("wc"))
          .localCheckpoint(true)
      }
    }
    perRound.result().reduce(_ unionByName _)
      .select(col("merge_round"), col("s1"), col("s2"), col("pair_count"))
  }

  /** Separator inside a packed merge entry ("s1␁s2") — a control char the
    * `[a-z0-9]+` symbol alphabet cannot contain. */
  private val Sep = "\u0001"

  /** The trained merge list as a 1-row broadcastable frame (ordered by
    * round) — the tokenizer artifact every apply-side consumer rides. */
  private def mergeRowOf(mergeTable: DataFrame): DataFrame =
    mergeTable
      .agg(sort_array(collect_list(struct(col("merge_round"), col("s1"), col("s2")))).as("ml"))
      .select(transform(col("ml"),
        m => concat(m.getField("s1"), lit(Sep), m.getField("s2"))).as("ms"))

  /** Greedy merge replay of one word `w` against the merge list `ms` —
    * the per-distinct-word tokenizer application. */
  private def appliedExpr: Column = expr(
    s"""btrim(aggregate(ms, regexp_replace(w, '(.)', '|$$1|'),
       |  (acc, m) -> replace(acc,
       |    concat('|', split_part(m, '$Sep', 1), '||', split_part(m, '$Sep', 2), '|'),
       |    concat('|', split_part(m, '$Sep', 1), split_part(m, '$Sep', 2), '|'))), '|')""".stripMargin)

  /** Per-LANGUAGE vocabulary-coverage report of a trained tokenizer —
    * the acceptance gate a tokenizer ships through before a training
    * run: word count, OOV count (words outside [[WordPattern]] — the
    * pass-through fallback lane), subword count, and the two integer
    * ratios a tokenizer report quotes (OOV share and subword fan-out,
    * basis points, engine-exact integer division). Same scale shape as
    * [[encode]]: the merge replay runs once per DISTINCT word, docs join
    * the encoded vocabulary on the word key, one hash aggregate per
    * language. */
  def vocabCoverage(
      corpus: DataFrame,
      mergeTable: DataFrame,
      textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    val words = corpus.select(col(langCol).as("lang"),
      explode(split(col(textCol), " ")).as("w"))
    val encVocab = words.select("w").distinct()
      .crossJoin(broadcast(mergeRowOf(mergeTable)))
      .withColumn("__oov", !col("w").rlike(WordPattern))
      .withColumn("__subs",
        when(!col("__oov"), split(appliedExpr, "\\|\\|"))
          .otherwise(array(col("w"))))
      .select(col("w"), col("__oov"), size(col("__subs")).cast("long").as("n_sub"))
    words.join(encVocab, Seq("w"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("__oov"), 1L).otherwise(0L)).as("n_oov"),
        sum(col("n_sub")).as("n_subwords"))
      .select(col("lang"), col("n_words"), col("n_oov"), col("n_subwords"),
        graft.ext.TextOps.intDiv(col("n_oov") * 10000L, col("n_words")).as("oov_bp"),
        graft.ext.TextOps.intDiv(col("n_subwords") * 10000L, col("n_words")).as("fanout_bp"))
  }

  /** ENCODE the corpus with a trained merge table — the tokenizer's
    * apply side: each word replays the merges in training order (BPE's
    * greedy application), yielding its subword sequence. Output per doc:
    * word count, subword count, and an md5 fingerprint of the
    * space-joined subword stream in document order.
    *
    * Scale shape: the merge replay (an interpreted `aggregate` HOF fold
    * over ≤`rounds` entries) runs once per DISTINCT word — vocabulary-
    * sized, like training — and docs join the encoded vocabulary on the
    * word key; the only corpus-sized steps are the word explode and one
    * per-doc hash aggregate. The merge table rides in as a 1-row
    * broadcast (list ordered by round), never a driver-side collect.
    * Words outside [[WordPattern]] pass through whole as single OOV
    * tokens (a real pre-tokenizer's fallback lane). */
  def encode(
      corpus: DataFrame,
      mergeTable: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val mergeRow = mergeRowOf(mergeTable)
    val words = corpus.select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
    val applied = appliedExpr
    val encVocab = words.select("w").distinct()
      .crossJoin(broadcast(mergeRow))
      .withColumn("__subs",
        when(col("w").rlike(WordPattern), split(applied, "\\|\\|"))
          .otherwise(array(col("w"))))
      .select(col("w"), concat_ws(" ", col("__subs")).as("sub_str"),
        size(col("__subs")).cast("long").as("n_sub"))
    words.join(encVocab, Seq("w"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_subwords"),
        md5(concat_ws(" ",
          transform(sort_array(collect_list(struct(col("pos"), col("sub_str")))),
            _.getField("sub_str"))).cast("binary")).as("fp_subwords"))
  }

  /** DECODE round-trip — the tokenizer's LOSSLESSNESS contract, graded as
    * an identity: subwords are substrings of their word (merges only ever
    * join adjacent symbols), so stripping the intra-word separators and
    * re-joining words in position order must reproduce the original text
    * byte-for-byte — OOV words (the [[WordPattern]] fallback lane) pass
    * through whole and empty tokens from repeated spaces survive the
    * posexplode, so the identity holds for EVERY document, not just clean
    * ones. Output: (doc_id, n_words, decoded_fp, src_fp); the oracle is
    * simply md5(text) twice — any encode/decode asymmetry hash-mismatches.
    * Same scale shape as [[encode]]: vocabulary-sized merge application,
    * per-doc reassembly sorts only the doc's own words. */
  def decodeRoundTrip(
      corpus: DataFrame,
      mergeTable: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val mergeRow = mergeRowOf(mergeTable)
    val words = corpus.select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
    val applied = appliedExpr
    val decVocab = words.select("w").distinct()
      .crossJoin(broadcast(mergeRow))
      .withColumn("__subs",
        when(col("w").rlike(WordPattern), split(applied, "\\|\\|"))
          .otherwise(array(col("w"))))
      // decode of one word = its subwords re-concatenated, no separator
      .select(col("w"), concat_ws("", col("__subs")).as("dec_w"))
    words.join(decVocab, Seq("w"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_words"),
        md5(concat_ws(" ",
          transform(sort_array(collect_list(struct(col("pos"), col("dec_w")))),
            _.getField("dec_w"))).cast("binary")).as("decoded_fp"))
      .join(corpus.select(col(idCol),
        md5(col(textCol).cast("binary")).as("src_fp")), Seq(idCol))
      .select(col(idCol), col("n_words"), col("decoded_fp"), col("src_fp"))
  }
}
