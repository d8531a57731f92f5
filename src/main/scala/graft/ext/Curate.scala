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
      // Gopher-style intra-doc repetition gate: keep docs whose duplicate
      // word-trigram share is at most this many basis points
      maxDupTrigramBp: Int = 200,
      lang: String = "en",
      // optional model gate: keep docs whose fastText-shape linear score
      // (TextOps.modelScoreCol, integer centi-weights) is ≥ this; None
      // leaves the funnel purely heuristic (the graded default)
      minModelScore: Option[Int] = None)

  /** The three row-local gate predicates after dedup, in funnel order —
    * the SINGLE definition both [[stages]] (and therefore [[curate]]) and
    * [[funnel]] evaluate, so the graded funnel counts always describe the
    * pipeline curate() actually runs. */
  private def gates(t: Thresholds, textCol: String): Seq[(String, org.apache.spark.sql.Column)] = {
    val toks = split(col(textCol), " ")
    Seq(
      "2_length" -> size(toks).between(t.minTokens, t.maxTokens),
      "3_quality" ->
        (size(array_distinct(toks)) * t.distinctRatioDen >= size(toks) * t.distinctRatioNum),
      "4_repetition" -> (TextOps.dupTrigramBp(col(textCol)) <= t.maxDupTrigramBp),
      "5_language" -> (TextOps.predLang(col(textCol)) === t.lang)) ++
      t.minModelScore.map(ms =>
        "6_model" -> (TextOps.modelScoreCol(col(textCol)) >= ms)).toSeq
  }

  /** E3k — cross-document LINE-level dedup (the C4/CCNet sweep: a line
    * occurring in ≥ `minDocs` DISTINCT documents is boilerplate/duplicated
    * content and is removed from EVERY document, preserving the order of
    * the surviving lines). Output per doc: line counts and the md5
    * fingerprint of the surviving text, so the graded row proves the
    * reconstruction, not just the counts.
    *
    * Scale shape: one explode to (doc, pos, line), one hash aggregate for
    * the cross-corpus line document-frequency, one join back on the line
    * hash, and one per-doc aggregate whose ordered reassembly is a
    * sort_array over the doc's OWN lines (bounded by doc length — never a
    * global sort). The df side is the same inverted-index shape as the
    * shingle families. */
  def lineDedup(corpus: DataFrame, minDocs: Int = 2): DataFrame = {
    val lines = corpus.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
    val dfq = lines.groupBy("line").agg(countDistinct("doc_id").as("__nd"))
    lines.join(dfq, Seq("line"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__nd") < minDocs, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__nd") >= minDocs, 1L).otherwise(0L)).as("n_removed"),
        // collect_list skips the NULLs the unsatisfied `when` produces;
        // sort_array orders by the leading struct field = original pos
        sort_array(collect_list(
          when(col("__nd") < minDocs, struct(col("pos"), col("line"))))).as("__kl"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("n_removed"),
        md5(concat_ws("\n", transform(col("__kl"), _.getField("line"))).cast("binary"))
          .as("kept_fp"))
  }

  /** The surviving corpus after all gates. */
  def curate(corpus: DataFrame, t: Thresholds = Thresholds(),
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    stages(corpus, t, textCol, idCol).last._2

  /** (stage-name, DataFrame-after-stage) in funnel order. */
  def stages(corpus: DataFrame, t: Thresholds = Thresholds(),
      textCol: String = "text", idCol: String = "doc_id"): Seq[(String, DataFrame)] = {
    val deduped = Dedup.dropExactDuplicates(corpus, textCol, idCol)
    gates(t, textCol).foldLeft(
      Seq("0_input" -> corpus, "1_dedup" -> deduped)) {
      case (acc, (name, cond)) => acc :+ (name -> acc.last._2.where(cond))
    }
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
    // survival flags = the SAME gate predicates stages() filters on
    // (dedup survival is representative-independent: all gates are
    // functions of the text, identical across a fingerprint group)
    val w = Window.partitionBy(Dedup.fingerprint(col(textCol))).orderBy(col(idCol))
    val named = gates(t, textCol)
    val flagged = named.map(_._2).zipWithIndex.foldLeft(
      corpus.withColumn("__keep1", row_number().over(w) === 1)) {
      case (df, (cond, i)) => df.withColumn(s"__keep${i + 2}", col(s"__keep${i + 1}") && cond)
    }
    val nFlags = named.size + 1 // dedup + one per gate
    val counts = flagged.agg(
      count(lit(1)).as("n0"),
      (1 to nFlags).map(i => count(when(col(s"__keep$i"), 1)).as(s"n$i")): _*)
    val stageNames = Seq("0_input", "1_dedup") ++ named.map(_._1)
    counts.select(explode(array(stageNames.zipWithIndex.map { case (nm, i) =>
      struct(lit(nm).as("stage"), col(s"n$i").as("n_rows")) }: _*)).as("s"))
      .select(col("s.stage"), col("s.n_rows"))
  }

  /** Benchmark decontamination — flag training documents that share any
    * word shingle with the held-out eval set (doc_id ≡ `evalResidue` mod
    * `evalMod` stands in for a benchmark table): the standard n-gram
    * overlap check run before any training job, so eval answers cannot
    * leak into the training mix. In production the shingle is 10–13
    * tokens; the fixture's [[Dedup.ShingleLen]]-gram keeps the oracle
    * shared with the dedup family.
    *
    * Scale shape: a hash join keyed on the shingle — the eval side is
    * pre-reduced to DISTINCT shingles (tiny vs the corpus), never an
    * all-pairs document comparison. Output: one row per contaminated
    * train doc with its count of distinct shared shingles.
    */
  def decontaminate(
      corpus: DataFrame,
      evalMod: Int = 97,
      evalResidue: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val sh = Dedup.shingles(corpus, textCol, idCol)
    val isEval = col("id") % evalMod === evalResidue
    val evalSh = sh.where(isEval).select("sh").distinct()
    sh.where(!isEval)
      // sh is distinct per (id, shingle) and evalSh per shingle, so the
      // join fans out at most 1:1 and count(*) = distinct shared shingles
      .join(evalSh, Seq("sh"))
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Per-EVAL-DOC contamination score — [[decontaminate]] answers "which
    * TRAIN docs are tainted"; this answers the benchmark owner's dual:
    * how much of each eval document's content already appears in the
    * training corpus. For every eval doc: its distinct-shingle count, how
    * many of those shingles occur in ANY train doc, and the contaminated
    * share in basis points (exact integer division, engine-portable).
    * A 10000-bp eval doc is fully memorizable from train; the standard
    * report before trusting a benchmark number.
    *
    * Scale shape: one shingle-keyed left join of the (small) eval shingle
    * set against the DISTINCT train shingle index — the corpus is never
    * self-joined and the output is one row per eval doc. */
  def contaminationScores(
      corpus: DataFrame,
      evalMod: Int = 97,
      evalResidue: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val sh = Dedup.shingles(corpus, textCol, idCol)
    val isEval = col("id") % evalMod === evalResidue
    val trainSh = sh.where(!isEval).select("sh").distinct()
      .withColumn("__hit", lit(1))
    sh.where(isEval)
      .join(trainSh, Seq("sh"), "left")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("__hit")).as("n_contaminated"))
      .withColumn("contamination_bp",
        TextOps.intDiv(col("n_contaminated") * 10000, col("n_shingles")))
  }

  // -------------------------------------------------------------------
  // Bloom-filter decontamination — the constant-memory probe
  // -------------------------------------------------------------------

  /** Bloom filter geometry: 2^18 bits packed into 32-bit words = 32 KiB,
    * four hash lanes from ONE md5 digest per shingle (the same
    * [[graft.functions.Md5Lanes]] family MinHash and count-min use, so the
    * DuckDB oracle reproduces every bit). Sized so the eval side of the
    * fixture (~2k distinct shingles × 4 lanes) fills ~3% of the bits —
    * deterministic false positives are possible in principle and identical
    * across engines, so the graded hash covers them too. */
  val BloomBits: Long = 1L << 18
  val BloomLanes = 4
  val BloomWordBits = 32

  /** The four bit positions of one shingle, from one digest pass. */
  private def bloomPositions(shCol: org.apache.spark.sql.Column) =
    transform(graft.functions.Md5Lanes.md5Lanes(shCol, BloomLanes),
      hv => hv % BloomBits)

  /** Build the filter from a shingle set: one row per 32-bit word that has
    * any bit set — ≤ 8192 rows no matter how large the input, built by one
    * map-side explode + one hash aggregate (`bit_or` partials merge
    * map-side, so the shuffle carries at most |words| rows per task). */
  def bloomFilter(shingleSet: DataFrame, shCol: String = "sh"): DataFrame =
    shingleSet
      .select(explode(bloomPositions(col(shCol))).as("p"))
      .groupBy(TextOps.intDiv(col("p"), lit(BloomWordBits.toLong)).as("bucket"))
      .agg(expr(s"bit_or(shiftleft(cast(1 as bigint), cast(p % $BloomWordBits as int)))")
        .as("words"))

  /** [[decontaminate]]'s 100 TB-shape sibling: flag training documents
    * whose shingles MAY appear in the eval slice, probing a broadcast
    * 32 KiB Bloom filter instead of joining the full distinct eval-shingle
    * index. At corpus scale the eval side of a shingle-equi-join is itself
    * a large shuffled table; the Bloom probe replaces it with a
    * constant-size broadcast and a map-side bit test — the standard
    * first-pass filter before the exact join confirms survivors. A shingle
    * counts as a MAYBE-hit iff all [[BloomLanes]] bits are set; false
    * negatives are impossible (every truly shared shingle was OR'd into
    * the filter — pinned by the spec against [[decontaminate]]), false
    * positives are deterministic and mirrored bit-for-bit by the oracle.
    *
    * Output per flagged train doc: distinct-shingle count and how many of
    * them the filter admits (`n_maybe` ≥ the exact `n_shared`). */
  def bloomDecontaminate(
      corpus: DataFrame,
      evalMod: Int = 97,
      evalResidue: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val sh = Dedup.shingles(corpus, textCol, idCol)
    val isEval = col("id") % evalMod === evalResidue
    val bloom = bloomFilter(sh.where(isEval))
    val probe = sh.where(!isEval)
      .select(col("id"), col("sh"), explode(bloomPositions(col("sh"))).as("p"))
      .withColumn("bucket", TextOps.intDiv(col("p"), lit(BloomWordBits.toLong)))
    val maybe = probe
      .join(broadcast(bloom), Seq("bucket"))
      .where(expr(
        s"(words & shiftleft(cast(1 as bigint), cast(p % $BloomWordBits as int))) != 0"))
      // a shingle probes exactly BloomLanes rows (lane-position collisions
      // included), so all-bits-present ⇔ every probe row survived the test
      .groupBy("id", "sh").agg(count(lit(1)).as("__nhit"))
      .where(col("__nhit") === BloomLanes)
    val sizes = sh.where(!isEval).groupBy("id").agg(count(lit(1)).as("n_shingles"))
    maybe.groupBy("id").agg(count(lit(1)).as("n_maybe"))
      .join(sizes, Seq("id"))
      .select(col("id").as("doc_id"), col("n_shingles"), col("n_maybe"))
  }

  /** URL host of a document's JSON metadata — `get_json_object` (codegen)
    * + regexp host extraction, the standard provenance key a web-corpus
    * pipeline groups by. */
  def domainOf(metaCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(get_json_object(metaCol, "$.url"), "^https?://([^/]+)", 1)

  /** Per-domain exact-dedup audit — the first question a crawl-curation run
    * answers ("which hosts are dumping duplicates on us"): per URL host,
    * total docs, distinct contents, and the duplicate overhang. Two hash
    * aggregations, both partitioned on bounded keys ((domain, fingerprint)
    * then domain) — map-side combinable at any corpus size. */
  def domainDedupStats(corpusWithMeta: DataFrame,
      textCol: String = "text", metaCol: String = "meta"): DataFrame =
    corpusWithMeta
      .groupBy(domainOf(col(metaCol)).as("domain"),
        Dedup.fingerprint(col(textCol)).as("__fp"))
      .agg(count(lit(1)).as("__n"))
      .groupBy("domain")
      .agg(
        sum(col("__n")).cast("long").as("n_docs"),
        count(lit(1)).as("n_groups"),
        (sum(col("__n")) - count(lit(1))).cast("long").as("n_dup_docs"))

  /** Canonical form of a crawl URL — the key a 100 TB crawl dedups
    * provenance on BEFORE any content hashing (one page, many spellings):
    * host lowercased with any `www.` prefix dropped, scheme discarded
    * (http ≡ https for page identity), query string and fragment stripped
    * (tracking params), trailing slash trimmed. Pure single-match regex
    * passes — identical semantics in Java regex and RE2, so the oracle
    * shares the literal patterns. Case preserved in the PATH (paths are
    * case-sensitive; only the host is not). */
  def canonicalUrl(urlCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val host = regexp_replace(
      lower(regexp_extract(urlCol, "^[a-zA-Z]+://([^/?#]+)", 1)), "^www\\.", "")
    val path = regexp_replace(
      regexp_replace(
        regexp_replace(urlCol, "^[a-zA-Z]+://[^/?#]*", ""),
        "[?#].*", ""),
      "/$", "")
    concat(host, path)
  }

  /** E3-url — URL-identity dedup groups: documents grouped by canonical
    * URL, with the group size, representative (min id) and an id-list
    * fingerprint that pins the exact membership. One hash aggregate on a
    * bounded key (a canonical URL's group is re-crawls of one page) —
    * map-side combinable; the group fingerprint is md5 over the
    * numerically-sorted id list, so both engines render it identically. */
  def urlDedupGroups(corpusWithMeta: DataFrame,
      metaCol: String = "meta", idCol: String = "doc_id"): DataFrame =
    corpusWithMeta
      .select(canonicalUrl(get_json_object(col(metaCol), "$.url")).as("canon_url"),
        col(idCol))
      .groupBy("canon_url")
      .agg(
        count(lit(1)).as("n_docs"),
        min(col(idCol)).as("min_id"),
        md5(concat_ws(",",
          transform(sort_array(collect_list(col(idCol))), _.cast("string")))
          .cast("binary")).as("ids_fp"))

  /** Boilerplate detection — shingles recurring across an outsized share
    * of DISTINCT documents (headers, footers, license blurbs). Threshold
    * is relative (`n_docs * 1000 >= total_docs * permille`) so it means
    * the same thing at any corpus size; total_docs rides in via a
    * broadcast scalar join, not a collect. One explode + two aggregates:
    * the C4-style cleanup that precedes token counting at 100 TB. */
  def boilerplate(
      corpus: DataFrame,
      permille: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val docFreq = Dedup.shingles(corpus, textCol, idCol)
      .groupBy("sh").agg(count(lit(1)).as("n_docs"))
    val total = corpus.agg(count(lit(1)).as("__total"))
    docFreq.crossJoin(broadcast(total))
      .where(col("n_docs") * 1000 >= col("__total") * permille)
      .select(col("sh"), col("n_docs"))
  }

  /** E3-drift — per-domain token-distribution DRIFT score: a chi-square-
    * shaped statistic of each host's token mix against the corpus-wide
    * mix, `Σ_tokens (obs_bp − exp_bp)² div (exp_bp + 1)` over shares in
    * basis points — the ingest-monitoring signal ("host X started sending
    * different content") a production crawl pipeline alerts on. Integer
    * everywhere (true chi-square needs no logs, but shares are rationals;
    * fixing them at bp and interleaving the divisions identically on both
    * engines makes the statistic hash-gradable).
    *
    * Scale shape: SPARSE. One (domain, token) aggregate over the corpus,
    * then joins only on the OBSERVED pairs. Absent tokens never have to
    * be materialized: their per-token term `exp_bp² div (exp_bp+1)`
    * doesn't depend on the domain, so the dense sum factors as
    * `drift(d) = K + Σ_observed[(obs−exp)² div (exp+1) − exp² div (exp+1)]`
    * with K = Σ_vocab exp_bp² div (exp_bp+1) a corpus-wide broadcast
    * scalar. Integer division everywhere ⇒ the factorization is EXACT
    * (same hash as the dense formulation the oracle still uses). At crawl
    * scale this is |observed pairs| work instead of the 10¹⁴-row
    * |domains| × |vocab| cross product the dense form would build. */
  def domainTokenDrift(corpusWithMeta: DataFrame,
      textCol: String = "text", metaCol: String = "meta"): DataFrame = {
    val intDiv = TextOps.intDiv _
    val dt = corpusWithMeta
      .select(domainOf(col(metaCol)).as("domain"),
        explode(split(col(textCol), " ")).as("w"))
      .groupBy("domain", "w").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // domain totals, vocab totals, and the join all derive from it
    val dTot = dt.groupBy("domain").agg(sum("c").as("dn"))
    val n = dt.agg(sum("c").as("n"))
    // Per-token expected share and its absent-token contribution.
    val vExp = dt.groupBy("w").agg(sum("c").as("cw"))
      .crossJoin(broadcast(n))
      .select(col("w"), intDiv(col("cw") * 10000L, col("n")).as("__exp_bp"))
      .withColumn("__absent_term",
        intDiv(col("__exp_bp") * col("__exp_bp"), col("__exp_bp") + 1))
    // Corpus-wide constant: what a domain observing NOTHING would score.
    val k = vExp.agg(sum("__absent_term").as("__k"))
    dt.join(dTot, "domain")
      .join(vExp, "w") // sparse: only observed (domain, token) pairs
      .select(col("domain"), col("dn"),
        intDiv(col("c") * 10000L, col("dn")).as("__obs_bp"),
        col("__exp_bp"), col("__absent_term"))
      .groupBy("domain")
      .agg(max(col("dn")).as("n_tokens"),
        sum(intDiv((col("__obs_bp") - col("__exp_bp")) * (col("__obs_bp") - col("__exp_bp")),
          col("__exp_bp") + 1) - col("__absent_term")).as("__obs_delta"))
      .crossJoin(broadcast(k))
      .select(col("domain"), col("n_tokens"),
        (col("__obs_delta") + col("__k")).as("drift_score"))
  }
}
