package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus curation (SURVEY §2.13 E1).
  *
  * All hash material is `md5` hex (identical across engines, so the DuckDB
  * oracle reproduces signatures bit-for-bit) and all graded outputs are
  * integers/strings — no floating point in any hash-compared column.
  *
  * 100 TB notes: every stage below is a hash-partitioned groupBy/join on a
  * bounded key (fingerprint, band signature, candidate pair) — never an
  * all-pairs product and never a global sort. Shingling/minhashing are
  * map-side only; the LSH band join shuffles one row per (doc, band).
  */
object Dedup {

  /** Content fingerprint for exact dedup: md5 over the raw text bytes. */
  def fingerprint(textCol: Column): Column = md5(textCol.cast("binary"))

  /** E1a — exact-duplicate groups: one row per distinct content hash with
    * the surviving (minimum) id and the copy count. A plain hash-aggregate:
    * map-side partial min/count then one shuffle on the 128-bit fingerprint
    * — the canonical scale-safe exact dedup.
    */
  def exactGroups(corpus: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    corpus
      .groupBy(fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** E1a-nfc — exact-duplicate groups AFTER Unicode NFC canonicalization
    * (graft.functions.NfcNormalize): composed and decomposed spellings of
    * the same text (`é` vs `e`+U+0301) hash apart under every byte-level
    * fingerprint, so a crawl corpus is normalized before dedup. Same
    * single hash-aggregate shape as [[exactGroups]] — the normalizer is a
    * codegen scalar inside the scan projection, so canonicalization adds
    * zero shuffles (and zero cost on the all-ASCII fast path, which is a
    * quick-check that allocates nothing). `n_raw_forms` counts the
    * byte-distinct spellings a normalized group collapsed (1 = ordinary
    * exact copies; >1 = normalization did real work). */
  def normalizedExactGroups(
      corpus: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    corpus
      .groupBy(fingerprint(graft.functions.NfcNormalize.nfcNormalize(col(textCol)))
        .as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"),
        countDistinct(fingerprint(col(textCol))).as("n_raw_forms"))

  /** E1a' — the dedup itself: keep the first (min-id) row per content hash.
    * `Window.partitionBy(fingerprint)` is hash-partitioned by fingerprint,
    * so no single-partition funnel.
    */
  def dropExactDuplicates(corpus: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(fingerprint(col(textCol))).orderBy(col(idCol))
    corpus.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** E1a'' — incremental ingest dedup: of an INCOMING batch, keep one
    * representative per content hash (min id — the within-batch collapse)
    * and drop everything already present in the EXISTING corpus index
    * (anti join on the fingerprint). The shape a continuously-ingesting
    * pipeline runs per batch: the existing side is only its fingerprint
    * column (at 100 TB, a compact index table — never the full corpus),
    * and both the collapse and the anti join are hash-partitioned on the
    * 128-bit fingerprint. */
  def incrementalNew(
      existing: DataFrame,
      incoming: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val inc = incoming
      .groupBy(fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("doc_id"), count(lit(1)).as("n_in_batch"))
    val index = existing.select(fingerprint(col(textCol)).as("fp")).distinct()
    inc.join(index, Seq("fp"), "left_anti")
  }

  // -------------------------------------------------------------------
  // MinHash + LSH near-duplicate detection
  // -------------------------------------------------------------------

  val NumHashes = 12
  val BandSize = 3 // → 4 bands of 3 hashes
  val NumBands: Int = NumHashes / BandSize
  val ShingleLen = 3 // word 3-grams

  // -------------------------------------------------------------------
  // Hot-key guards (the 100 TB skew story)
  //
  // Every candidate join below is keyed on a content-derived key (band
  // signature, shingle, SimHash band byte). At corpus scale a single
  // boilerplate key (one license header shingle, one all-zero band) can
  // carry df ~10⁸ — an uncapped self-join on that key is a quadratic
  // blow-up on one shuffle partition. The guard is two-tier and NEVER
  // silent:
  //  1. REP-COLLAPSE — candidates are generated between distinct CONTENT
  //     values (shingle-set fingerprints / signature fingerprints /
  //     SimHash values), not between documents. A bucket of 10⁸ exact
  //     copies collapses to ONE representative; member pairs are expanded
  //     from the verified representative pairs, so the quadratic work is
  //     sized by distinct content and the expansion by TRUE output.
  //  2. CAPS — keys whose post-collapse breadth still exceeds the cap
  //     (df > maxDf routes a shingle to the rep path; > maxHotReps /
  //     maxBucket skips it) are dropped from candidate generation and
  //     REPORTED by the companion audit ([[hotShingleAudit]],
  //     [[minhashBucketAudit]], [[simhashBucketAudit]]) — the repo's
  //     "no silent caps" rule. Identical-content pairs are still emitted
  //     for skipped keys (the exact route), so exact duplicates are never
  //     lost no matter how hot their keys are.
  // Defaults are inert at fixture scale and deployment-tunable; the
  // GUARD STRUCTURE (collapse → cap → audit) is the scale contract.
  // -------------------------------------------------------------------

  /** Shingles hotter than this df are routed through the rep-collapsed hot
    * path in [[containmentPairs]]/[[jaccardPairsPrefix]]. */
  val DefaultHotDf = 100000L

  /** Backstop on the rep-collapsed breadth of a hot shingle: hot keys with
    * more DISTINCT shingle-sets than this are skipped (audited). */
  val DefaultMaxHotReps = 100000L

  /** Cap on DISTINCT signatures/values per LSH band bucket
    * ([[candidatePairs]], [[simhashNearDupPairs]]); larger buckets are
    * skipped (audited), identical-content pairs still emitted. */
  val DefaultMaxBucket = 100000L

  /** One row per document carrying the md5 fingerprint of its DISTINCT
    * shingle SET (`sort_array` makes it order-canonical), the set-group
    * representative (minimum doc id among identical sets) and the group
    * size. Identical-set docs are interchangeable in any set-overlap
    * predicate, which is what lets the hot paths work at rep granularity. */
  private def setGroups(sh: DataFrame): DataFrame = {
    // n_sh comes out of the SAME per-doc aggregate: the Jaccard /
    // containment verify stages need a size table anyway, and a separate
    // sh.groupBy(id) would re-shuffle the whole shingle set a second time
    val byDoc = sh.groupBy("id").agg(
      md5(concat_ws("", sort_array(collect_list(col("sh")))).cast("binary")).as("setfp"),
      count(lit(1)).as("n_sh"))
    val reps = byDoc.groupBy("setfp")
      .agg(min(col("id")).as("rep"), count(lit(1)).as("n_members"))
    byDoc.join(reps, Seq("setfp"))
  }

  /** All within-group pairs (id_a < id_b) of identical-set docs — the
    * exact route: these pairs satisfy any overlap threshold ≤ 1 by
    * construction and are emitted regardless of key heat, so capping can
    * never lose an exact-duplicate pair. */
  private def withinGroupPairs(groups: DataFrame): DataFrame =
    groups.where(col("n_members") >= 2).select(col("setfp"), col("id").as("id_a"))
      .join(groups.select(col("setfp"), col("id").as("id_b")), Seq("setfp"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")

  /** Expand verified pairs across identical-set groups: a verified pair
    * stands for every (member_a, member_b) combination — identical sets
    * give identical (n_common, n_a, n_b), swapped when the expanded ids
    * swap sides. Rep-level hot-path candidates NEED this; for doc-level
    * cold candidates it only re-derives pairs the cold path already
    * found, and the trailing distinct folds them. */
  private def expandBySetGroups(verified: DataFrame, groups: DataFrame): DataFrame = {
    val mem = groups.select(col("setfp"), col("id"))
    verified
      .join(groups.select(col("id").as("id_a"), col("setfp").as("__fpa")), Seq("id_a"))
      .join(groups.select(col("id").as("id_b"), col("setfp").as("__fpb")), Seq("id_b"))
      .join(mem.select(col("setfp").as("__fpa"), col("id").as("__ea")), Seq("__fpa"))
      .join(mem.select(col("setfp").as("__fpb"), col("id").as("__eb")), Seq("__fpb"))
      .where(col("__ea") =!= col("__eb"))
      .select(
        least(col("__ea"), col("__eb")).as("id_a"),
        greatest(col("__ea"), col("__eb")).as("id_b"),
        col("n_common"),
        when(col("__ea") < col("__eb"), col("n_a")).otherwise(col("n_b")).as("n_a"),
        when(col("__ea") < col("__eb"), col("n_b")).otherwise(col("n_a")).as("n_b"))
      .distinct()
  }

  /** Audit of hot shingles for the prefix-filter joins — one row per
    * shingle with df > `maxDf`: its document frequency, its rep-collapsed
    * breadth (distinct shingle-sets containing it) and the action the
    * joins take (`rep_collapsed` or, past `maxHotReps`, `skipped`). Empty
    * means the caps are inert on this corpus. A deployment monitors this
    * (the "no silent caps" contract): skipped keys bound the only recall
    * loss, and only for NON-identical pairs whose every common prefix
    * shingle is skipped. */
  def hotShingleAudit(
      corpus: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxDf: Long = DefaultHotDf,
      maxHotReps: Long = DefaultMaxHotReps): DataFrame = {
    val sh = shingles(corpus, textCol, idCol)
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df")).where(col("df") > maxDf)
    sh.join(dfreq, Seq("sh"))
      .join(setGroups(sh).select(col("id"), col("rep")), Seq("id"))
      .groupBy(col("sh"), col("df"))
      .agg(countDistinct(col("rep")).as("n_reps"))
      .select(col("sh"), col("df"), col("n_reps"),
        when(col("n_reps") <= maxHotReps, lit("rep_collapsed"))
          .otherwise(lit("skipped")).as("action"))
  }

  /** Word-`ShingleLen`-grams per document: (id, sh), duplicates included
    * (map-side only). Docs with fewer tokens than a shingle emit an empty
    * array, which `explode` drops (mirrors the oracle's range filter).
    * Shingling is a codegen'd [[graft.functions.WordShingles]] pass — the
    * equivalent transform/sequence/element_at HOF chain evaluated its
    * lambda interpreted per shingle and dominated the pipeline's runtime. */
  def rawShingles(corpus: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    corpus.select(col(idCol).as("id"),
      explode(graft.functions.WordShingles.wordShingles(col(textCol), ShingleLen)).as("sh"))

  /** Distinct shingle set per document (needed for Jaccard counting; the
    * signature path works on the raw multiset — min is duplicate-blind —
    * and skips this shuffle). */
  def shingles(corpus: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    rawShingles(corpus, textCol, idCol).distinct()

  /** MinHash signature: hash function h is the (h mod 4)-th 8-hex-char lane
    * of md5((h div 4) ++ ":" ++ shingle) — four lanes per digest.
    * Lexicographic min over hex strings, so Spark and the SQL oracle agree
    * exactly. All lanes for a shingle come from ONE native
    * [[graft.functions.Md5Lanes]] pass (the per-slot md5/concat/substring
    * expression chain paid 4 full digest+hex round-trips per row and
    * dominated the signature stage); one hash-aggregate then takes all
    * `NumHashes` mins. */
  def minhashSignatures(sh: DataFrame): DataFrame = {
    val withLanes = sh.select(col("id"),
      graft.functions.Md5Lanes.md5Lanes(col("sh"), NumHashes).as("__lanes"))
    // min over numeric lanes (HashAggregate — string mins would force a
    // SortAggregate over the whole shingle multiset), hex-formatted AFTER
    // the aggregation: identical strings to the oracle's min-over-hex.
    def slot(h: Int) = min(element_at(col("__lanes"), h + 1)).as(s"__m_$h")
    val agged = withLanes.groupBy("id").agg(slot(0), (1 until NumHashes).map(slot): _*)
    agged.select(col("id") +:
      (0 until NumHashes).map(h =>
        format_string("%08x", col(s"__m_$h")).as(s"mh_$h")): _*)
  }

  /** LSH banding: signature → (id, band, sig) rows, one per band. */
  def bands(sigs: DataFrame): DataFrame =
    sigs.select(col("id"), explode(array((0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", (0 until BandSize).map(o => col(s"mh_${b * BandSize + o}")): _*).as("sig"))
    }: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))

  /** Candidate pairs: docs sharing at least one full band signature.
    * Generated at DISTINCT-SIGNATURE granularity then expanded to member
    * pairs (see the hot-key guard block above): the (band, sig) self-join
    * is sized by distinct signatures, buckets past `maxBucket` distinct
    * signatures are skipped (see [[minhashBucketAudit]]), and
    * identical-signature pairs ride the exact route regardless. */
  def candidatePairs(
      corpus: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxBucket: Long = DefaultMaxBucket): DataFrame =
    bandedCandidates(shingles(corpus, textCol, idCol), maxBucket)

  /** (id, __sigfp, mh_0..mh_n): signatures plus their collapse key. */
  private def signatureGroups(sh: DataFrame): DataFrame = {
    val lanes = (0 until NumHashes).map(h => col(s"mh_$h"))
    minhashSignatures(sh)
      .withColumn("__sigfp", md5(concat_ws("|", lanes: _*).cast("binary")))
  }

  private def bandedCandidates(sh: DataFrame, maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val lanes = (0 until NumHashes).map(h => col(s"mh_$h"))
    val withFp = signatureGroups(sh).localCheckpoint(true)
    // value-level band rows: one per (distinct signature, band)
    val vb = bands(withFp.select(col("__sigfp").as("id") +: lanes: _*))
      .select(col("id").as("fp"), col("band"), col("sig"))
    val keep = vb.groupBy("band", "sig").agg(count(lit(1)).as("__nv"))
      .where(col("__nv") <= maxBucket).select("band", "sig")
    val kept = vb.join(keep, Seq("band", "sig"))
    val vpairs = kept.select(col("band"), col("sig"), col("fp").as("__fpa"))
      .join(kept.select(col("band"), col("sig"), col("fp").as("__fpb")), Seq("band", "sig"))
      .where(col("__fpa") < col("__fpb")).select("__fpa", "__fpb").distinct()
    val mem = withFp.select(col("__sigfp"), col("id"))
    val cross = vpairs
      .join(mem.select(col("__sigfp").as("__fpa"), col("id").as("__ia")), Seq("__fpa"))
      .join(mem.select(col("__sigfp").as("__fpb"), col("id").as("__ib")), Seq("__fpb"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"))
    // exact route: identical-signature docs are candidates no matter how
    // hot (or skipped) their buckets are
    val within = mem.select(col("__sigfp"), col("id").as("id_a"))
      .join(mem.select(col("__sigfp"), col("id").as("id_b")), Seq("__sigfp"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    cross.unionByName(within).distinct()
  }

  /** Audit of MinHash LSH band buckets — one row per (band, sig) bucket
    * holding ≥ 2 documents: member count, DISTINCT-signature count (the
    * post-collapse join breadth) and whether [[candidatePairs]] joins or
    * skips it at `maxBucket`. Exact-signature dups inside skipped buckets
    * are still paired by the exact route. */
  def minhashBucketAudit(
      corpus: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val lanes = (0 until NumHashes).map(h => col(s"mh_$h"))
    val withFp = signatureGroups(shingles(corpus, textCol, idCol))
    bands(withFp.select(col("id") +: (col("__sigfp") +: lanes): _*))
      .join(withFp.select(col("id"), col("__sigfp")), Seq("id"))
      .groupBy("band", "sig")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("__sigfp")).as("n_sigs"))
      .where(col("n_docs") >= 2)
      .select(col("band"), col("sig"), col("n_docs"), col("n_sigs"),
        when(col("n_sigs") <= maxBucket, lit("joined")).otherwise(lit("skipped")).as("action"))
  }

  /** E1b — MinHash/LSH near-dup pairs, verified: candidates whose true
    * shingle-set Jaccard ≥ `num/den` (default 3/5 = 0.6). The verification
    * join only touches candidate pairs, not the full corpus product.
    * Output is all-integer: (id_a, id_b, n_common, n_a, n_b). */
  /** @param rawSh optional precomputed [[rawShingles]] output (caller
    *        manages its materialization) — lets a caller running SEVERAL
    *        shingle-consuming pipelines over one corpus (the recall
    *        measurement runs this AND the exact prefix join) pay the
    *        corpus shingling once. */
  def nearDuplicatePairs(
      corpus: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      num: Int = 3, den: Int = 5,
      maxBucket: Long = DefaultMaxBucket,
      rawSh: Option[DataFrame] = None): DataFrame = {
    // One shingling pass feeds everything (cached raw multiset). The
    // signature aggregation is duplicate-blind (min), so no distinct
    // shuffle before it; the distinct-set shuffle needed for Jaccard
    // counting happens only AFTER pruning to candidate documents — the
    // candidate id set is tiny relative to the corpus, so the heavy
    // (id, shingle) join sees a fraction of the data (broadcast the ids,
    // not the shingles).
    val raw = rawSh.getOrElse(rawShingles(corpus, textCol, idCol).cache())
    val cand = bandedCandidates(raw, maxBucket).cache()
    val candIds = cand
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val shc = raw.join(broadcast(candIds), Seq("id"), "left_semi").distinct().cache()
    val sizes = shc.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val common = cand
      .join(shc.select(col("id").as("id_a"), col("sh")), Seq("id_a"))
      .join(shc.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    val pairs = common
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      // jaccard = common/(a+b-common) >= num/den, in exact integer math
      .where(col("n_common") * den >= (col("n_a") + col("n_b") - col("n_common")) * num)
      .select("id_a", "id_b", "n_common", "n_a", "n_b")
    // EAGER: localCheckpoint materializes the (one row per verified pair —
    // tiny relative to the corpus) result while the intermediates are live,
    // so the three O(shingles) caches can be released immediately. Unlike a
    // named cache, checkpoint blocks are reclaimed by the ContextCleaner
    // once the returned frame is unreferenced — repeated calls in a
    // long-lived session (bench loops, property tests) no longer accumulate
    // permanent block-store entries.
    val out = pairs.localCheckpoint(true)
    // only drop the cache WE created — a caller-supplied rawSh's
    // materialization is the caller's to manage (its scaladoc contract;
    // ext_dedup_eval reuses the same frame for the truth side afterwards)
    if (rawSh.isEmpty) raw.unpersist()
    cand.unpersist()
    shc.unpersist()
    out
  }

  /** The persisted LSH signature INDEX of a corpus — one row per
    * (id, band, sig), text never stored. This is the table a continuously
    * ingesting dedup pipeline maintains: at 100 TB the index is
    * `NumBands` short rows per document (kilobytes each), while the corpus
    * text stays in its own store and is only ever fetched for verified
    * CANDIDATES. */
  def minhashIndex(corpus: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    bands(minhashSignatures(rawShingles(corpus, textCol, idCol)))

  /** E1b'''' — INCREMENTAL near-dup ingest: detect the near-duplicate
    * pairs a NEW batch introduces — against history AND within itself —
    * touching history only through (a) the persisted signature [[minhashIndex]]
    * and (b) pointed text lookups of verified CANDIDATE partners. History
    * text is never re-shingled wholesale; per batch the work is
    * O(batch shingles) + O(candidates), which is what makes continuous
    * dedup affordable at corpus scale (contrast recomputing
    * [[nearDuplicatePairs]] over history ∪ batch every arrival).
    *
    * Skew guard: the (band, sig) probe is capped at `maxBucket` members on
    * the union side (hot buckets skipped — see [[minhashBucketAudit]] for
    * the audit contract), while IDENTICAL-signature pairs ride an exact
    * full-signature route regardless, so exact duplicates are never lost
    * to a cap. Semantics at fixture scale (caps inert) equal the batch
    * recompute restricted to batch-involving pairs — which is exactly what
    * the oracle grades.
    *
    * @param index persisted (id, band, sig) rows for HISTORY documents
    * @param batch the arriving documents (id + text)
    * @param store text store for candidate fetch (history ∪ batch rows)
    */
  def minhashIngest(
      index: DataFrame,
      batch: DataFrame,
      store: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      num: Int = 3, den: Int = 5,
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val batchBands = bands(minhashSignatures(rawShingles(batch, textCol, idCol)))
      .localCheckpoint(true)
    val all = index.unionByName(batchBands)
    // banded probe: batch signatures vs every signature, hot buckets capped
    val keep = all.groupBy("band", "sig").agg(count(lit(1)).as("__nb"))
      .where(col("__nb") <= maxBucket).select("band", "sig")
    val kept = all.join(keep, Seq("band", "sig"))
    val probed = batchBands.join(keep, Seq("band", "sig"))
      .select(col("band"), col("sig"), col("id").as("__bid"))
      .join(kept.select(col("band"), col("sig"), col("id").as("__oid")), Seq("band", "sig"))
    // exact route: identical FULL signatures (all bands agree) pair no
    // matter how hot their buckets are — reconstruct the signature
    // fingerprint from the index rows themselves (NumBands-way pivot)
    val fpCols = (0 until NumBands).map(b =>
      max(when(col("band") === b, col("sig"))).as(s"__b$b"))
    val withFp = all.groupBy("id")
      .agg(fpCols.head, fpCols.tail: _*)
      .withColumn("__sigfp",
        md5(concat_ws("#", (0 until NumBands).map(b => col(s"__b$b")): _*).cast("binary")))
      .select("id", "__sigfp")
    val batchIdsDf = batchBands.select("id").distinct()
    val exact = withFp.join(batchIdsDf, Seq("id"), "left_semi")
      .select(col("__sigfp"), col("id").as("__bid"))
      .join(withFp.select(col("__sigfp"), col("id").as("__oid")), Seq("__sigfp"))
      .select("__bid", "__oid")
    val cand = probed.select("__bid", "__oid").unionByName(exact)
      .where(col("__bid") =!= col("__oid"))
      .select(least(col("__bid"), col("__oid")).as("id_a"),
        greatest(col("__bid"), col("__oid")).as("id_b"))
      .distinct()
      .localCheckpoint(true)
    verifyByPointedLookup(cand, store, textCol, idCol, num, den)
  }

  /** The pointed-fetch Jaccard verify every index-driven pair path ends
    * in: filter the STORE to candidate ids first, shingle only those
    * documents, count true overlap, keep pairs at Jaccard ≥ num/den.
    * Candidate-sized work, never a corpus re-shingle. */
  private def verifyByPointedLookup(
      cand: DataFrame, store: DataFrame, textCol: String, idCol: String,
      num: Int, den: Int): DataFrame = {
    val candIds = cand.select(explode(array(col("id_a"), col("id_b"))).as(idCol)).distinct()
    val candDocs = store.join(broadcast(candIds), Seq(idCol), "left_semi")
    val shc = shingles(candDocs, textCol, idCol).localCheckpoint(true)
    val sizes = shc.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val common = cand
      .join(shc.select(col("id").as("id_a"), col("sh")), Seq("id_a"))
      .join(shc.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .where(col("n_common") * den >= (col("n_a") + col("n_b") - col("n_common")) * num)
      .select("id_a", "id_b", "n_common", "n_a", "n_b")
  }

  /** E1b''''' — verified near-dup pairs among the documents PRESENT in a
    * stored signature index: banded candidates from the index rows alone
    * (hot buckets capped, identical full signatures via the exact route),
    * then the pointed-text Jaccard verify. This is the READ side of index
    * maintenance — and in particular of SUBJECT DELETION: because
    * signatures are per-document pure, forgetting a subject is a row
    * FILTER on the stored index, and the surviving pair set must equal a
    * from-scratch recompute over the surviving corpus (the graded
    * ext_minhash_forget claim; the cdc Forget contract propagated into
    * derived dedup state). Pairs between SURVIVORS are untouched by a
    * partner's deletion — duplicate structure among the living persists. */
  def pairsFromIndex(
      index: DataFrame,
      store: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      num: Int = 3, den: Int = 5,
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val keep = index.groupBy("band", "sig").agg(count(lit(1)).as("__nb"))
      .where(col("__nb") <= maxBucket).select("band", "sig")
    val kept = index.join(keep, Seq("band", "sig"))
    val banded = kept.select(col("band"), col("sig"), col("id").as("id_a"))
      .join(kept.select(col("band"), col("sig"), col("id").as("id_b")), Seq("band", "sig"))
    // exact route: identical FULL signatures pair regardless of bucket
    // heat (same reconstruction as the ingest probe)
    val fpCols = (0 until NumBands).map(b =>
      max(when(col("band") === b, col("sig"))).as(s"__b$b"))
    val withFp = index.groupBy("id")
      .agg(fpCols.head, fpCols.tail: _*)
      .withColumn("__sigfp",
        md5(concat_ws("#", (0 until NumBands).map(b => col(s"__b$b")): _*).cast("binary")))
      .select("id", "__sigfp")
    val exact = withFp.select(col("__sigfp"), col("id").as("id_a"))
      .join(withFp.select(col("__sigfp"), col("id").as("id_b")), Seq("__sigfp"))
    val cand = banded.select("id_a", "id_b").unionByName(exact.select("id_a", "id_b"))
      .where(col("id_a") < col("id_b"))
      .distinct()
      .localCheckpoint(true)
    verifyByPointedLookup(cand, store, textCol, idCol, num, den)
  }

  // -------------------------------------------------------------------
  // The LSH SERVING LAYOUT — the dedup index joins the partitioned-layout
  // fold family (IVF cells / IVF-PQ codes / BM25 postings / SCD2 episodes
  // / LSH signatures). Two persisted artifacts:
  //   bands/  (pbucket, band, sig, id)   partitioned by pbucket =
  //           md5(band#sig) mod ServingBuckets — a (band, sig) group lives
  //           ENTIRELY in its hash bucket, so probe-time cap counting and
  //           fold-time row replacement are both bucket-local;
  //   fps/    (fbucket, sigfp, id)       partitioned by fbucket =
  //           md5-prefix of the full-signature fingerprint — the exact
  //           route's registry, so identical-signature lookups prune too
  //           (in the whole-index paths the exact route re-derives fps by
  //           an index-wide pivot; a serving read must never scan the
  //           index it exists to avoid scanning).
  // A probe broadcasts its own (pbucket, band, sig) rows, so the joins
  // against both layouts reach the scans as runtime partition filters
  // (the bm25TopKServing shape); maintenance rewrites only the buckets a
  // delta's old+new signatures live in (the generalized old ∪ new removal
  // set — one fold covers revise/delete/insert/forget). Signatures are
  // per-document pure, so per-batch folds over disjoint docs compose and
  // the fold is replay-idempotent with NO carried scalars at all (unlike
  // BM25 there is no df/n to re-derive — the layout stores raw band rows).
  // -------------------------------------------------------------------

  /** Partition-value cardinality of both serving artifacts — a layout
    * constant (the control-plane bound every sweep/compact collect rides). */
  val ServingBuckets = 16

  /** Band-bucket assignment for the serving layout's partitioning:
    * md5 prefix of `band#sig` mod [[ServingBuckets]] — layout-internal
    * (never graded content), and PURE in (band, sig) so a band group's
    * rows can never straddle partitions. */
  def bandBucket(band: Column, sig: Column, buckets: Int = ServingBuckets): Column =
    conv(substring(md5(concat_ws("#", band, sig).cast("binary")), 1, 4), 16, 10)
      .cast("long") % buckets

  /** Fingerprint-bucket assignment for the exact-route registry —
    * layout-internal like [[bandBucket]]. */
  def fpBucket(fp: Column, buckets: Int = ServingBuckets): Column =
    conv(substring(fp, 1, 4), 16, 10).cast("long") % buckets

  /** The full-signature fingerprint over a [[minhashSignatures]] row —
    * md5 of the '#'-joined band signatures, the SAME reconstruction
    * [[minhashIngest]]/[[pairsFromIndex]] pivot out of raw index rows, so
    * the persisted registry and the on-the-fly exact routes agree
    * bit-for-bit. */
  private def sigFingerprint: Column = {
    val bandSigs = (0 until NumBands).map { b =>
      concat_ws("|", (0 until BandSize).map(o => col(s"mh_${b * BandSize + o}")): _*)
    }
    md5(concat_ws("#", bandSigs: _*).cast("binary"))
  }

  /** BYTE ceiling for CANDIDATE-derived broadcast dim sides in the
    * serving probes. The batch's own band/fingerprint rows are
    * batch-bounded, but the SimHash probe's candidate-VALUE set grows
    * with the batch's PAIR fan-out — a hot boilerplate batch at 100×
    * could push a pair-derived broadcast past driver memory. Above the
    * gate the probe falls back to a merge-hinted shuffled join (the
    * gatedEpisodeJoin precedent: the hint is REQUIRED — the planner
    * re-broadcasts any small-estimated side otherwise), trading the
    * runtime partition pruning for a bounded driver. The gate is
    * rows × an approximate per-row width declared at each call site —
    * a raw row count bounded very different driver footprints between
    * the dims (minhash sig strings vs simhash long triples). */
  val ProbeBroadcastBytes: Long = 128L << 20

  /** Approximate broadcast row widths per dim (JVM object overhead
    * included) — declared once so every gate prices the dim it bounds:
    * minhash band rows carry a ~32-char signature STRING, fp rows a
    * 32-hex md5 string; the simhash dims are fixed-width long tuples. */
  private val MinhashBandRowBytes = 96L
  private val MinhashFpRowBytes = 96L
  private val SimhashBandRowBytes = 40L
  private val SimhashValueRowBytes = 32L

  /** The gated dim side: broadcast while `rows × rowBytes` stays under
    * the byte limit (keeping the un-checkpointed plan visible for
    * runtime pruning), merge-hinted shuffled join above it. `rows` is a
    * control-plane count over an already-materialized batch/candidate
    * frame (cheap, bounded by the frame it gates). */
  private def gatedDim(dim: DataFrame, shuffledDim: DataFrame, rows: Long,
      rowBytes: Long, limitBytes: Long): DataFrame =
    // division, not rows*rowBytes: the gate exists to bound PATHOLOGICAL
    // fan-out, exactly where a Long product could wrap negative and
    // wrongly broadcast an over-limit dim
    if (rowBytes > 0 && rows <= limitBytes / rowBytes) broadcast(dim)
    else shuffledDim.hint("merge")

  /** Explicit schemas of the two persisted artifacts: a fold that empties
    * every partition leaves a footer-less directory, and the next read
    * must see a readable empty state, never a schema-inference crash (the
    * BM25 registry lesson). */
  private[graft] val bandsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("band",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("sig",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("pbucket",
      org.apache.spark.sql.types.LongType)))
  private[graft] val fpsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("sigfp",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("fbucket",
      org.apache.spark.sql.types.LongType)))

  /** The serving artifact ROWS of a document set — (band rows, fp rows),
    * both tagged with their partition keys. Build-time over the corpus,
    * probe-time over a batch, fold-time over a delta: one derivation for
    * all three, so layout and probe can never disagree on bucketing.
    * NOT materialized here — the PROBE path needs the batch's literal
    * filter visible in the plan for DPP insertion (a checkpointed dim
    * side has no selective predicate and the optimizer skips the runtime
    * partition filter: the cdc_query_dpp literal lesson); fold callers
    * checkpoint what they consume twice. */
  def minhashServingRows(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      buckets: Int = ServingBuckets): (DataFrame, DataFrame) = {
    val sigs = minhashSignatures(rawShingles(docs, textCol, idCol))
    val bandRows = bands(sigs)
      .select(col("band"), col("sig"), col("id"),
        bandBucket(col("band"), col("sig"), buckets).as("pbucket"))
    val fpRows = sigs.select(sigFingerprint.as("sigfp"), col("id"))
      .withColumn("fbucket", fpBucket(col("sigfp"), buckets))
    (bandRows, fpRows)
  }

  /** The PRUNED ingest probe over the persisted serving layout — the
    * serving-read twin of [[minhashIngest]]: the batch's own band rows
    * broadcast against the pbucket-partitioned index, so the scan reads
    * ONLY the probed buckets of a corpus-sized signature store (runtime
    * partition filter — never "scan the index, filter later"); the exact
    * identical-signature route probes the fp registry the same way
    * instead of pivoting fingerprints out of an index-wide scan. Cap
    * counting stays exact under pruning because a (band, sig) group's
    * rows live entirely in its bucket — the probed slice holds EVERY
    * member of every probed group. Candidates then verify by the same
    * pointed text lookups. Semantics ≡ [[minhashIngest]] (same caps, same
    * exact route), which is what the oracle grades. */
  def minhashServingProbe(
      spark: org.apache.spark.sql.SparkSession,
      bandsPath: String,
      fpsPath: String,
      batch: DataFrame,
      store: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      num: Int = 3, den: Int = 5,
      maxBucket: Long = DefaultMaxBucket,
      buckets: Int = ServingBuckets,
      broadcastBytes: Long = ProbeBroadcastBytes): DataFrame = {
    val cand = minhashServingCandidates(
      spark, bandsPath, fpsPath, batch, textCol, idCol, maxBucket, buckets,
      broadcastBytes)
      .localCheckpoint(true)
    verifyByPointedLookup(cand, store, textCol, idCol, num, den)
  }

  /** The probe's CANDIDATE stage — the part that touches the persisted
    * layout — un-materialized, so the plan lock can execute it and read
    * the band/fp scans' runtime pruning metrics (the checkpoint inside
    * [[minhashServingProbe]] erases the stage from the returned plan). */
  def minhashServingCandidates(
      spark: org.apache.spark.sql.SparkSession,
      bandsPath: String,
      fpsPath: String,
      batch: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxBucket: Long = DefaultMaxBucket,
      buckets: Int = ServingBuckets,
      broadcastBytes: Long = ProbeBroadcastBytes): DataFrame = {
    // dim sides stay on the UN-checkpointed plan (DPP needs the batch's
    // literal filter visible — see minhashServingRows); the row-level
    // consumers read materialized copies so the batch isn't re-signed
    // once per subtree
    val (bb0, bf0) = minhashServingRows(batch, textCol, idCol, buckets)
    val bb = bb0.localCheckpoint(true)
    val bf = bf0.localCheckpoint(true)
    // banded route: probed groups' stored members (pruned scan; the
    // broadcast side is distinct on the join keys, so the inner join is
    // the semi-join it reads as) ∪ the batch's own rows, then the ingest
    // probe's cap + pair logic verbatim. The broadcast is GATED on the
    // batch's band-row count (the checkpointed twin makes the count a
    // cheap control-plane action); above the gate the probe shuffles
    // with the merge hint instead — pruning lost, driver bounded
    val stored = spark.read.schema(bandsSchema).parquet(bandsPath)
    val bandDim = gatedDim(
      bb0.select("pbucket", "band", "sig").distinct(),
      bb.select("pbucket", "band", "sig").distinct(),
      bb.count(), MinhashBandRowBytes, broadcastBytes)
    val probedStored = stored
      .join(bandDim, Seq("pbucket", "band", "sig"))
      .select("band", "sig", "id")
    val all = probedStored.unionByName(bb.select("band", "sig", "id"))
    val keep = all.groupBy("band", "sig").agg(count(lit(1)).as("__nb"))
      .where(col("__nb") <= maxBucket).select("band", "sig")
    val kept = all.join(keep, Seq("band", "sig"))
    val probed = bb.select(col("band"), col("sig"), col("id").as("__bid"))
      .join(keep, Seq("band", "sig"))
      .join(kept.select(col("band"), col("sig"), col("id").as("__oid")),
        Seq("band", "sig"))
    // exact route: identical FULL signatures pair regardless of bucket
    // heat — batch fingerprints probe the partitioned registry (pruned)
    // and self-join for within-batch exact pairs
    val storedFps = spark.read.schema(fpsSchema).parquet(fpsPath)
    val fpDim = gatedDim(
      bf0.select(col("fbucket"), col("sigfp"), col("id").as("__bid")),
      bf.select(col("fbucket"), col("sigfp"), col("id").as("__bid")),
      bf.count(), MinhashFpRowBytes, broadcastBytes)
    val fpHits = storedFps
      .join(fpDim, Seq("fbucket", "sigfp"))
      .select(col("__bid"), col("id").as("__oid"))
    val fpBatch = bf.select(col("sigfp"), col("id").as("__bid"))
      .join(bf.select(col("sigfp"), col("id").as("__oid")), Seq("sigfp"))
      .select("__bid", "__oid")
    probed.select("__bid", "__oid")
      .unionByName(fpHits).unionByName(fpBatch)
      .where(col("__bid") =!= col("__oid"))
      .select(least(col("__bid"), col("__oid")).as("id_a"),
        greatest(col("__bid"), col("__oid")).as("id_b"))
      .distinct()
  }

  /** Write a document set's LSH dedup index in its SERVING layout: band
    * rows partitioned by band bucket beside the fingerprint registry
    * partitioned by fp bucket — the repartition-on-partition-key before
    * partitionBy is the one-task-per-directory sink-append lesson. */
  def writeServingLayout(
      docs: DataFrame,
      bandsPath: String,
      fpsPath: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      buckets: Int = ServingBuckets): Unit = {
    val (bandRows, fpRows) = minhashServingRows(docs, textCol, idCol, buckets)
    bandRows.repartition(col("pbucket"))
      .write.partitionBy("pbucket").mode("overwrite").parquet(bandsPath)
    fpRows.repartition(col("fbucket"))
      .write.partitionBy("fbucket").mode("overwrite").parquet(fpsPath)
  }

  /** IN-PLACE partial maintenance of the partitioned LSH layout (the
    * dedup twin of [[graft.ext.Similarity.ivfServingFold]] /
    * [[graft.ext.Retrieval.bm25ServingFold]]): a delta rewrites ONLY the
    * band/fp buckets its OLD and NEW signatures live in. Old rows are
    * located by RE-SIGNING the delta docs' pre-delta text (signatures are
    * deterministic in content, so the re-derived rows equal the stored
    * ones exactly) — never by scanning the index for ids. The removal set
    * is old ∪ new ids, so one primitive covers revisions (both sides),
    * deletes/forget (old only) and inserts (new only). No artifact
    * carries a scalar and no statistic is denormalized into the rows, so
    * replay-idempotence is free: a re-delivered batch anti-joins the same
    * ids out and unions the same rows back. Dynamic partition overwrite
    * behind a materialization barrier + the emptied-bucket sweep carry
    * over from the sibling folds. */
  def minhashServingFold(
      spark: org.apache.spark.sql.SparkSession,
      bandsPath: String,
      fpsPath: String,
      oldDocs: DataFrame,
      newDocs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      buckets: Int = ServingBuckets): Unit = {
    val (oldBands0, oldFps0) = minhashServingRows(oldDocs, textCol, idCol, buckets)
    val (newBands0, newFps0) = minhashServingRows(newDocs, textCol, idCol, buckets)
    val oldBands = oldBands0.localCheckpoint(true)
    val newBands = newBands0.localCheckpoint(true)
    val oldFps = oldFps0.localCheckpoint(true)
    val newFps = newFps0.localCheckpoint(true)
    val deltaIds = oldDocs.select(col(idCol).as("__did"))
      .union(newDocs.select(col(idCol).as("__did"))).distinct()
      .localCheckpoint(true)
    // band layout: replace the affected buckets' content. The affected
    // set collects to a literal (layout-bounded — the sweep's
    // control-plane scalar, shared with the read) so the replacement
    // read is STATICALLY partition-pruned: the fold reads only the
    // buckets it rewrites, never the whole signature layout
    val affectedP = ServingLayout.affectedValues(
      oldBands.select("pbucket").union(newBands.select("pbucket")))
    val stored = spark.read.schema(bandsSchema).parquet(bandsPath)
      .where(ServingLayout.partitionIn(
        col("pbucket"), bandsSchema("pbucket").dataType, affectedP))
    val replacement = stored
      .join(deltaIds, col("id") === col("__did"), "left_anti")
      .select("pbucket", "band", "sig", "id")
      .unionByName(newBands.select("pbucket", "band", "sig", "id"))
      .localCheckpoint(true) // barrier: bytes leave the path being overwritten
    replacement.repartition(col("pbucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pbucket")
      .parquet(bandsPath)
    ServingLayout.sweepEmptied(spark, bandsPath, "pbucket", affectedP, replacement)
    // fp registry: same fold on the fingerprint buckets
    val affectedF = ServingLayout.affectedValues(
      oldFps.select("fbucket").union(newFps.select("fbucket")))
    val storedFps = spark.read.schema(fpsSchema).parquet(fpsPath)
      .where(ServingLayout.partitionIn(
        col("fbucket"), fpsSchema("fbucket").dataType, affectedF))
    val replacementF = storedFps
      .join(deltaIds, col("id") === col("__did"), "left_anti")
      .select("fbucket", "sigfp", "id")
      .unionByName(newFps.select("fbucket", "sigfp", "id"))
      .localCheckpoint(true) // barrier: bytes leave the path being overwritten
    replacementF.repartition(col("fbucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("fbucket")
      .parquet(fpsPath)
    ServingLayout.sweepEmptied(spark, fpsPath, "fbucket", affectedF, replacementF)
  }

  /** The DEFAULT pair-listing entry point over a GENERATIONED layout
    * root (published via [[graft.streaming.StateStream.publishState]],
    * folded via [[graft.streaming.StateStream.foldIsolatedGen]], holding
    * `bands/` + `fps/` per generation): resolves the CURRENT generation
    * once and reads its artifact SET — a reader can never observe a torn
    * (bands, fps) mix under a concurrent fold, because the generation
    * flip is atomic and superseded generations grace-retire. Raw
    * artifact paths are the explicit opt-in
    * ([[minhashPairsServingQuiesced]]) for single-writer, fold-quiesced
    * maintenance loops. */
  def minhashPairsServing(
      spark: org.apache.spark.sql.SparkSession,
      layoutRoot: String,
      store: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      num: Int = 3, den: Int = 5,
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val gen = graft.streaming.StateStream.statePath(spark, layoutRoot)
    minhashPairsServingQuiesced(spark, s"$gen/bands", s"$gen/fps",
      store, textCol, idCol, num, den, maxBucket)
  }

  /** Verified near-dup pairs among the documents of a persisted SERVING
    * layout — [[pairsFromIndex]] with the exact route read from the fp
    * REGISTRY instead of pivoted out of the index rows (the stored
    * fingerprints are the same reconstruction, kept current by
    * [[minhashServingFold]]). The read side of every in-place maintenance
    * row: fold ∘ this must equal the scratch recompute over the post-fold
    * corpus.
    *
    * CONCURRENCY — the QUIESCED opt-in: [[minhashServingFold]] writes the
    * two artifacts NON-atomically (bands, then fps) — a raw-path read
    * racing a fold can see a folded fingerprint registry beside stale
    * band rows. This entry is for single-writer, fold-quiesced loops
    * only (the in-place maintenance rows, which own their copied state);
    * anything concurrent with maintenance uses the generation-resolving
    * default [[minhashPairsServing]] (the
    * ext_minhash_serving_grace_read / probe_race contract). */
  def minhashPairsServingQuiesced(
      spark: org.apache.spark.sql.SparkSession,
      bandsPath: String,
      fpsPath: String,
      store: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      num: Int = 3, den: Int = 5,
      maxBucket: Long = DefaultMaxBucket): DataFrame =
    minhashPairsFrom(
      spark.read.schema(bandsSchema).parquet(bandsPath),
      spark.read.schema(fpsSchema).parquet(fpsPath),
      store, textCol, idCol, num, den, maxBucket)

  /** [[minhashPairsServing]] over already-RESOLVED artifact frames — the
    * pinned-generation reader's entry point: a long-running reader
    * resolves both artifacts of one generation (parquet file indexes
    * built), maintenance flips the pointer, and the pinned read still
    * answers from the consistent pre-fold set on graced bytes. */
  def minhashPairsFrom(
      index: DataFrame,
      fps: DataFrame,
      store: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      num: Int = 3, den: Int = 5,
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val keep = index.groupBy("band", "sig").agg(count(lit(1)).as("__nb"))
      .where(col("__nb") <= maxBucket).select("band", "sig")
    val kept = index.join(keep, Seq("band", "sig"))
    val banded = kept.select(col("band"), col("sig"), col("id").as("id_a"))
      .join(kept.select(col("band"), col("sig"), col("id").as("id_b")),
        Seq("band", "sig"))
    val exact = fps.select(col("sigfp"), col("id").as("id_a"))
      .join(fps.select(col("sigfp"), col("id").as("id_b")), Seq("sigfp"))
    val cand = banded.select("id_a", "id_b").unionByName(exact.select("id_a", "id_b"))
      .where(col("id_a") < col("id_b"))
      .distinct()
      .localCheckpoint(true)
    verifyByPointedLookup(cand, store, textCol, idCol, num, den)
  }

  /** E1b'' — LOSSLESS shingle CONTAINMENT pairs: all pairs where the
    * SMALLER document's shingle set is nearly contained in the other's —
    * |A∩B| / min(|A|,|B|) ≥ num/den. Jaccard misses subset relationships
    * (a doc quoted whole inside a much longer one scores low Jaccard but
    * containment ~1), and MinHash BANDING misses them too: the larger
    * doc's band minima come from its own non-shared shingles, so a subset
    * pair rarely shares a band. Candidates instead come from an
    * ASYMMETRIC prefix probe (the PPJoin idea adapted to containment):
    * every doc's rarity-ordered prefix — its first n − ⌈n·num/den⌉ + 1
    * shingles — probes the FULL inverted index. Pigeonhole on the probe
    * side: if all of A's prefix shingles miss B, fewer than ⌈t·n_A⌉ of
    * A's shingles can be in B, so every qualifying pair is found no
    * matter which side is smaller — recall 1.0 by construction (the
    * graded oracle is the naive all-pairs ground truth). Fan-out is
    * bounded on BOTH tails: cold shingles (df ≤ `maxDf`) join directly
    * with postings capped at maxDf, while hot shingles — the boilerplate
    * case where even a doc's rarest shingle has huge df — route through
    * the rep-collapsed hot path (see the hot-key guard block above):
    * identical shingle-sets collapse to one representative, the witness
    * survives at rep granularity, and verified rep pairs expand back to
    * member pairs. Recall stays 1.0 unless a hot shingle exceeds
    * `maxHotReps` DISTINCT sets, which [[hotShingleAudit]] reports. */
  def containmentPairs(
      corpus: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      num: Int = 9, den: Int = 10,
      maxDf: Long = DefaultHotDf,
      maxHotReps: Long = DefaultMaxHotReps): DataFrame = {
    val sh = shingles(corpus, textCol, idCol).localCheckpoint(true)
    // dfreq feeds BOTH the prefix ranking and the hot-side index below —
    // materialize it once (distinct shingles × a long, small)
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("__df")).localCheckpoint(true)
    val byRarity = Window.partitionBy("id").orderBy(col("__df"), col("sh"))
    val perDoc = Window.partitionBy("id")
    // rarity order and prefix length are computed over ALL shingles (the
    // pigeonhole argument needs the true prefix); __df rides along so the
    // cold/hot split below needs no second dfreq join
    val prefix = sh.join(dfreq, Seq("sh"))
      .withColumn("__r", row_number().over(byRarity))
      .withColumn("__n", count(lit(1)).over(perDoc))
      .where(col("__r") <= col("__n") - expr(s"(__n * $num + ${den - 1}) div $den") + 1)
      .select(col("id"), col("sh"), col("__df"))
      .localCheckpoint(true)
    val groups = setGroups(sh).localCheckpoint(true)
    // COLD path: probe entries on shingles with df ≤ maxDf — the join-key
    // equality bounds the index posting to maxDf, so per-key fan-out is
    // prefix-count × maxDf, never a skew blow-up
    val coldCand = prefix.where(col("__df") <= maxDf)
      .select(col("sh"), col("id").as("pid"))
      .join(sh.select(col("sh"), col("id").as("iid")), Seq("sh"))
      .where(col("pid") =!= col("iid"))
      .select(least(col("pid"), col("iid")).as("id_a"),
        greatest(col("pid"), col("iid")).as("id_b"))
    // HOT path: rep-collapsed — a pair whose only common prefix shingles
    // are hot still has its witness at rep granularity; the verified rep
    // pair expands to every member pair afterwards. Keys hotter than
    // maxHotReps even post-collapse are skipped ([[hotShingleAudit]]).
    val repProbe = prefix.where(col("__df") > maxDf)
      .join(groups.select(col("id"), col("rep")), Seq("id"))
      .select(col("sh"), col("rep").as("__pr")).distinct()
    val repIndex = sh.join(dfreq.where(col("__df") > maxDf).select("sh"), Seq("sh"))
      .join(groups.select(col("id"), col("rep")), Seq("id"))
      .select(col("sh"), col("rep").as("__ir")).distinct()
    val admitted = repIndex.groupBy("sh").agg(count(lit(1)).as("__nr"))
      .where(col("__nr") <= maxHotReps).select("sh")
    val repCand = repProbe.join(admitted, Seq("sh")).join(repIndex, Seq("sh"))
      .where(col("__pr") =!= col("__ir"))
      .select(least(col("__pr"), col("__ir")).as("id_a"),
        greatest(col("__pr"), col("__ir")).as("id_b"))
    val cand = coldCand.unionByName(repCand)
      .unionByName(withinGroupPairs(groups)).distinct()
    // sizes ride out of the checkpointed setGroups pass — no second
    // full-shingle aggregation
    val sizes = groups.select(col("id"), col("n_sh"))
    val common = cand
      .join(sh.select(col("id").as("id_a"), col("sh")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    val verified = common
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      // containment of the SMALLER set: common/min(a,b) >= num/den
      .where(col("n_common") * den >= least(col("n_a"), col("n_b")) * num)
      .select("id_a", "id_b", "n_common", "n_a", "n_b")
    expandBySetGroups(verified, groups)
  }

  /** E1e — duplicated-span share: the per-document summary an
    * exact-substring dedup pass acts on (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better" — their suffix-array
    * substring matches, approximated here at shingle granularity): a
    * doc's shingle is DUPLICATED iff it also occurs in ANOTHER document;
    * the duplicated share (basis points of the doc's distinct shingles)
    * is the removal/weighting signal. Planted exact copies score 10000 by
    * construction.
    *
    * Scale shape: two hash aggregates + one join, all partitioned on the
    * shingle hash — the document-frequency side is the same inverted
    * index every shingle family here builds, never an all-pairs product.
    * Output is all-integer: (doc_id, n_shingles, n_dup_shingles,
    * dup_span_bp). */
  def duplicatedShingleShare(
      corpus: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val sh = shingles(corpus, textCol, idCol)
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("__df"))
    sh.join(dfreq, Seq("sh"))
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") >= 2, 1L).otherwise(0L)).as("n_dup_shingles"))
      .select(col("doc_id"), col("n_shingles"), col("n_dup_shingles"),
        graft.ext.TextOps.intDiv(col("n_dup_shingles") * 10000, col("n_shingles"))
          .as("dup_span_bp"))
  }

  /** E1e' — duplicated-span REMOVAL with ordered text reconstruction: the
    * actual dedup step of exact-substring deduplication (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better"), where
    * [[duplicatedShingleShare]] is the evidence metric. A token is removed
    * iff it is covered by any [[ShingleLen]]-gram that occurs in ≥
    * `minDocs` DISTINCT documents (removed from every copy — the same
    * every-document sweep contract as [[Curate.lineDedup]], token-granular
    * instead of line-granular). Output per doc: token counts and the md5
    * of the surviving text in original token order, so the graded row
    * proves the reconstruction, not just the counts.
    *
    * Scale shape: one posexplode for tokens, one for shingle starts, one
    * inverted-index aggregate on the shingle (distinct-doc df), a join
    * back on the shingle key, a bounded ×[[ShingleLen]] explode from dup
    * starts to covered positions, and one equi-join + per-doc aggregate
    * whose ordered reassembly sorts only the doc's OWN tokens — never a
    * global sort, never doc×doc. */
  def removeDuplicatedSpans(
      corpus: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      minDocs: Int = 2): DataFrame =
    tokenCoverage(corpus, textCol, idCol, minDocs)
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__c").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__c").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        // collect_list skips the NULLs the unsatisfied `when` produces;
        // sort_array orders by the leading struct field = original pos
        sort_array(collect_list(
          when(col("__c").isNull, struct(col("pos"), col("tok"))))).as("__kt"))
      .select(col("id").as(idCol), col("n_tokens"), col("n_kept"), col("n_removed"),
        md5(concat_ws(" ", transform(col("__kt"), _.getField("tok"))).cast("binary"))
          .as("kept_fp"))

  /** Token stream annotated with duplicate-span coverage — the shared core
    * of [[removeDuplicatedSpans]] and [[duplicatedSpanOffsets]]: one row
    * per (doc, token position) with `__c` set iff the token is covered by
    * a [[ShingleLen]]-gram occurring in ≥ `minDocs` distinct documents. */
  private def tokenCoverage(
      corpus: DataFrame, textCol: String, idCol: String, minDocs: Int): DataFrame = {
    val w = ShingleLen
    val t = split(col(textCol), " ")
    val withToks = corpus.select(col(idCol).as("id"), t.as("__t"))
    val tokens = withToks.select(col("id"), posexplode(col("__t")).as(Seq("pos", "tok")))
    val starts = withToks.where(size(col("__t")) >= w)
      .select(col("id"), posexplode(transform(
        sequence(lit(0), size(col("__t")) - w),
        s => concat_ws(" ", slice(col("__t"), s + 1, lit(w))))).as(Seq("s", "sh")))
    val dfq = starts.groupBy("sh").agg(countDistinct(col("id")).as("__nd"))
    val covered = starts.join(dfq, Seq("sh"))
      .where(col("__nd") >= minDocs)
      .select(col("id"), explode(sequence(col("s"), col("s") + (w - 1))).as("pos"))
      .distinct()
    tokens.join(covered.withColumn("__c", lit(1L)), Seq("id", "pos"), "left")
  }

  /** E1e'' — duplicated spans as REAL OFFSETS: production span removal
    * (Lee et al. §4 emit byte ranges, not filtered tokens) reports each
    * maximal run of covered tokens as (doc, span_start, span_end) token
    * offsets PLUS (char_start, char_end) character offsets into the
    * ORIGINAL text, so the cut is surgical — `text[char_start, char_end)`
    * — without re-tokenizing. The graded row fingerprints
    * `substr(text, char_start, char_end − char_start)` per span, proving
    * the character offsets land exactly on the duplicated text, and the
    * span set partitions the covered positions ([[removeDuplicatedSpans]]'
    * n_removed equals Σ n_span_tokens — asserted in the spec).
    *
    * Scale shape: everything downstream of [[tokenCoverage]] is per-doc
    * window work (char offsets = running token-length sum; maximal runs =
    * pos − row_number gaps-and-islands) partitioned by doc id, one
    * aggregate per (doc, run), and one join back to the corpus row for the
    * substring fingerprint. Never a global window, never doc×doc.
    * Output all-int/hex: (doc_id, span_start, span_end inclusive,
    * n_span_tokens, char_start, char_end exclusive, span_fp). */
  def duplicatedSpanOffsets(
      corpus: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      minDocs: Int = 2): DataFrame = {
    val byPos = Window.partitionBy("id").orderBy("pos")
    val charred = tokenCoverage(corpus, textCol, idCol, minDocs)
      // char offset of token at pos = Σ_{j<pos} (len(tok_j) + 1 space)
      .withColumn("__cum", sum(length(col("tok")) + 1).over(byPos))
      .withColumn("__off", (col("__cum") - (length(col("tok")) + 1)).cast("long"))
    val runs = charred.where(col("__c").isNotNull)
      // gaps-and-islands: pos − covered-rank is constant per maximal run
      .withColumn("__grp", col("pos") - row_number().over(byPos))
    val spans = runs.groupBy(col("id"), col("__grp"))
      .agg(
        min(col("pos")).cast("long").as("span_start"),
        max(col("pos")).cast("long").as("span_end"),
        count(lit(1)).as("n_span_tokens"),
        min(col("__off")).as("char_start"),
        max(col("__off") + length(col("tok"))).cast("long").as("char_end"))
    spans
      .join(corpus.select(col(idCol).as("id"), col(textCol).as("__text")), Seq("id"))
      .select(col("id").as(idCol),
        col("span_start"), col("span_end"), col("n_span_tokens"),
        col("char_start"), col("char_end"),
        md5(col("__text").substr(col("char_start") + 1, col("char_end") - col("char_start"))
          .cast("binary")).as("span_fp"))
  }

  /** E1b' — LOSSLESS n-gram Jaccard similarity join via PREFIX FILTERING
    * (the AllPairs/PPJoin family: Bayardo et al., "Scaling Up All Pairs
    * Similarity Search", WWW'07). Where the MinHash/LSH path is
    * probabilistic at the CANDIDATE stage (a near-dup pair whose bands all
    * split is never seen), the prefix filter is exact: order every
    * document's distinct shingles by global rarity (document frequency
    * asc, shingle asc — a total order), and any two sets with Jaccard ≥
    * num/den must share a shingle inside BOTH of their first
    * `n − ⌈n·num/den⌉ + 1` shingles (pigeonhole on the required overlap
    * ⌈t·n⌉, witnessed by the globally-smallest common shingle). So
    * indexing only prefixes loses nothing, and the output is exactly
    * "all pairs with Jaccard ≥ num/den".
    *
    * Scale shape: the inverted index is built over PREFIX shingles only —
    * and rarity ordering puts precisely the low-df shingles in prefixes,
    * so the per-key join fan-out (Σ prefix-df²) stays small where a naive
    * share-any-shingle join explodes on stopword shingles. Two partitioned
    * windows (rank, size) per doc, one self-join on the prefix key, then
    * the exact-Jaccard verify touches candidates only. Same output shape
    * as [[nearDuplicatePairs]]: (id_a, id_b, n_common, n_a, n_b). */
  def jaccardPairsPrefix(
      corpus: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      num: Int = 3, den: Int = 5,
      maxDf: Long = DefaultHotDf,
      maxHotReps: Long = DefaultMaxHotReps,
      rawSh: Option[DataFrame] = None): DataFrame = {
    // distinct (id, shingle) feeds the ranking, the prefixes, and the
    // verify; materialized once (tiny vs the raw multiset). A caller
    // sharing one rawShingles pass across pipelines passes it in.
    val sh = rawSh.map(_.distinct())
      .getOrElse(shingles(corpus, textCol, idCol))
      .localCheckpoint(true)
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("__df"))
    val byRarity = Window.partitionBy("id").orderBy(col("__df"), col("sh"))
    val perDoc = Window.partitionBy("id")
    val prefix = sh.join(dfreq, Seq("sh"))
      .withColumn("__r", row_number().over(byRarity))
      .withColumn("__n", count(lit(1)).over(perDoc))
      // prefix length = n − ⌈n·num/den⌉ + 1, all-integer ceiling
      .where(col("__r") <= col("__n") - expr(s"(__n * $num + ${den - 1}) div $den") + 1)
      .select(col("id"), col("sh"), col("__df"))
      // BOTH self-join sides reference the prefix table — materialize it
      // once or the two ranking windows (rarity sort included) run twice
      .localCheckpoint(true)
    val groups = setGroups(sh).localCheckpoint(true)
    // COLD path: prefix×prefix restricted to shingles with df ≤ maxDf —
    // per-key fan-out ≤ maxDf² but in practice Σ prefix-df², small by the
    // rarity ordering. HOT path: the boilerplate tail (a qualifying
    // pair's smallest common shingle lands in both prefixes, so a
    // hot-witness pair has hot PREFIX entries on both sides) collapses to
    // set representatives before the join; identical-set pairs ride the
    // exact route regardless, so skipped keys (> maxHotReps reps, see
    // [[hotShingleAudit]]) can only lose non-identical pairs.
    val coldPrefix = prefix.where(col("__df") <= maxDf)
    val cand0 = coldPrefix.select(col("sh"), col("id").as("id_a"))
      .join(coldPrefix.select(col("sh"), col("id").as("id_b")), Seq("sh"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val repPrefix = prefix.where(col("__df") > maxDf)
      .join(groups.select(col("id"), col("rep")), Seq("id"))
      .select(col("sh"), col("rep")).distinct()
    val admitted = repPrefix.groupBy("sh").agg(count(lit(1)).as("__nr"))
      .where(col("__nr") <= maxHotReps).select("sh")
    val keptRep = repPrefix.join(admitted, Seq("sh"))
    val repCand = keptRep.select(col("sh"), col("rep").as("__ra"))
      .join(keptRep.select(col("sh"), col("rep").as("__rb")), Seq("sh"))
      .where(col("__ra") < col("__rb"))
      .select(col("__ra").as("id_a"), col("__rb").as("id_b"))
    val cand = cand0.unionByName(repCand)
      .unionByName(withinGroupPairs(groups)).distinct()
    // sizes ride out of the checkpointed setGroups pass — no second
    // full-shingle aggregation
    val sizes = groups.select(col("id"), col("n_sh"))
    val common = cand
      .join(sh.select(col("id").as("id_a"), col("sh")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    val verified = common
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .where(col("n_common") * den >= (col("n_a") + col("n_b") - col("n_common")) * num)
      .select("id_a", "id_b", "n_common", "n_a", "n_b")
    expandBySetGroups(verified, groups)
  }

  // -------------------------------------------------------------------
  // SimHash
  // -------------------------------------------------------------------

  val SimHashBits = 32

  /** 32-bit token hash from the first 8 hex chars of md5 — engine-portable. */
  def tokenHash32(tok: Column): Column = conv(substring(md5(tok), 1, 8), 16, 10).cast("long")

  /** E1c — 32-bit SimHash over the document's distinct-token set: bit j of
    * the fingerprint is 1 iff Σ_tokens (±1 per token-hash bit j) > 0.
    * One explode + one hash-aggregate with 32 codegen'd bit-sum columns —
    * map-side combinable, no shuffle beyond the groupBy. */
  def simhash(corpus: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tok = corpus
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("t"))
      .distinct()
      .select(col("id"), tokenHash32(col("t")).as("h"))
    val bitSums = tok.groupBy("id").agg(
      sum(when(shiftright(col("h"), 0).bitwiseAND(1) === 1, 1).otherwise(-1)).as("s_0"),
      (1 until SimHashBits).map(j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s_$j")): _*)
    bitSums.select(col("id").as("doc_id"),
      (0 until SimHashBits).map(j =>
        when(col(s"s_$j") > 0, lit(1L << j)).otherwise(lit(0L)): Column)
        .reduce(_ + _).as("simhash"))
  }

  /** Hamming distance between two SimHash fingerprints (for near-dup
    * thresholding; bit_count is codegen'd). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  val SimHashBands = 4
  val SimHashMaxHamming = 3

  /** E1c' — SimHash near-duplicate pairs: band the 32-bit fingerprint into
    * [[SimHashBands]] 8-bit buckets, join candidates per (band, value),
    * verify by exact hamming ≤ [[SimHashMaxHamming]]. The banding is
    * LOSSLESS for this threshold by pigeonhole: ≤3 differing bits cannot
    * touch all 4 bands, so every qualifying pair shares at least one
    * exact band — recall 1.0, never a doc×doc product (the MinHash/LSH
    * structure over a 32-bit signature instead of shingle sets). */
  def simhashNearDupPairs(
      corpus: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    // rep-collapse at its purest: the 32-bit value IS the content key, so
    // candidates are generated between DISTINCT fingerprint values (the
    // band self-join is sized by distinct values per bucket, capped at
    // maxBucket — [[simhashBucketAudit]] reports skips) and expanded to
    // doc pairs through the value→doc membership joins; equal-value doc
    // pairs (hamming 0) ride the exact route regardless of bucket heat
    val fps = simhash(corpus, textCol, idCol).localCheckpoint(true)
    val vbands = fps.select("simhash").distinct()
      .select(col("simhash"), posexplode(array((0 until SimHashBands).map(b =>
        shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L))): _*)).as(Seq("band", "bv")))
    val keep = vbands.groupBy("band", "bv").agg(count(lit(1)).as("__nv"))
      .where(col("__nv") <= maxBucket).select("band", "bv")
    val kept = vbands.join(keep, Seq("band", "bv"))
    val vpairs = kept.select(col("band"), col("bv"), col("simhash").as("__va"))
      .join(kept.select(col("band"), col("bv"), col("simhash").as("__vb")), Seq("band", "bv"))
      .where(col("__va") < col("__vb")).select("__va", "__vb").distinct()
      .where(hammingDistance(col("__va"), col("__vb")) <= SimHashMaxHamming)
    val cross = vpairs
      .join(fps.select(col("simhash").as("__va"), col("doc_id").as("__ia")), Seq("__va"))
      .join(fps.select(col("simhash").as("__vb"), col("doc_id").as("__ib")), Seq("__vb"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"),
        hammingDistance(col("__va"), col("__vb")).cast("long").as("hamming"))
    val within = fps.select(col("simhash"), col("doc_id").as("id_a"))
      .join(fps.select(col("simhash"), col("doc_id").as("id_b")), Seq("simhash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0L).as("hamming"))
    // disjoint by construction: cross pairs differ in value (hamming ≥ 1)
    cross.unionByName(within)
  }

  /** E1c'' — INCREMENTAL SimHash ingest: the near-dup pairs a NEW batch
    * introduces — against history AND within itself — touching history
    * ONLY via the persisted fingerprint index (doc_id, simhash). Unlike
    * [[minhashIngest]] there is no text fetch at all: the verify
    * (hamming ≤ [[SimHashMaxHamming]]) is pure fingerprint arithmetic, so
    * per batch the work is O(batch fingerprints + candidates) with history
    * entering as bytes-per-doc index rows. Candidates are generated
    * between DISTINCT fingerprint VALUES (probe side = the batch's
    * values), capped per bucket and expanded through the value→doc
    * membership joins; equal-value pairs ride the exact route. The final
    * semi-join restricts output to pairs involving a batch DOCUMENT (a
    * history doc sharing a batch value may appear mid-expansion but is
    * filtered unless its partner is in the batch). */
  def simhashIngest(
      index: DataFrame,
      batch: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val bfps = simhash(batch, textCol, idCol).localCheckpoint(true)
    val fps = index.unionByName(bfps)
    def vbandsOf(values: DataFrame): DataFrame = values
      .select(col("simhash"), posexplode(array((0 until SimHashBands).map(b =>
        shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L))): _*)).as(Seq("band", "bv")))
    val vAll = vbandsOf(fps.select("simhash").distinct())
    val keep = vAll.groupBy("band", "bv").agg(count(lit(1)).as("__nv"))
      .where(col("__nv") <= maxBucket).select("band", "bv")
    val keptAll = vAll.join(keep, Seq("band", "bv"))
    val probe = vbandsOf(bfps.select("simhash").distinct()).join(keep, Seq("band", "bv"))
    val vpairs = probe.select(col("band"), col("bv"), col("simhash").as("__va"))
      .join(keptAll.select(col("band"), col("bv"), col("simhash").as("__vb")), Seq("band", "bv"))
      .where(col("__va") =!= col("__vb")).select("__va", "__vb").distinct()
      .where(hammingDistance(col("__va"), col("__vb")) <= SimHashMaxHamming)
    val cross = vpairs
      .join(fps.select(col("simhash").as("__va"), col("doc_id").as("__ia")), Seq("__va"))
      .join(fps.select(col("simhash").as("__vb"), col("doc_id").as("__ib")), Seq("__vb"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"),
        hammingDistance(col("__va"), col("__vb")).cast("long").as("hamming"))
      .distinct() // both orders of a value pair expand to the same doc pair
    val within = fps.select(col("simhash"), col("doc_id").as("id_a"))
      .join(fps.select(col("simhash"), col("doc_id").as("id_b")), Seq("simhash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0L).as("hamming"))
    // output-sized; BOTH semi-join branches consume it — materialize once
    val pairs = cross.unionByName(within).localCheckpoint(true)
    val batchIds = bfps.select(col("doc_id"))
    pairs.join(broadcast(batchIds.select(col("doc_id").as("id_a"))), Seq("id_a"), "left_semi")
      .unionByName(
        pairs.join(broadcast(batchIds.select(col("doc_id").as("id_b"))), Seq("id_b"), "left_semi")
          .select("id_a", "id_b", "hamming"))
      .distinct()
  }

  // -------------------------------------------------------------------
  // The SimHash SERVING LAYOUT — the dedup family's second serving
  // index, at VALUE granularity (the rep-collapse carried into the
  // layout): two persisted artifacts,
  //   vrows/ (sband, band, bv, simhash)  one row per (DISTINCT value,
  //          band), partitioned by sband = md5(band#bv) mod buckets — a
  //          (band, bv) group lives entirely in its partition, so cap
  //          counting and replacement are bucket-local;
  //   docs/  (vbucket, simhash, id)      the value→doc MEMBERSHIP
  //          registry partitioned by the value's bucket — expansion and
  //          the exact equal-value route are pointed pruned lookups.
  // The new wrinkle vs the per-doc-pure layouts (minhash bands, IVF
  // cells, postings): a vrows row is NOT per-doc pure — it must exist
  // iff ≥ 1 member remains. The fold therefore derives each candidate
  // value's LIVENESS from the post-fold registry (a pointed pruned
  // read), never from a carried count — the replay-idempotence rule
  // (no carried scalars) applied to row existence itself.
  // -------------------------------------------------------------------

  /** Band-bucket assignment for the value band rows — layout-internal. */
  def simhashBandBucket(band: Column, bv: Column, buckets: Int = ServingBuckets): Column =
    conv(substring(md5(concat_ws("#", band, bv).cast("binary")), 1, 4), 16, 10)
      .cast("long") % buckets

  /** Value-bucket assignment for the membership registry — a value's
    * members live entirely in its bucket. */
  def simhashValueBucket(v: Column, buckets: Int = ServingBuckets): Column =
    pmod(v, lit(buckets.toLong))

  /** The 4×8-bit band rows of a distinct-value frame (`simhash` column). */
  private def simhashVbandsOf(values: DataFrame): DataFrame = values
    .select(col("simhash"), posexplode(array((0 until SimHashBands).map(b =>
      shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L))): _*)).as(Seq("band", "bv")))

  private[graft] val simhashVrowsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("band",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("bv",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("simhash",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("sband",
      org.apache.spark.sql.types.LongType)))
  private[graft] val simhashDocsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("simhash",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("vbucket",
      org.apache.spark.sql.types.LongType)))

  /** The serving artifact rows of a document set — (value band rows over
    * its DISTINCT fingerprint values, membership rows). Un-materialized
    * (the probe's DPP contract — see [[minhashServingRows]]). */
  def simhashServingRows(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      buckets: Int = ServingBuckets): (DataFrame, DataFrame) = {
    val fps = simhash(docs, textCol, idCol)
    val vrows = simhashVbandsOf(fps.select("simhash").distinct())
      .select(col("band"), col("bv"), col("simhash"),
        simhashBandBucket(col("band"), col("bv"), buckets).as("sband"))
    val members = fps.select(col("simhash"), col("doc_id").as("id"))
      .withColumn("vbucket", simhashValueBucket(col("simhash"), buckets))
    (vrows, members)
  }

  /** Write a document set's SimHash index in its serving layout. */
  def simhashWriteServingLayout(
      docs: DataFrame,
      vrowsPath: String,
      docsPath: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      buckets: Int = ServingBuckets): Unit = {
    val (vrows, members) = simhashServingRows(docs, textCol, idCol, buckets)
    vrows.repartition(col("sband"))
      .write.partitionBy("sband").mode("overwrite").parquet(vrowsPath)
    members.repartition(col("vbucket"))
      .write.partitionBy("vbucket").mode("overwrite").parquet(docsPath)
  }

  /** The pruned ingest probe's CANDIDATE stage over the persisted
    * layout (un-materialized — the plan lock executes it and reads the
    * scans' runtime pruning metrics): the batch's own value band rows
    * broadcast against the sband-partitioned value table, value pairs
    * verify by hamming arithmetic, and the expansion reads ONLY the
    * candidate values' membership buckets. Semantics ≡ [[simhashIngest]]
    * (value-granularity candidates, caps, equal-value route). */
  /** The probe's VALUE-PAIR stage alone, un-materialized — the banded
    * join against the sband-partitioned value table (runtime partition
    * filter from the broadcast batch side) plus the hamming cut. Exposed
    * lazily so the plan lock can execute it and read the value scan's
    * pruning metrics; [[simhashServingCandidates]] materializes it once
    * (four consumers replanted the whole banded join and made the probe
    * 6× slower than the whole-index ingest it mirrors). */
  def simhashServingValuePairs(
      spark: org.apache.spark.sql.SparkSession,
      vrowsPath: String,
      batch: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxBucket: Long = DefaultMaxBucket,
      buckets: Int = ServingBuckets,
      broadcastBytes: Long = ProbeBroadcastBytes): DataFrame = {
    val (vb0, _) = simhashServingRows(batch, textCol, idCol, buckets)
    val vb = vb0.localCheckpoint(true)
    val storedV = spark.read.schema(simhashVrowsSchema).parquet(vrowsPath)
    val vbandDim = gatedDim(
      vb0.select("sband", "band", "bv").distinct(),
      vb.select("sband", "band", "bv").distinct(),
      vb.count(), SimhashBandRowBytes, broadcastBytes)
    val probedV = storedV
      .join(vbandDim, Seq("sband", "band", "bv"))
      .select("band", "bv", "simhash")
    // probed groups' full value membership: stored values (bucket-pure,
    // so complete within the pruned slice) ∪ the batch's own values
    val vAll = probedV.unionByName(vb.select("band", "bv", "simhash")).distinct()
    val keep = vAll.groupBy("band", "bv").agg(count(lit(1)).as("__nv"))
      .where(col("__nv") <= maxBucket).select("band", "bv")
    val keptAll = vAll.join(keep, Seq("band", "bv"))
    val probe = vb.select("band", "bv", "simhash").distinct()
      .join(keep, Seq("band", "bv"))
    probe.select(col("band"), col("bv"), col("simhash").as("__va"))
      .join(keptAll.select(col("band"), col("bv"), col("simhash").as("__vb")),
        Seq("band", "bv"))
      .where(col("__va") =!= col("__vb")).select("__va", "__vb").distinct()
      .where(hammingDistance(col("__va"), col("__vb")) <= SimHashMaxHamming)
  }

  def simhashServingCandidates(
      spark: org.apache.spark.sql.SparkSession,
      vrowsPath: String,
      docsPath: String,
      batch: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxBucket: Long = DefaultMaxBucket,
      buckets: Int = ServingBuckets,
      broadcastBytes: Long = ProbeBroadcastBytes): DataFrame = {
    val (_, bm0) = simhashServingRows(batch, textCol, idCol, buckets)
    val bfps = bm0.localCheckpoint(true)
    val vpairs = simhashServingValuePairs(
      spark, vrowsPath, batch, textCol, idCol, maxBucket, buckets,
      broadcastBytes)
      .localCheckpoint(true) // candidate-pair-sized; four consumers below
    // membership of every value a pair (or the equal-value route) can
    // touch — pointed reads of the candidate values' buckets. The bucket
    // set collects to a literal (≤ ServingBuckets — the affectedValues
    // control-plane scalar), so the scan is STATICALLY partition-pruned;
    // DPP is unavailable here (the dim side is materialized candidate
    // data, not a filtered source). Left lazy so the final plan carries
    // the pruned scan for the metric lock — it is a small pruned read
    val candVals = vpairs.select(col("__va").as("simhash"))
      .unionByName(vpairs.select(col("__vb").as("simhash")))
      .unionByName(bfps.select("simhash"))
      .distinct()
      .withColumn("vbucket", simhashValueBucket(col("simhash"), buckets))
      .localCheckpoint(true)
    val candBuckets = ServingLayout.affectedValues(candVals.select("vbucket"))
    val storedM = spark.read.schema(simhashDocsSchema).parquet(docsPath)
      .where(ServingLayout.partitionIn(
        col("vbucket"), simhashDocsSchema("vbucket").dataType, candBuckets))
    // candVals is PAIR-derived (it grows with the batch's pair fan-out,
    // not the batch) — the one dim side here that genuinely needs the
    // gate; candVals is already checkpointed, so the count is cheap
    val candDim0 = candVals.select("vbucket", "simhash")
    val candDim = gatedDim(candDim0, candDim0, candVals.count(),
      SimhashValueRowBytes, broadcastBytes)
    val members = storedM
      .join(candDim, Seq("vbucket", "simhash"))
      .select(col("simhash"), col("id"))
      .unionByName(bfps.select(col("simhash"), col("id")))
    val cross = vpairs
      .join(members.select(col("simhash").as("__va"), col("id").as("__ia")), Seq("__va"))
      .join(members.select(col("simhash").as("__vb"), col("id").as("__ib")), Seq("__vb"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"),
        hammingDistance(col("__va"), col("__vb")).cast("long").as("hamming"))
      .distinct()
    val within = members.select(col("simhash"), col("id").as("id_a"))
      .join(members.select(col("simhash"), col("id").as("id_b")), Seq("simhash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0L).as("hamming"))
    val pairs = cross.unionByName(within)
    val batchIds = bfps.select(col("id"))
    pairs.join(broadcast(batchIds.select(col("id").as("id_a"))), Seq("id_a"), "left_semi")
      .unionByName(
        pairs.join(broadcast(batchIds.select(col("id").as("id_b"))), Seq("id_b"), "left_semi")
          .select("id_a", "id_b", "hamming"))
      .distinct()
  }

  /** The pruned ingest probe (the graded read): candidates materialized
    * once, nothing further to verify — hamming IS the verification. */
  def simhashServingProbe(
      spark: org.apache.spark.sql.SparkSession,
      vrowsPath: String,
      docsPath: String,
      batch: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxBucket: Long = DefaultMaxBucket,
      buckets: Int = ServingBuckets,
      broadcastBytes: Long = ProbeBroadcastBytes): DataFrame =
    simhashServingCandidates(
      spark, vrowsPath, docsPath, batch, textCol, idCol, maxBucket, buckets,
      broadcastBytes)
      .localCheckpoint(true)

  /** IN-PLACE partial maintenance of the SimHash serving layout. The
    * membership registry folds per-doc-pure (anti-join + union confined
    * to the candidate values' buckets). The value table's rows are NOT
    * per-doc pure — a value's band rows must exist iff ≥ 1 member
    * remains — so each candidate value's LIVENESS re-derives from the
    * post-fold registry via a pointed pruned read (a carried member
    * count would double-adjust on a replayed batch: the count-min
    * sum-merge lesson applied to row EXISTENCE). Candidate values = the
    * delta docs' old values (re-hashed pre-delta text — never an index
    * scan) ∪ new values; both artifacts' reads and writes are confined
    * to those values' buckets. */
  def simhashServingFold(
      spark: org.apache.spark.sql.SparkSession,
      vrowsPath: String,
      docsPath: String,
      oldDocs: DataFrame,
      newDocs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      buckets: Int = ServingBuckets): Unit = {
    val oldFps = simhash(oldDocs, textCol, idCol).localCheckpoint(true)
    val newFps = simhash(newDocs, textCol, idCol).localCheckpoint(true)
    val deltaIds = oldFps.select(col("doc_id").as("__did"))
      .union(newFps.select(col("doc_id").as("__did"))).distinct()
      .localCheckpoint(true)
    val candVals = oldFps.select("simhash").union(newFps.select("simhash"))
      .distinct().localCheckpoint(true)
    // membership registry fold (per-doc pure)
    val affectedVB = ServingLayout.affectedValues(
      candVals.select(simhashValueBucket(col("simhash"), buckets)))
    val storedM = spark.read.schema(simhashDocsSchema).parquet(docsPath)
      .where(ServingLayout.partitionIn(
        col("vbucket"), simhashDocsSchema("vbucket").dataType, affectedVB))
    val replacementM = storedM
      .join(deltaIds, col("id") === col("__did"), "left_anti")
      .select("vbucket", "simhash", "id")
      .unionByName(newFps.select(
        simhashValueBucket(col("simhash"), buckets).as("vbucket"),
        col("simhash"), col("doc_id").as("id")))
      .localCheckpoint(true) // barrier: bytes leave the path being overwritten
    replacementM.repartition(col("vbucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("vbucket")
      .parquet(docsPath)
    ServingLayout.sweepEmptied(spark, docsPath, "vbucket", affectedVB, replacementM)
    // value-table fold: liveness from the POST-fold registry — derived
    // from the in-memory materialized replacement (what the write above
    // landed for exactly the affected buckets), not a read-back of
    // docsPath: on a strongly-consistent filesystem the two are
    // identical, but an eventually-consistent store could serve
    // pre-fold bytes to a read-after-write and resurrect dead values
    val affectedSB = ServingLayout.affectedValues(
      simhashVbandsOf(candVals)
        .select(simhashBandBucket(col("band"), col("bv"), buckets)))
    val alive = replacementM
      .join(broadcast(candVals), Seq("simhash"), "left_semi")
      .select("simhash").distinct().localCheckpoint(true)
    val newVrows = simhashVbandsOf(alive)
      .select(col("band"), col("bv"), col("simhash"),
        simhashBandBucket(col("band"), col("bv"), buckets).as("sband"))
    val storedV = spark.read.schema(simhashVrowsSchema).parquet(vrowsPath)
      .where(ServingLayout.partitionIn(
        col("sband"), simhashVrowsSchema("sband").dataType, affectedSB))
    val replacementV = storedV
      .join(candVals.select(col("simhash").as("__cv")),
        col("simhash") === col("__cv"), "left_anti")
      .select("sband", "band", "bv", "simhash")
      .unionByName(newVrows.select("sband", "band", "bv", "simhash"))
      .localCheckpoint(true) // barrier
    replacementV.repartition(col("sband"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("sband")
      .parquet(vrowsPath)
    ServingLayout.sweepEmptied(spark, vrowsPath, "sband", affectedSB, replacementV)
  }

  /** Verified near-dup pairs among the documents of a persisted SimHash
    * serving layout — [[simhashNearDupPairs]] read from the two
    * artifacts (value-granularity candidates from the value table,
    * expansion + equal-value route from the membership registry). The
    * read side of the maintenance rows: fold ∘ this must equal the
    * scratch chain over the post-fold corpus.
    *
    * CONCURRENCY — the QUIESCED opt-in: [[simhashServingFold]] writes the
    * two artifacts NON-atomically (registry, then value table) — and the
    * liveness coupling (a value's band rows exist iff ≥ 1 member remains)
    * makes a torn read semantically worse than staleness: live values
    * with no members expand to nothing, stale values pair spuriously.
    * This entry is for single-writer, fold-quiesced loops only (the
    * in-place maintenance rows, which own their copied state); anything
    * concurrent with maintenance uses the generation-resolving default
    * [[simhashPairsServing]] (the ext_simhash_serving_grace_read /
    * probe_race contract). */
  def simhashPairsServingQuiesced(
      spark: org.apache.spark.sql.SparkSession,
      vrowsPath: String,
      docsPath: String,
      maxBucket: Long = DefaultMaxBucket): DataFrame =
    simhashPairsFrom(
      spark.read.schema(simhashVrowsSchema).parquet(vrowsPath),
      spark.read.schema(simhashDocsSchema).parquet(docsPath),
      maxBucket)

  /** The DEFAULT pair-listing entry point over a GENERATIONED layout
    * root (holding `vrows/` + `docs/` per generation): resolves the
    * CURRENT generation once and reads its artifact SET — the family
    * where this matters most (the liveness coupling makes a torn pair
    * wrong in both directions). Raw artifact paths are the explicit
    * opt-in ([[simhashPairsServingQuiesced]]) for single-writer,
    * fold-quiesced maintenance loops. */
  def simhashPairsServing(
      spark: org.apache.spark.sql.SparkSession,
      layoutRoot: String,
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val gen = graft.streaming.StateStream.statePath(spark, layoutRoot)
    simhashPairsServingQuiesced(spark, s"$gen/vrows", s"$gen/docs", maxBucket)
  }

  /** [[simhashPairsServing]] over already-RESOLVED artifact frames — the
    * pinned-generation reader's entry point (the [[minhashPairsFrom]]
    * twin): a long-running reader resolves BOTH artifacts of one
    * generation together, maintenance flips the pointer, and the pinned
    * read still answers the cross-artifact-CONSISTENT pre-fold pair set
    * on graced bytes. Consistency matters more here than for any
    * sibling: the liveness coupling (a value's band rows exist iff ≥ 1
    * member remains) makes a TORN pair semantically wrong in both
    * directions — live values beside a folded registry expand to
    * nothing, stale values pair spuriously. */
  def simhashPairsFrom(
      vrows: DataFrame,
      members: DataFrame,
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val keep = vrows.groupBy("band", "bv").agg(count(lit(1)).as("__nv"))
      .where(col("__nv") <= maxBucket).select("band", "bv")
    val kept = vrows.join(keep, Seq("band", "bv"))
    val vpairs = kept.select(col("band"), col("bv"), col("simhash").as("__va"))
      .join(kept.select(col("band"), col("bv"), col("simhash").as("__vb")),
        Seq("band", "bv"))
      .where(col("__va") < col("__vb")).select("__va", "__vb").distinct()
      .where(hammingDistance(col("__va"), col("__vb")) <= SimHashMaxHamming)
    val cross = vpairs
      .join(members.select(col("simhash").as("__va"), col("id").as("__ia")), Seq("__va"))
      .join(members.select(col("simhash").as("__vb"), col("id").as("__ib")), Seq("__vb"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"),
        hammingDistance(col("__va"), col("__vb")).cast("long").as("hamming"))
    val within = members.select(col("simhash"), col("id").as("id_a"))
      .join(members.select(col("simhash"), col("id").as("id_b")), Seq("simhash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0L).as("hamming"))
    cross.unionByName(within)
  }

  /** Audit of SimHash band buckets — one row per (band, byte-value)
    * bucket holding ≥ 2 documents: member count, distinct-value count
    * (post-collapse join breadth) and the action at `maxBucket`. */
  def simhashBucketAudit(
      corpus: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxBucket: Long = DefaultMaxBucket): DataFrame =
    simhash(corpus, textCol, idCol)
      .select(col("doc_id"), col("simhash"),
        posexplode(array((0 until SimHashBands).map(b =>
          shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L))): _*)).as(Seq("band", "bv")))
      .groupBy("band", "bv")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("simhash")).as("n_values"))
      .where(col("n_docs") >= 2)
      .select(col("band"), col("bv"), col("n_docs"), col("n_values"),
        when(col("n_values") <= maxBucket, lit("joined")).otherwise(lit("skipped")).as("action"))

  // -------------------------------------------------------------------
  // The EMBEDDING near-dup serving layout — the dedup family's third
  // serving index, closing the matrix (shingle/MinHash, fingerprint/
  // SimHash, vector/cosine): per-vector-pure rows (bucket, id, v, nrm)
  // partitioned by the random-hyperplane bucket. Verification (exact
  // cosine) is arithmetic over the stored rows — like SimHash, zero
  // source IO at probe time. Bucket cardinality = 2^NumPlanes — a model
  // constant, so the control-plane collects stay bounded.
  // -------------------------------------------------------------------

  private[graft] val embLayoutSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("v",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType)),
    org.apache.spark.sql.types.StructField("nrm",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("bucket",
      org.apache.spark.sql.types.LongType)))

  /** The serving rows of a vector set — norm precomputed so probe-time
    * verification is pure arithmetic over stored rows. Un-materialized
    * (the probe's DPP contract — see [[minhashServingRows]]). */
  def embDupServingRows(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.l2Norm(col(vecCol)).as("nrm"),
      Similarity.bucket(col(vecCol)).as("bucket"))

  /** Write a vector set's near-dup index in its serving layout. */
  def embDupWriteServingLayout(
      emb: DataFrame,
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit =
    embDupServingRows(emb, idCol, vecCol).repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(path)

  /** The PRUNED ingest probe: the arriving batch's own bucket
    * assignments broadcast against the bucket-partitioned layout
    * (runtime partition filter — only the batch's buckets are read),
    * candidates verify by exact cosine against the STORED (v, nrm) —
    * no source fetch. Pairs involving a batch vector, within the batch
    * included. Left lazy: verification is the candidate join itself, so
    * there is no fan-out to materialize, and the plan lock reads the
    * scan's runtime pruning metrics straight off the returned frame. */
  def embDupServingProbe(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      batch: DataFrame,
      threshold: Double = 0.9,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val b0 = embDupServingRows(batch, idCol, vecCol)
    val b = b0.localCheckpoint(true)
    val stored = spark.read.schema(embLayoutSchema).parquet(path)
    val probed = stored
      .join(broadcast(b0.select("bucket").distinct()), Seq("bucket"))
      // a batch that REVISES an already-stored id must verify against the
      // batch's vector, never the stale stored one: the batch row wins
      // (broadcast anti-join on the batch-bounded id dim) — no disjoint-id
      // precondition on probe batches
      .join(broadcast(b.select("id")), Seq("id"), "left_anti")
    val others = probed.select(col("bucket"), col("id").as("id_b"),
        col("v").as("vb"), col("nrm").as("nb"))
      .unionByName(b.select(col("bucket"), col("id").as("id_b"),
        col("v").as("vb"), col("nrm").as("nb")))
    b.select(col("bucket"), col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
      .join(others, Seq("bucket"))
      .where(col("id_a") =!= col("id_b"))
      .where(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")) >= threshold)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
  }

  /** IN-PLACE partial maintenance — per-vector pure rows, so the
    * generalized old ∪ new removal set + bucket-confined anti-join +
    * union is the whole fold (old buckets from re-bucketing the
    * pre-delta vectors at the frozen planes — never an index scan). */
  def embDupServingFold(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      oldVecs: DataFrame,
      newVecs: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val newRows = embDupServingRows(newVecs, idCol, vecCol).localCheckpoint(true)
    val affected = ServingLayout.affectedValues(
      embDupServingRows(oldVecs, idCol, vecCol).select("bucket")
        .union(newRows.select("bucket")))
    val stored = spark.read.schema(embLayoutSchema).parquet(path)
      .where(ServingLayout.partitionIn(
        col("bucket"), embLayoutSchema("bucket").dataType, affected))
    val deltaIds = oldVecs.select(col(idCol).as("__did"))
      .union(newVecs.select(col(idCol).as("__did"))).distinct()
    val replacement = stored
      .join(deltaIds, col("id") === col("__did"), "left_anti")
      .select("bucket", "id", "v", "nrm")
      .unionByName(newRows.select("bucket", "id", "v", "nrm"))
      .localCheckpoint(true) // barrier: bytes leave the path being overwritten
    replacement.repartition(col("bucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(path)
    ServingLayout.sweepEmptied(spark, path, "bucket", affected, replacement)
  }

  /** Verified near-dup pairs among the layout's vectors — the read side
    * of the maintenance rows ([[nearDuplicatesByEmbedding]] over stored
    * rows: bucket self-join + exact cosine).
    *
    * CONCURRENCY — the QUIESCED opt-in: the vector layout is a single
    * artifact, but [[embDupServingFold]]'s dynamic partition overwrite
    * rewrites the affected buckets non-atomically — a raw-path read
    * racing a fold can see half the delta applied. This entry is for
    * single-writer, fold-quiesced loops only; anything concurrent with
    * maintenance uses the generation-resolving default
    * [[embDupPairsServing]] (the ext_embdup_serving_grace_read /
    * probe_race contract). */
  def embDupPairsServingQuiesced(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      threshold: Double = 0.9,
      maxBucket: Long = DefaultMaxBucket): DataFrame =
    embDupPairsFrom(spark.read.schema(embLayoutSchema).parquet(path),
      threshold, maxBucket)

  /** The DEFAULT pair-listing entry point over a GENERATIONED layout
    * root (each generation directory IS the vecs artifact): resolves the
    * CURRENT generation once — a reader never observes a half-folded
    * bucket set under a concurrent fold. Raw artifact paths are the
    * explicit opt-in ([[embDupPairsServingQuiesced]]) for single-writer,
    * fold-quiesced maintenance loops. */
  def embDupPairsServing(
      spark: org.apache.spark.sql.SparkSession,
      layoutRoot: String,
      threshold: Double = 0.9,
      maxBucket: Long = DefaultMaxBucket): DataFrame =
    embDupPairsServingQuiesced(spark,
      graft.streaming.StateStream.statePath(spark, layoutRoot), threshold,
      maxBucket)

  /** [[embDupPairsServing]] over an already-RESOLVED layout frame — the
    * pinned-generation reader's entry point (the [[minhashPairsFrom]]
    * twin): a long-running reader resolves one generation's rows,
    * maintenance flips the pointer, and the pinned read still answers
    * the consistent pre-fold pair set on graced bytes.
    *
    * Skew guard (the minhash [[candidatePairs]] pattern): a hyperplane
    * bucket with more than `maxBucket` members is SKIPPED from the
    * self-join (at 100 TB one skewed bucket makes it quadratic in the
    * hot bucket) and reported by [[embDupBucketAudit]] — never silent.
    * IDENTICAL vectors inside a skipped bucket still pair via the exact
    * route (self-join keyed on the vector value — linear in members,
    * quadratic only in true duplicates), so exact duplicates are never
    * lost no matter how hot their bucket is. */
  def embDupPairsFrom(stored: DataFrame, threshold: Double = 0.9,
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val keep = stored.groupBy("bucket").agg(count(lit(1)).as("__nv"))
      .where(col("__nv") <= maxBucket).select("bucket")
    val kept = stored.join(keep, Seq("bucket"))
    val l = kept.select(col("bucket"), col("id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
    val r = kept.select(col("bucket"), col("id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    val cross = l.join(r, Seq("bucket")).where(col("id_a") < col("id_b"))
      .where(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")) >= threshold)
      .select("id_a", "id_b")
    // exact route: identical vectors share a bucket by construction, so
    // confining the value-keyed self-join to skipped rows is lossless —
    // and each pair lives in exactly one bucket, so no cross/exact overlap
    val skipped = stored.join(keep, Seq("bucket"), "left_anti")
    val exact = skipped.select(col("v"), col("id").as("id_a"))
      .join(skipped.select(col("v"), col("id").as("id_b")), Seq("v"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    cross.unionByName(exact)
  }

  /** Audit of the single-table embedding listing's hyperplane buckets —
    * one row per bucket holding ≥ 2 vectors: member count and whether
    * [[embDupPairsFrom]] joins or skips it at `maxBucket`. Empty means
    * the cap is inert on this layout; identical vectors inside skipped
    * buckets still pair via the exact route (the "no silent caps"
    * contract). */
  def embDupBucketAudit(stored: DataFrame,
      maxBucket: Long = DefaultMaxBucket): DataFrame =
    stored.groupBy("bucket").agg(count(lit(1)).as("n_vecs"))
      .where(col("n_vecs") >= 2)
      .select(col("bucket"), col("n_vecs"),
        when(col("n_vecs") <= maxBucket, lit("joined"))
          .otherwise(lit("skipped")).as("action"))

  // -------------------------------------------------------------------
  // MULTI-TABLE embedding near-dup serving layout — the production
  // configuration of the vector index. The single-table layout above is
  // plane-limited: one flipped hyperplane sign hides a genuine cosine-0.9
  // neighbor forever (the repo's own measurement: single-table recall ≈ 0
  // on random vectors; ~58% on the planted zero-tail near-dups). Here the
  // band rows are k=EmbTables independent 4-bit tables — the
  // topKCosineLshMulti configuration — partitioned by a (table, bucket)
  // key exactly like the MinHash band layout, beside an id-bucketed
  // vector REGISTRY (norm precomputed): candidates come from any table's
  // bucket match, verification is exact cosine over registry rows — zero
  // source IO, and probe/fold read only the batch's (table, bucket) and
  // the candidates' registry buckets.
  // -------------------------------------------------------------------

  /** The multi-table configuration (4 tables × 4 planes = the
    * [[Similarity.topKCosineLshMulti]] default — multi-table recall
    * 1−(1−p)^4 where a single fine-grained table's p collapses). */
  val EmbTables = 4
  val EmbPlanesPerTable = 4

  /** Registry partition-value cardinality — a layout constant, so the
    * fold/probe control-plane collects stay bounded. */
  val EmbRegistryBuckets = 64

  private[graft] val embTRowsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("tbucket",
      org.apache.spark.sql.types.LongType)))
  private[graft] val embVecsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("v",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType)),
    org.apache.spark.sql.types.StructField("nrm",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("vbucket",
      org.apache.spark.sql.types.LongType)))

  /** Approximate broadcast row width of the candidate-id dim (two
    * longs) — see [[ProbeBroadcastBytes]]. */
  private val EmbIdRowBytes = 24L

  /** The serving artifact ROWS of a vector set — (band rows, registry
    * rows). Band row key `tbucket` = t·2^planes + table-t bucket (one
    * Long partition key over tables × buckets); registry key = an
    * id-derived hash bucket (the exact route must never pivot ids out of
    * an index-wide scan — the minhash fp-registry shape). One derivation
    * for build, probe and fold. NOT materialized here (the probe's DPP
    * contract — see [[minhashServingRows]]). */
  def embMultiServingRows(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): (DataFrame, DataFrame) = {
    val trows = emb.select(col(idCol).as("id"),
      explode(array((0 until EmbTables).map(t =>
        lit(t.toLong * (1L << EmbPlanesPerTable)) +
          Similarity.tableBucket(col(vecCol), t, EmbPlanesPerTable)): _*))
        .as("tbucket"))
    val vecs = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.l2Norm(col(vecCol)).as("nrm"),
      pmod(col(idCol), lit(EmbRegistryBuckets.toLong)).as("vbucket"))
    (trows, vecs)
  }

  /** Write a vector set's MULTI-TABLE near-dup index in its serving
    * layout. */
  def embMultiWriteServingLayout(
      emb: DataFrame,
      trowsPath: String,
      vecsPath: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val (trows, vecs) = embMultiServingRows(emb, idCol, vecCol)
    trows.repartition(col("tbucket"))
      .write.partitionBy("tbucket").mode("overwrite").parquet(trowsPath)
    vecs.repartition(col("vbucket"))
      .write.partitionBy("vbucket").mode("overwrite").parquet(vecsPath)
  }

  /** The PRUNED multi-table ingest probe: the batch's own (table, bucket)
    * rows broadcast against the tbucket-partitioned band index (runtime
    * partition filter — only the batch's buckets of any table are read),
    * the distinct candidate pairs fetch (v, nrm) from the registry's
    * candidate buckets (statically pruned; the candidate-derived id dim
    * is [[gatedDim]]-bounded — it grows with the pair fan-out, not the
    * batch), and exact cosine verifies. Pairs involving a batch vector,
    * within the batch included. */
  def embMultiServingProbe(
      spark: org.apache.spark.sql.SparkSession,
      trowsPath: String,
      vecsPath: String,
      batch: DataFrame,
      threshold: Double = 0.9,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      broadcastBytes: Long = ProbeBroadcastBytes): DataFrame = {
    val (_, bv0) = embMultiServingRows(batch, idCol, vecCol)
    val bv = bv0.localCheckpoint(true)
    val cand = embMultiServingCandidates(spark, trowsPath, batch, idCol, vecCol)
      .localCheckpoint(true) // pair-sized; consumed by the id dim AND the verify join
    val candIds = cand.select(col("id_a").as("id"))
      .unionByName(cand.select(col("id_b").as("id"))).distinct()
      .withColumn("vbucket", pmod(col("id"), lit(EmbRegistryBuckets.toLong)))
      .localCheckpoint(true)
    val candBuckets = ServingLayout.affectedValues(candIds.select("vbucket"))
    val storedV = spark.read.schema(embVecsSchema).parquet(vecsPath)
      .where(ServingLayout.partitionIn(
        col("vbucket"), embVecsSchema("vbucket").dataType, candBuckets))
    // candIds is PAIR-derived — gated like the simhash candidate values
    val idDim0 = candIds.select("vbucket", "id")
    val idDim = gatedDim(idDim0, idDim0, candIds.count(),
      EmbIdRowBytes, broadcastBytes)
    val vsrc = storedV.join(idDim, Seq("vbucket", "id"))
      .select("id", "v", "nrm")
      // batch row wins for a REVISED stored id (a stale stored vector must
      // never pass the cosine check) — no disjoint-id precondition
      .join(broadcast(bv.select("id")), Seq("id"), "left_anti")
      .unionByName(bv.select("id", "v", "nrm"))
    cand
      .join(vsrc.select(col("id").as("id_a"), col("v").as("va"),
        col("nrm").as("na")), Seq("id_a"))
      .join(vsrc.select(col("id").as("id_b"), col("v").as("vb"),
        col("nrm").as("nb")), Seq("id_b"))
      .where(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")) >= threshold)
      .select("id_a", "id_b")
      .distinct()
  }

  /** The multi-table probe's CANDIDATE stage — the part that touches the
    * band index — un-materialized, so the plan lock can execute it and
    * read the tbucket scan's runtime pruning metrics (the checkpoint
    * inside [[embMultiServingProbe]] erases the stage from the returned
    * plan — the [[minhashServingCandidates]] convention). */
  def embMultiServingCandidates(
      spark: org.apache.spark.sql.SparkSession,
      trowsPath: String,
      batch: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val (bt0, _) = embMultiServingRows(batch, idCol, vecCol)
    val bt = bt0.localCheckpoint(true)
    val storedT = spark.read.schema(embTRowsSchema).parquet(trowsPath)
    // dim on the UN-checkpointed plan: DPP needs the batch's literal
    // filter visible (the minhashServingRows convention)
    val probedT = storedT
      .join(broadcast(bt0.select("tbucket").distinct()), Seq("tbucket"))
    val others = probedT.select(col("tbucket"), col("id").as("id_b"))
      .unionByName(bt.select(col("tbucket"), col("id").as("id_b")))
    bt.select(col("tbucket"), col("id").as("id_a"))
      .join(others, Seq("tbucket"))
      .where(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
  }

  /** IN-PLACE partial maintenance of BOTH multi-table artifacts —
    * per-vector-pure rows in each, so the generalized old ∪ new removal
    * set + partition-confined anti-join + union is the whole fold (old
    * band rows from re-bucketing the pre-delta vectors at the frozen
    * planes — never an index scan; registry buckets are id-derived).
    * Replay-idempotent: no carried scalars, every artifact a pure
    * function of (state rows, batch rows). */
  def embMultiServingFold(
      spark: org.apache.spark.sql.SparkSession,
      trowsPath: String,
      vecsPath: String,
      oldVecs: DataFrame,
      newVecs: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val (newT0, newV0) = embMultiServingRows(newVecs, idCol, vecCol)
    val newT = newT0.localCheckpoint(true)
    val newV = newV0.localCheckpoint(true)
    val (oldT, oldV) = embMultiServingRows(oldVecs, idCol, vecCol)
    val deltaIds = oldVecs.select(col(idCol).as("__did"))
      .union(newVecs.select(col(idCol).as("__did"))).distinct()
      .localCheckpoint(true)
    val affectedT = ServingLayout.affectedValues(
      oldT.select("tbucket").union(newT.select("tbucket")))
    val storedT = spark.read.schema(embTRowsSchema).parquet(trowsPath)
      .where(ServingLayout.partitionIn(
        col("tbucket"), embTRowsSchema("tbucket").dataType, affectedT))
    val replT = storedT
      .join(deltaIds, col("id") === col("__did"), "left_anti")
      .select("tbucket", "id")
      .unionByName(newT.select("tbucket", "id"))
      .localCheckpoint(true) // barrier: bytes leave the path being overwritten
    replT.repartition(col("tbucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("tbucket")
      .parquet(trowsPath)
    ServingLayout.sweepEmptied(spark, trowsPath, "tbucket", affectedT, replT)
    val affectedV = ServingLayout.affectedValues(
      oldV.select("vbucket").union(newV.select("vbucket")))
    val storedV = spark.read.schema(embVecsSchema).parquet(vecsPath)
      .where(ServingLayout.partitionIn(
        col("vbucket"), embVecsSchema("vbucket").dataType, affectedV))
    val replV = storedV
      .join(deltaIds, col("id") === col("__did"), "left_anti")
      .select("vbucket", "id", "v", "nrm")
      .unionByName(newV.select("vbucket", "id", "v", "nrm"))
      .localCheckpoint(true)
    replV.repartition(col("vbucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("vbucket")
      .parquet(vecsPath)
    ServingLayout.sweepEmptied(spark, vecsPath, "vbucket", affectedV, replV)
  }

  /** [[embMultiPairsServing]] over already-RESOLVED artifact frames —
    * the pinned-generation reader's entry point: band-bucket self-join
    * per tbucket → distinct candidate pairs → exact cosine over registry
    * rows.
    *
    * SCALE NOTE: the per-bucket quadratic term is 16× coarser per table
    * than the single-table layout's (4-bit vs 8-bit buckets) — that IS
    * the recall trade (union of k coarse tables beats one fine one).
    * The candidate term stays bucket-confined, never all-pairs, and the
    * minhash skew guard applies: a tbucket past `maxBucket` members is
    * SKIPPED from the self-join and reported by [[embMultiBucketAudit]].
    * IDENTICAL vectors land in the same tbucket in EVERY table, so the
    * exact route (value-keyed self-join over skipped-bucket members'
    * registry rows) keeps exact duplicates lossless no matter how hot
    * their buckets are; the batch-bounded [[embMultiServingProbe]]
    * remains the path sized for continuous ingestion. */
  def embMultiPairsFrom(
      trows: DataFrame,
      vecs: DataFrame,
      threshold: Double = 0.9,
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val keep = trows.groupBy("tbucket").agg(count(lit(1)).as("__nv"))
      .where(col("__nv") <= maxBucket).select("tbucket")
    val kept = trows.join(keep, Seq("tbucket"))
    val cand = kept.select(col("tbucket"), col("id").as("id_a"))
      .join(kept.select(col("tbucket"), col("id").as("id_b")), Seq("tbucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    // exact route: ids appearing in ANY skipped tbucket re-pair by vector
    // VALUE over their registry rows — identical vectors share all four
    // tbuckets, so both members of an exact-dup pair reach this join
    val skippedIds = trows.join(keep, Seq("tbucket"), "left_anti")
      .select("id").distinct()
    val skippedV = vecs.join(skippedIds, Seq("id"))
    val exact = skippedV.select(col("v"), col("id").as("id_a"))
      .join(skippedV.select(col("v"), col("id").as("id_b")), Seq("v"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    cand.unionByName(exact).distinct()
      .join(vecs.select(col("id").as("id_a"), col("v").as("va"),
        col("nrm").as("na")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb"),
        col("nrm").as("nb")), Seq("id_b"))
      .where(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")) >= threshold)
      .select("id_a", "id_b")
  }

  /** Audit of the multi-table listing's (table, bucket) band buckets —
    * one row per tbucket holding ≥ 2 ids: member count and whether
    * [[embMultiPairsFrom]] joins or skips it at `maxBucket` (identical
    * vectors inside skipped buckets still pair via the exact route). */
  def embMultiBucketAudit(trows: DataFrame,
      maxBucket: Long = DefaultMaxBucket): DataFrame =
    trows.groupBy("tbucket").agg(count(lit(1)).as("n_ids"))
      .where(col("n_ids") >= 2)
      .select(col("tbucket"), col("n_ids"),
        when(col("n_ids") <= maxBucket, lit("joined"))
          .otherwise(lit("skipped")).as("action"))

  /** Verified near-dup pairs of the multi-table layout — the QUIESCED
    * raw-path read (single-writer maintenance loops only; the
    * [[embDupPairsServingQuiesced]] concurrency contract — here the two
    * artifacts also fold non-atomically). */
  def embMultiPairsServingQuiesced(
      spark: org.apache.spark.sql.SparkSession,
      trowsPath: String,
      vecsPath: String,
      threshold: Double = 0.9,
      maxBucket: Long = DefaultMaxBucket): DataFrame =
    embMultiPairsFrom(
      spark.read.schema(embTRowsSchema).parquet(trowsPath),
      spark.read.schema(embVecsSchema).parquet(vecsPath),
      threshold, maxBucket)

  /** The DEFAULT pair-listing entry point over a GENERATIONED layout
    * root (holding `trows/` + `vecs/` per generation) — resolves the
    * CURRENT generation once; the [[minhashPairsServing]] convention. */
  def embMultiPairsServing(
      spark: org.apache.spark.sql.SparkSession,
      layoutRoot: String,
      threshold: Double = 0.9,
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val gen = graft.streaming.StateStream.statePath(spark, layoutRoot)
    embMultiPairsServingQuiesced(spark, s"$gen/trows", s"$gen/vecs", threshold,
      maxBucket)
  }

  /** E1d — embedding-cosine near-duplicate pairs, LSH-bucketed: candidates
    * are restricted to vectors sharing a random-hyperplane bucket
    * (one shuffle on the bucket key — never the corpus cross product),
    * then filtered by exact double-precision cosine ≥ threshold. Output is
    * id pairs only. */
  def nearDuplicatesByEmbedding(
      emb: DataFrame,
      threshold: Double = 0.9,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val withB = emb.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.l2Norm(col(vecCol)).as("nrm"),
      Similarity.bucket(col(vecCol)).as("bucket"))
    // same capped listing as the serving layout's read side — one code
    // path carries the hot-bucket guard for both
    embDupPairsFrom(withB, threshold, maxBucket)
  }
}
