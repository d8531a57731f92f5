package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Derived document corpus for the dedup/text-analysis operators (E1/E3).
  *
  * The driver fixture `documents.parquet` contains zero exact-duplicate
  * texts (verified at every SF), so deduplication over it would be vacuous.
  * Like the CDC feed (ChangeFeed.fromOrders), we derive a corpus with known
  * duplicates as a pure deterministic function of the fixture, mirrored
  * 1:1 by the DuckDB oracle (ExtOracle.corpusSql):
  *
  *   - every base document, unchanged;
  *   - `doc_id % 10 == 0` → an EXACT duplicate (same text, new id + source);
  *   - `doc_id % 10 == 1` → a NEAR duplicate (two tokens appended).
  */
object DocFeed {

  val ExactDupOffset = 1000000L
  val NearDupOffset = 2000000L
  val PiiDupOffset = 3000000L
  val LineDupOffset = 4000000L
  val CyrDocOffset = 5000000L
  val CjkDocOffset = 6000000L
  val MixedDocOffset = 7000000L
  val NfcDocOffset = 8000000L
  val NfdDocOffset = 9000000L

  /** Canonical-equivalence plant units: the SAME accented suffix in
    * composed (NFC: `é` = U+00E9) and decomposed (NFD: `e` + U+0301)
    * spellings. The two planted copies differ byte-wise (so every raw
    * fingerprint splits them) but are canonically equivalent — the case
    * Unicode normalization exists for. */
  val AccentNfc = " caf\u00e9 r\u00e9sum\u00e9"
  val AccentNfd = " cafe\u0301 re\u0301sume\u0301"

  /** Script-plant units (the fixture text is pure ASCII, so script
    * detection would be vacuously all-Latin without them). Whole-text
    * replacements for the Cyrillic/CJK plants — the LABEL must flip, which
    * an appended suffix on a long Latin doc never does — plus a short
    * Cyrillic suffix for the mixed-script case. */
  val CyrUnit = "привет мир "
  val CjkUnit = "你好世界 "
  val MixedSuffix = " " + CyrUnit.trim

  /** Deterministic PII suffix appended to the `doc_id % 10 == 2` copies so
    * the scrubbing operator (TextOps.scrubPii) has real matches. */
  val PiiSuffix = " contact user42@example.com or http://ex.example.org/p?q=1 id 12345"

  /** Deterministic JSON metadata with a synthetic source URL per document
    * (the fixture has no provenance column; the events fixture's `props`
    * JSON carries no URL either). Hosts hash the doc to one of 7 domains —
    * and a planted dup copy resolves to its ORIGINAL's host
    * (`(doc_id % 1000000) % 7`: every plant offset is a multiple of 1e6),
    * so within-domain dedup over the planted copies is non-vacuous. The
    * extraction machinery the graded queries exercise (get_json_object →
    * regexp host) is exactly what a real crawl corpus needs. */
  def withUrlMeta(corpus: DataFrame): DataFrame =
    corpus.withColumn("meta",
      concat(lit("{\"url\": \"https://w"),
        ((col("doc_id") % ExactDupOffset) % 7).cast("string"),
        lit(".example.com/d/"), col("doc_id").cast("string"), lit("\"}")))

  /** Deterministic MESSY url metadata for the canonicalization operator:
    * the same page identity as [[withUrlMeta]] (host `w{base%7}`, path
    * `/d/{base}` with base = `doc_id % 1e6`, so every planted copy shares
    * its ORIGINAL's page), but the surface form varies by
    * `(doc_id div 1e6 + doc_id) % 4` — plain / UPPERCASE-scheme-and-host
    * with a trailing slash / http with a tracking query / https with a
    * `www.` prefix and a fragment. A crawl sees exactly this: one page,
    * many spellings; canonicalization must collapse them. */
  def withMessyUrlMeta(corpus: DataFrame): DataFrame = {
    val base = (col("doc_id") % ExactDupOffset).cast("string")
    val h = ((col("doc_id") % ExactDupOffset) % 7).cast("string")
    val v = expr(s"(doc_id div $ExactDupOffset + doc_id) % 4")
    val url = when(v === 0,
        concat(lit("https://w"), h, lit(".example.com/d/"), base))
      .when(v === 1,
        concat(lit("HTTPS://W"), h, lit(".EXAMPLE.COM/d/"), base, lit("/")))
      .when(v === 2,
        concat(lit("http://w"), h, lit(".example.com/d/"), base, lit("?utm_source=feed")))
      .otherwise(
        concat(lit("https://www.w"), h, lit(".example.com/d/"), base, lit("#frag")))
    corpus.withColumn("meta", concat(lit("{\"url\": \""), url, lit("\"}")))
  }

  /** @param plantLines also plant `doc_id % 10 == 3` copies whose text is
    *        the original repeated across a newline — the fixture text is
    *        single-line, so the Gopher-style duplicate-LINE metric would be
    *        vacuously zero without them. Off by default: only the
    *        repetition query consumes this branch, and the shared corpus
    *        (every other E1/E3 oracle) must not shift under it.
    * @param plantScripts also plant non-Latin documents (the fixture text
    *        is pure ASCII, so script detection would be vacuously
    *        all-Latin): `% 10 == 4` → a fully-Cyrillic doc, `% 10 == 5` →
    *        a fully-CJK doc (both `repeat(unit, doc_id % 7 + 2)`),
    *        `% 10 == 6` → the original with a short Cyrillic suffix
    *        (mixed-script). Off by default for the same shared-corpus
    *        reason as `plantLines`.
    * @param plantAccents also plant `doc_id % 10 == 7` copy PAIRS carrying
    *        the same accented suffix in composed (`+8000000`, [[AccentNfc]])
    *        and decomposed (`+9000000`, [[AccentNfd]]) spellings — byte-
    *        distinct, canonically equivalent. Only the Unicode-normalized
    *        dedup consumes this branch; off by default as above. */
  def withDups(
      documents: DataFrame,
      plantLines: Boolean = false,
      plantScripts: Boolean = false,
      plantAccents: Boolean = false): DataFrame = {
    // Single scan: each source row explodes into the 1-4 corpus rows it
    // contributes (a UNION of filtered selects would scan documents several
    // times per consumer sub-tree).
    def row(id: Column, text: Column, source: Column, nChars: Column) =
      struct(id.cast("long").as("doc_id"), text.as("text"), col("lang").as("lang"),
        source.as("source"), nChars.cast("long").as("n_chars"))
    documents.select(explode(array(
      row(col("doc_id"), col("text"), col("source"), col("n_chars")),
      when(col("doc_id") % 10 === 0,
        row(col("doc_id") + lit(ExactDupOffset), col("text"), lit("dup_exact"), col("n_chars"))),
      when(col("doc_id") % 10 === 1,
        row(col("doc_id") + lit(NearDupOffset), concat(col("text"), lit(" qq zz")),
          lit("dup_near"), col("n_chars") + lit(6L))),
      when(col("doc_id") % 10 === 2,
        row(col("doc_id") + lit(PiiDupOffset), concat(col("text"), lit(PiiSuffix)),
          lit("dup_pii"), col("n_chars") + lit(PiiSuffix.length.toLong))),
      when(lit(plantLines) && col("doc_id") % 10 === 3,
        row(col("doc_id") + lit(LineDupOffset), concat(col("text"), lit("\n"), col("text")),
          lit("dup_lines"), col("n_chars") * 2 + lit(1L))),
      when(lit(plantScripts) && col("doc_id") % 10 === 4,
        row(col("doc_id") + lit(CyrDocOffset),
          expr(s"repeat('$CyrUnit', CAST(doc_id % 7 AS INT) + 2)"),
          lit("doc_cyr"), (col("doc_id") % 7 + 2) * lit(CyrUnit.length.toLong))),
      when(lit(plantScripts) && col("doc_id") % 10 === 5,
        row(col("doc_id") + lit(CjkDocOffset),
          expr(s"repeat('$CjkUnit', CAST(doc_id % 7 AS INT) + 2)"),
          lit("doc_cjk"), (col("doc_id") % 7 + 2) * lit(CjkUnit.length.toLong))),
      when(lit(plantScripts) && col("doc_id") % 10 === 6,
        row(col("doc_id") + lit(MixedDocOffset), concat(col("text"), lit(MixedSuffix)),
          lit("doc_mixed"), col("n_chars") + lit(MixedSuffix.length.toLong))),
      when(lit(plantAccents) && col("doc_id") % 10 === 7,
        row(col("doc_id") + lit(NfcDocOffset), concat(col("text"), lit(AccentNfc)),
          lit("doc_nfc"), col("n_chars") + lit(AccentNfc.length.toLong))),
      when(lit(plantAccents) && col("doc_id") % 10 === 7,
        row(col("doc_id") + lit(NfdDocOffset), concat(col("text"), lit(AccentNfd)),
          lit("doc_nfd"), col("n_chars") + lit(AccentNfd.length.toLong))))).as("__r"))
      .where(col("__r").isNotNull) // codegen'd row filter, not the HOF filter()
      .select(col("__r.*"))
  }
}
