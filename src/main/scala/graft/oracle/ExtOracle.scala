package graft.oracle

import graft.ext.{Dedup, TextOps}

/** DuckDB mirrors of the EXT operators (E1–E4). Shared numeric seeds (md5
  * hex material, stopword lists, LSH geometry) are referenced from the same
  * Scala constants as the Spark side so the two cannot drift.
  */
object ExtOracle {

  /** ≙ ext.DocFeed.withDups — keep branch-for-branch in sync. */
  val corpusSql: String =
    s"""corpus AS (
       |  SELECT doc_id, text, lang, source, n_chars FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text, lang, 'dup_exact', n_chars
       |  FROM documents WHERE doc_id % 10 = 0
       |  UNION ALL
       |  SELECT doc_id + 2000000, text || ' qq zz', lang, 'dup_near', n_chars + 6
       |  FROM documents WHERE doc_id % 10 = 1
       |  UNION ALL
       |  SELECT doc_id + 3000000, text || '${graft.ext.DocFeed.PiiSuffix}', lang, 'dup_pii',
       |         n_chars + ${graft.ext.DocFeed.PiiSuffix.length}
       |  FROM documents WHERE doc_id % 10 = 2
       |)""".stripMargin

  /** ≙ DocFeed.withDups(plantLines = true): the shared corpus plus
    * line-duplicated copies (`doc_id % 10 = 3` → +4000000, text repeated
    * across a newline) — only the repetition query consumes this branch;
    * the shared corpusSql must not shift under it. */
  val repCorpusSql: String = corpusSql.stripSuffix(")") +
    s"""  UNION ALL
       |  SELECT doc_id + ${graft.ext.DocFeed.LineDupOffset}, text || chr(10) || text, lang,
       |         'dup_lines', n_chars * 2 + 1
       |  FROM documents WHERE doc_id % 10 = 3
       |)""".stripMargin

  /** ≙ DocFeed.withDups(plantAccents = true): the shared corpus plus the
    * composed/decomposed accent-suffix copy pairs (`doc_id % 10 = 7` →
    * +8000000 NFC / +9000000 NFD) — only the normalized dedup consumes
    * this branch. The Scala constants interpolate straight into the SQL
    * literal (the script-stats oracle proves non-ASCII survives the
    * round-trip), so the two engines plant byte-identical text. */
  val accentCorpusSql: String = corpusSql.stripSuffix(")") +
    s"""  UNION ALL
       |  SELECT doc_id + ${graft.ext.DocFeed.NfcDocOffset}, text || '${graft.ext.DocFeed.AccentNfc}',
       |         lang, 'doc_nfc', n_chars + ${graft.ext.DocFeed.AccentNfc.length}
       |  FROM documents WHERE doc_id % 10 = 7
       |  UNION ALL
       |  SELECT doc_id + ${graft.ext.DocFeed.NfdDocOffset}, text || '${graft.ext.DocFeed.AccentNfd}',
       |         lang, 'doc_nfd', n_chars + ${graft.ext.DocFeed.AccentNfd.length}
       |  FROM documents WHERE doc_id % 10 = 7
       |)""".stripMargin

  /** E1a-nfc ≙ Dedup.normalizedExactGroups over the accent-planted corpus:
    * both engines implement UAX #15 NFC (java.text.Normalizer / utf8proc),
    * so normalized bytes — and therefore the md5 groups — agree exactly. */
  val nfcDedupSql: String =
    s"""WITH $accentCorpusSql
       |SELECT md5(nfc_normalize(text)) AS fingerprint, min(doc_id) AS keep_id,
       |  CAST(count(*) AS BIGINT) AS n_copies,
       |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_raw_forms
       |FROM corpus
       |GROUP BY 1
       |HAVING count(*) > 1
       |ORDER BY keep_id""".stripMargin

  /** Row-local duplicate-word-trigram count expression over a `toks` list
    * ref — shared by the repetition report and the funnel's repetition
    * gate (≙ TextOps.dupTrigramBp's WordShingles + array_distinct). */
  private def triDupsSql(toks: String): String = {
    val w = 3 // Gopher's metric is trigram by definition, NOT Dedup.ShingleLen
    s"(len($toks) - ${w - 1} - len(list_distinct(list_transform(range(len($toks) - ${w - 1}), " +
      s"i -> ${ngramConcat(toks, w)}))))"
  }

  /** E3i ≙ TextOps.repetitionStats over the line-planted corpus: Gopher/C4
    * repetition signals as integer basis points. */
  val repetitionSql: String =
    s"""WITH $repCorpusSql, t AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS toks,
       |         string_split(text, chr(10)) AS lines
       |  FROM corpus
       |), base AS (
       |  SELECT doc_id,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    CAST((len(lines) - len(list_distinct(lines))) * 10000 // len(lines) AS BIGINT)
       |      AS dup_line_bp,
       |    CAST(CASE WHEN len(toks) >= 3
       |      THEN ${triDupsSql("toks")} * 10000 // (len(toks) - 2)
       |      ELSE 0 END AS BIGINT) AS dup_tri_bp,
       |    CAST(len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) * 10000 // len(toks)
       |      AS BIGINT) AS sym_word_bp,
       |    len(toks) - 1 AS n_bigrams
       |  FROM t
       |), big AS (
       |  SELECT doc_id, ${ngramConcat("toks", 2)} AS bg
       |  FROM t, (SELECT unnest(range((SELECT max(len(toks)) FROM t))) AS i) ix
       |  WHERE i <= len(toks) - 2
       |), c AS (
       |  SELECT doc_id, bg, count(*) AS cnt FROM big GROUP BY doc_id, bg
       |), top AS (
       |  SELECT doc_id, bg AS top_bigram, cnt,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bg) AS rn
       |  FROM c
       |)
       |SELECT b.doc_id, b.n_lines, b.dup_line_bp, b.dup_tri_bp, b.sym_word_bp,
       |  tp.top_bigram, CAST(tp.cnt * 10000 // b.n_bigrams AS BIGINT) AS top_bigram_bp
       |FROM base b JOIN top tp ON tp.doc_id = b.doc_id AND tp.rn = 1
       |ORDER BY b.doc_id""".stripMargin

  /** E1a ≙ Dedup.exactGroups. */
  val dedupExactSql: String =
    s"""WITH $corpusSql
       |SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id, count(*) AS n_copies
       |FROM corpus
       |GROUP BY md5(text)
       |ORDER BY keep_id""".stripMargin

  /** Shared shingle CTEs (word 3-grams, distinct per doc). DuckDB's
    * range() table function can't take a per-row bound, so the shingle
    * index list is generated once from the corpus's own max token count
    * (list-returning scalar range() + unnest) — no hardcoded cap to
    * silently truncate a long doc. The i-filter reproduces Spark's
    * sequence(0, size-3). */
  /** Space-joined [[Dedup.ShingleLen]]-gram over a 1-based `toks` list
    * starting at 0-based `i` — generated from the SAME constant as the
    * loop bounds so shingle width and construction cannot diverge. */
  private def shingleConcat(toks: String, i: String = "i"): String =
    ngramConcat(toks, Dedup.ShingleLen, i)

  /** Space-joined `w`-gram over a 1-based list starting at 0-based `i` —
    * ALL n-gram SQL (shingles, Gopher trigram, top-bigram, bigram LM) is
    * generated from its width constant so width and concatenation cannot
    * silently diverge (the r7/r8 ADVICE trap). */
  private def ngramConcat(toks: String, w: Int, i: String = "i"): String =
    (1 to w).map(o => s"$toks[$i+$o]").mkString(" || ' ' || ")

  /** The shingle chain over an arbitrary corpus-shaped CTE `src`
    * (doc_id, text) — the CDC-composed dedup oracles thread a post-delta
    * corpus through the SAME chain; `shingleCtesOver("corpus")` is the
    * historical text byte-for-byte. */
  /** @param sfx suffix for every CTE name — lets the chain coexist with
    *        another shingle chain in one WITH list (the probe-race oracle
    *        composes the pre- and post-fold chains); "" keeps the
    *        historical text byte-identical. */
  private def shingleCtesOver(src: String, sfx: String = ""): String =
    s"""tok$sfx AS (
       |  SELECT doc_id AS id, text, string_split(text, ' ') AS toks FROM $src
       |), idx$sfx AS (
       |  SELECT unnest(range((SELECT max(len(toks)) FROM tok$sfx))) AS i
       |), sh$sfx AS (
       |  SELECT DISTINCT id, ${shingleConcat("toks")} AS sh
       |  FROM tok$sfx, idx$sfx
       |  WHERE i <= len(toks) - ${Dedup.ShingleLen}
       |)""".stripMargin

  private val shingleCtes: String = shingleCtesOver("corpus")

  /** ≙ Dedup.incrementalNew (existing = base documents, incoming = the
    * dup-planted corpus): survivors are the fingerprints the base table
    * has never seen — the modified-dup branches, never the exact copies. */
  val dedupIngestSql: String =
    s"""WITH $corpusSql, inc AS (
       |  SELECT md5(text) AS fp, min(doc_id) AS doc_id, count(*) AS n_in_batch
       |  FROM corpus GROUP BY md5(text)
       |)
       |SELECT fp, doc_id, n_in_batch
       |FROM inc
       |WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE md5(d.text) = inc.fp)
       |ORDER BY doc_id""".stripMargin

  /** Shared CTE chain ending in `pairs` = the verified near-dup pairs
    * (MinHash → LSH bands → candidate join → exact-Jaccard ≥ 3/5) —
    * consumed by the pair listing, the cluster assignment, and the
    * leakage-safe split. */
  /** The MinHash → bands → candidate → verify chain over a shingle source
    * CTE `shSrc` (id, sh). Parameterized so the forget variant can run the
    * IDENTICAL chain over the surviving shingles — per-doc signatures
    * don't depend on other documents, so scratch-over-survivors is what a
    * filtered stored index must reproduce. */
  /** @param sfx CTE-name suffix, the [[shingleCtesOver]] convention —
    *        "" keeps the historical text byte-identical. */
  private def pairCtesOver(shSrc: String, sfx: String = ""): String =
    s"""mh$sfx AS (
       |  SELECT id, h,
       |    min(substr(md5((h // 4)::VARCHAR || ':' || sh), (h % 4) * 8 + 1, 8)) AS mh
       |  FROM $shSrc, range(${Dedup.NumHashes}) hh(h)
       |  GROUP BY id, h
       |), bands$sfx AS (
       |  SELECT id, (h // ${Dedup.BandSize}) AS band, string_agg(mh, '|' ORDER BY h) AS sig
       |  FROM mh$sfx GROUP BY id, (h // ${Dedup.BandSize})
       |), cand$sfx AS (
       |  SELECT DISTINCT l.id AS id_a, r.id AS id_b
       |  FROM bands$sfx l JOIN bands$sfx r ON l.band = r.band AND l.sig = r.sig AND l.id < r.id
       |), common$sfx AS (
       |  SELECT c.id_a, c.id_b, count(*) AS n_common
       |  FROM cand$sfx c
       |  JOIN $shSrc a ON a.id = c.id_a
       |  JOIN $shSrc b ON b.id = c.id_b AND b.sh = a.sh
       |  GROUP BY c.id_a, c.id_b
       |), sizes$sfx AS (
       |  SELECT id, count(*) AS n_sh FROM $shSrc GROUP BY id
       |), pairs$sfx AS (
       |  SELECT c.id_a, c.id_b, c.n_common, sa.n_sh AS n_a, sb.n_sh AS n_b
       |  FROM common$sfx c
       |  JOIN sizes$sfx sa ON sa.id = c.id_a
       |  JOIN sizes$sfx sb ON sb.id = c.id_b
       |  WHERE c.n_common * 5 >= (sa.n_sh + sb.n_sh - c.n_common) * 3
       |)""".stripMargin

  private val pairCtes: String =
    s"""$corpusSql, $shingleCtes, ${pairCtesOver("sh")}"""

  /** E1-eval ≙ the HONEST-MEASUREMENT row for the probabilistic dedup:
    * MinHash banding's recall against the exact all-pairs Jaccard ground
    * truth, plus its false-positive count (always 0 — candidates are
    * exact-verified at the same threshold). The prefix-filter and
    * containment joins are PROVEN lossless by their own oracles; this row
    * quantifies what the cheaper probabilistic path actually trades. */
  val dedupEvalSql: String =
    s"""WITH $pairCtes, gcommon AS (
       |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
       |  FROM sh a JOIN sh b ON b.sh = a.sh AND a.id < b.id
       |  GROUP BY a.id, b.id
       |), truth AS MATERIALIZED (
       |  SELECT c.id_a, c.id_b FROM gcommon c
       |  JOIN sizes sa ON sa.id = c.id_a
       |  JOIN sizes sb ON sb.id = c.id_b
       |  WHERE c.n_common * 5 >= (sa.n_sh + sb.n_sh - c.n_common) * 3
       |)
       |SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
       |  CAST((SELECT count(*) FROM truth t
       |        JOIN pairs p ON p.id_a = t.id_a AND p.id_b = t.id_b) AS BIGINT)
       |    AS n_found,
       |  CAST((SELECT count(*) FROM truth t
       |        JOIN pairs p ON p.id_a = t.id_a AND p.id_b = t.id_b) * 10000
       |     // (SELECT count(*) FROM truth) AS BIGINT) AS recall_bp,
       |  CAST((SELECT count(*) FROM pairs p WHERE NOT EXISTS (
       |     SELECT 1 FROM truth t
       |     WHERE t.id_a = p.id_a AND t.id_b = p.id_b)) AS BIGINT) AS n_extra""".stripMargin

  /** E1b ≙ Dedup.nearDuplicatePairs (MinHash → LSH bands → candidate join →
    * exact-Jaccard verify, threshold 3/5). */
  val dedupMinhashSql: String =
    s"""WITH $pairCtes
       |SELECT id_a, id_b, n_common, n_a, n_b
       |FROM pairs
       |ORDER BY id_a, id_b""".stripMargin

  /** ≙ the ext_minhash_forget fold: subject deletion (doc_id % 7 = 3) is a
    * row filter on the stored signature index; the surviving pair set must
    * equal this from-scratch recompute over the surviving corpus. The
    * planted offsets shift residues mod 7 (+1000000 ≡ +1, +2000000 ≡ +2,
    * +3000000 ≡ +3), so deletion hits dup groups from BOTH sides: some
    * originals outlive their forgotten copy, some copies their forgotten
    * original — either way the partner pair vanishes while pairs among
    * survivors persist. */
  val minhashForgetSql: String =
    s"""WITH $corpusSql, $shingleCtes, shv AS (
       |  SELECT * FROM sh WHERE id % 7 <> 3
       |), ${pairCtesOver("shv")}
       |SELECT id_a, id_b, n_common, n_a, n_b
       |FROM pairs
       |ORDER BY id_a, id_b""".stripMargin

  /** E1b'''' ≙ Dedup.minhashIngest (history = base documents, batch = the
    * planted rows, ids ≥ DocFeed.ExactDupOffset): the incremental path —
    * persisted signature index + batch-only shingling + pointed candidate
    * fetch — must produce EXACTLY the pairs the full banding recompute
    * yields, restricted to pairs involving a batch document. */
  val minhashIngestSql: String =
    s"""WITH $pairCtes
       |SELECT id_a, id_b, n_common, n_a, n_b
       |FROM pairs
       |WHERE id_a >= ${graft.ext.DocFeed.ExactDupOffset}
       |   OR id_b >= ${graft.ext.DocFeed.ExactDupOffset}
       |ORDER BY id_a, id_b""".stripMargin

  /** E1b'' ≙ Dedup.jaccardPairsPrefix — the oracle is the EXACT all-pairs
    * ground truth (naive share-a-shingle join, Jaccard ≥ 3/5). A green row
    * therefore proves the prefix filter LOSSLESS — it finds every
    * qualifying pair while only ever indexing rarity-ordered prefixes —
    * not merely self-consistent (contrast `dedupMinhashSql`, whose oracle
    * replays the probabilistic banding). */
  val jaccardPrefixSql: String =
    s"""WITH $corpusSql, $shingleCtes, common AS (
       |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
       |  FROM sh a JOIN sh b ON b.sh = a.sh AND a.id < b.id
       |  GROUP BY a.id, b.id
       |), sizes AS (
       |  SELECT id, count(*) AS n_sh FROM sh GROUP BY id
       |)
       |SELECT c.id_a, c.id_b, c.n_common, sa.n_sh AS n_a, sb.n_sh AS n_b
       |FROM common c
       |JOIN sizes sa ON sa.id = c.id_a
       |JOIN sizes sb ON sb.id = c.id_b
       |WHERE c.n_common * 5 >= (sa.n_sh + sb.n_sh - c.n_common) * 3
       |ORDER BY id_a, id_b""".stripMargin

  /** E1b''' ≙ Dedup.containmentPairs — the oracle is the EXACT all-pairs
    * ground truth (naive share-a-shingle join, containment of the smaller
    * set ≥ 9/10), so a green row proves the asymmetric prefix probe
    * LOSSLESS — it finds every subset pair MinHash banding would miss
    * (the larger doc's band minima come from its own non-shared
    * shingles). */
  val containmentPairsSql: String =
    s"""WITH $corpusSql, $shingleCtes, common AS (
       |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
       |  FROM sh a JOIN sh b ON b.sh = a.sh AND a.id < b.id
       |  GROUP BY a.id, b.id
       |), sizes AS (
       |  SELECT id, count(*) AS n_sh FROM sh GROUP BY id
       |)
       |SELECT c.id_a, c.id_b, c.n_common, sa.n_sh AS n_a, sb.n_sh AS n_b
       |FROM common c
       |JOIN sizes sa ON sa.id = c.id_a
       |JOIN sizes sb ON sb.id = c.id_b
       |WHERE c.n_common * 10 >= least(sa.n_sh, sb.n_sh) * 9
       |ORDER BY id_a, id_b""".stripMargin

  /** E1e ≙ Dedup.duplicatedShingleShare — duplicated-span share per doc
    * (shingle-granular substring-dedup evidence): a shingle is duplicated
    * iff its corpus document frequency ≥ 2. */
  val substringDedupSql: String =
    s"""WITH $corpusSql, $shingleCtes, dfreq AS (
       |  SELECT sh, count(*) AS df FROM sh GROUP BY sh
       |)
       |SELECT s.id AS doc_id, count(*) AS n_shingles,
       |  CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_shingles,
       |  CAST(CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 10000 // count(*)
       |    AS BIGINT) AS dup_span_bp
       |FROM sh s JOIN dfreq d ON d.sh = s.sh
       |GROUP BY s.id
       |ORDER BY doc_id""".stripMargin

  /** E1e' ≙ Dedup.removeDuplicatedSpans — token removed iff covered by a
    * trigram occurring in ≥2 distinct docs; survivors reassembled in
    * original order and fingerprinted. */
  val spanRemovalSql: String =
    s"""WITH $corpusSql, tk AS (
       |  SELECT doc_id AS id, string_split(text, ' ') AS toks,
       |         len(string_split(text, ' ')) AS n
       |  FROM corpus
       |), idx AS (
       |  SELECT unnest(range((SELECT max(n) FROM tk))) AS i
       |), tok AS (
       |  SELECT id, i AS pos, toks[i+1] AS tok FROM tk, idx WHERE i < n
       |), st AS (
       |  SELECT id, i AS s, ${shingleConcat("toks")} AS sh
       |  FROM tk, idx WHERE i <= n - ${Dedup.ShingleLen}
       |), dfq AS (
       |  SELECT sh, count(DISTINCT id) AS nd FROM st GROUP BY sh
       |), dup AS (
       |  SELECT st.id, st.s FROM st JOIN dfq ON dfq.sh = st.sh WHERE dfq.nd >= 2
       |), cov AS (
       |  SELECT DISTINCT id, s + o AS pos FROM dup, range(${Dedup.ShingleLen}) t(o)
       |), j AS (
       |  SELECT t.id, t.pos, t.tok, c.pos IS NOT NULL AS covered
       |  FROM tok t LEFT JOIN cov c ON c.id = t.id AND c.pos = t.pos
       |)
       |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN covered THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |  md5(coalesce(string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE NOT covered), ''))
       |    AS kept_fp
       |FROM j GROUP BY id
       |ORDER BY doc_id""".stripMargin

  /** E1e'' ≙ Dedup.duplicatedSpanOffsets — maximal covered runs as token
    * offsets + character offsets into the ORIGINAL text, each span
    * fingerprinted via substr(text, char_start+1, len) so both engines
    * prove the offsets land exactly on the duplicated characters. */
  val spanOffsetsSql: String =
    s"""WITH $corpusSql, tk AS (
       |  SELECT doc_id AS id, text, string_split(text, ' ') AS toks,
       |         len(string_split(text, ' ')) AS n
       |  FROM corpus
       |), idx AS (
       |  SELECT unnest(range((SELECT max(n) FROM tk))) AS i
       |), tok AS (
       |  SELECT id, i AS pos, toks[i+1] AS tok FROM tk, idx WHERE i < n
       |), st AS (
       |  SELECT id, i AS s, ${shingleConcat("toks")} AS sh
       |  FROM tk, idx WHERE i <= n - ${Dedup.ShingleLen}
       |), dfq AS (
       |  SELECT sh, count(DISTINCT id) AS nd FROM st GROUP BY sh
       |), dup AS (
       |  SELECT st.id, st.s FROM st JOIN dfq ON dfq.sh = st.sh WHERE dfq.nd >= 2
       |), cov AS (
       |  SELECT DISTINCT id, s + o AS pos FROM dup, range(${Dedup.ShingleLen}) t(o)
       |), ch AS (
       |  SELECT id, pos, tok,
       |    CAST(sum(len(tok) + 1) OVER (PARTITION BY id ORDER BY pos)
       |         - (len(tok) + 1) AS BIGINT) AS off
       |  FROM tok
       |), cv AS (
       |  SELECT ch.id, ch.pos, ch.tok, ch.off,
       |    ch.pos - row_number() OVER (PARTITION BY ch.id ORDER BY ch.pos) AS grp
       |  FROM ch JOIN cov ON cov.id = ch.id AND cov.pos = ch.pos
       |), sp AS (
       |  SELECT id, grp,
       |    CAST(min(pos) AS BIGINT) AS span_start,
       |    CAST(max(pos) AS BIGINT) AS span_end,
       |    CAST(count(*) AS BIGINT) AS n_span_tokens,
       |    CAST(min(off) AS BIGINT) AS char_start,
       |    CAST(max(off + len(tok)) AS BIGINT) AS char_end
       |  FROM cv GROUP BY id, grp
       |)
       |SELECT sp.id AS doc_id, span_start, span_end, n_span_tokens,
       |  char_start, char_end,
       |  md5(substr(tk.text, CAST(char_start + 1 AS INT),
       |             CAST(char_end - char_start AS INT))) AS span_fp
       |FROM sp JOIN tk ON tk.id = sp.id
       |ORDER BY doc_id, span_start""".stripMargin

  /** E3m ≙ TextOps.qualityModelScore — fastText-shape linear classifier:
    * hashed word uni+bigram features into ${TextOps.QmDim} buckets,
    * md5-derived signed bucket weights, mean-pooled integer score. The
    * weight math re-derives the SAME md5 chain as the Spark side
    * (feature → 32-bit bucket → 'qw:'-salted weight). */
  val qualityModelSql: String = {
    val dim = TextOps.QmDim
    val span = TextOps.QmWeightSpan
    s"""WITH $corpusSql, tk AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks,
       |         len(string_split(text, ' ')) AS n
       |  FROM corpus
       |), idx AS (
       |  SELECT unnest(range((SELECT max(n) FROM tk))) AS i
       |), feats AS (
       |  SELECT doc_id, toks[i+1] AS feat FROM tk, idx WHERE i < n
       |  UNION ALL
       |  SELECT doc_id, ${ngramConcat("toks", 2)} FROM tk, idx WHERE i <= n - 2
       |), wt AS (
       |  SELECT doc_id,
       |    (('0x' || substr(md5('qw:' ||
       |        ((('0x' || substr(md5(feat), 1, 8))::BIGINT % $dim))::VARCHAR
       |      ), 1, 8))::BIGINT % ${2 * span + 1}) - $span AS w
       |  FROM feats
       |)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_features,
       |  CAST(sum(w) AS BIGINT) AS score_sum,
       |  CAST(CAST(sum(w) AS BIGINT) * 100 // count(*) AS BIGINT) AS model_score,
       |  CASE WHEN CAST(sum(w) AS BIGINT) * 100 // count(*) >= 0
       |       THEN 'keep' ELSE 'drop' END AS verdict
       |FROM wt GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
  }

  /** E3j ≙ TextOps.heavyHitters — count-min sketch (4 lanes × 64 cells)
    * over the token stream; estimate = min over the token's cells, exact
    * count alongside so the overestimate is graded too. Lane hashes are
    * the same '0:'-salted md5 lanes the Spark side's Md5Lanes computes.
    * `where` restricts the corpus slice — "TRUE" is the direct sketch;
    * a survivor filter is the scratch twin of the exact cell-subtraction
    * forget ([[graft.ext.TextOps.cmForget]]). */
  private def heavyHittersSqlWhere(where: String): String =
    s"""WITH $corpusSql, tok AS (
       |  SELECT unnest(string_split(text, ' ')) AS t FROM corpus WHERE $where
       |), cnt AS (
       |  SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY t
       |), lanes AS (
       |  SELECT t, c, h AS lane,
       |    ('0x' || substr(md5('0:' || t), h * 8 + 1, 8))::BIGINT % ${TextOps.CmWidth} AS bucket
       |  FROM cnt, range(${TextOps.CmLanes}) hh(h)
       |), cm AS (
       |  SELECT lane, bucket, CAST(sum(c) AS BIGINT) AS cell
       |  FROM lanes GROUP BY lane, bucket
       |), est AS (
       |  SELECT l.t, min(cm.cell) AS est_count, min(l.c) AS true_count
       |  FROM lanes l JOIN cm ON cm.lane = l.lane AND cm.bucket = l.bucket
       |  GROUP BY l.t
       |)
       |SELECT t AS token, est_count, true_count FROM est
       |ORDER BY est_count DESC, token
       |LIMIT 20""".stripMargin

  val heavyHittersSql: String = heavyHittersSqlWhere("TRUE")

  /** ≙ the ext_cm_forget fold: subject deletion (doc_id % 7 = 3) from the
    * persisted additive cell state equals the sketch built over the
    * survivors alone — so the oracle just runs the direct sketch on the
    * survivor slice (dictionary AND cells). */
  val cmForgetSql: String = heavyHittersSqlWhere("doc_id % 7 <> 3")

  /** ≙ ext_cm_grace_read: a reader that resolved the sketch generation
    * BEFORE a fold flipped the pointer serves the PRE-fold state, so the
    * oracle is the scratch sketch of the pre-fold slice alone — visibly
    * different from the post-fold sketch a fresh reader would get. */
  val cmGraceReadSql: String = heavyHittersSqlWhere("doc_id % 5 <> 0")

  /** ≙ ext.Cluster.clusters over Dedup.nearDuplicatePairs: connected
    * components (min reachable id) via a recursive transitive-closure CTE
    * — tractable because dup components are tiny; the Spark side uses
    * distributed min-label propagation instead. Singletons keep their own
    * id. */
  val dedupClustersSql: String =
    s"""WITH RECURSIVE $pairCtes, und AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION
       |  SELECT id_b, id_a FROM pairs
       |), reach AS (
       |  SELECT DISTINCT src AS id, src AS r FROM und
       |  UNION
       |  SELECT u.dst AS id, reach.r FROM reach JOIN und u ON u.src = reach.id
       |), comp AS (
       |  SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
       |)
       |SELECT c.doc_id, CAST(coalesce(comp.cluster_id, c.doc_id) AS BIGINT) AS cluster_id
       |FROM corpus c LEFT JOIN comp ON comp.id = c.doc_id
       |ORDER BY doc_id""".stripMargin

  /** ≙ the ext_dedup_clusters_forget fold: from-scratch clustering over
    * the surviving corpus (doc_id % 7 <> 3) — what passing untouched
    * components through and re-solving only the subject's components must
    * reproduce exactly (a deletion can split a component and steal its
    * min label; both re-derive here). */
  val dedupClustersForgetSql: String =
    s"""WITH RECURSIVE $corpusSql, $shingleCtes, shv AS (
       |  SELECT * FROM sh WHERE id % 7 <> 3
       |), ${pairCtesOver("shv")}, und AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION
       |  SELECT id_b, id_a FROM pairs
       |), reach AS (
       |  SELECT DISTINCT src AS id, src AS r FROM und
       |  UNION
       |  SELECT u.dst AS id, reach.r FROM reach JOIN und u ON u.src = reach.id
       |), comp AS (
       |  SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
       |)
       |SELECT c.doc_id, CAST(coalesce(comp.cluster_id, c.doc_id) AS BIGINT) AS cluster_id
       |FROM corpus c LEFT JOIN comp ON comp.id = c.doc_id
       |WHERE c.doc_id % 7 <> 3
       |ORDER BY doc_id""".stripMargin

  /** ≙ ext.Cluster.representatives: per cluster keep the fullest member
    * (most tokens, doc_id tiebreak — a total order both engines rank
    * identically). */
  val dedupRepresentativesSql: String =
    s"""WITH RECURSIVE $pairCtes, und AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION
       |  SELECT id_b, id_a FROM pairs
       |), reach AS (
       |  SELECT DISTINCT src AS id, src AS r FROM und
       |  UNION
       |  SELECT u.dst AS id, reach.r FROM reach JOIN und u ON u.src = reach.id
       |), comp AS (
       |  SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
       |), assigned AS (
       |  SELECT c.doc_id, CAST(len(string_split(c.text, ' ')) AS BIGINT) AS n_tokens,
       |         CAST(coalesce(comp.cluster_id, c.doc_id) AS BIGINT) AS cluster_id
       |  FROM corpus c LEFT JOIN comp ON comp.id = c.doc_id
       |), r AS (
       |  SELECT cluster_id, doc_id, n_tokens,
       |    row_number() OVER (PARTITION BY cluster_id ORDER BY n_tokens DESC, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY cluster_id) AS n_members,
       |    CAST(max(n_tokens) OVER (PARTITION BY cluster_id) AS BIGINT) AS keep_tokens
       |  FROM assigned
       |)
       |SELECT cluster_id, doc_id AS keep_id, keep_tokens, n_members
       |FROM r WHERE rn = 1
       |ORDER BY cluster_id""".stripMargin

  /** ≙ ext.Cluster.duplicateWeights — soft-dedup training weights:
    * weight_bp = 10000 div near-dup cluster size, every document kept. */
  val dedupWeightsSql: String =
    s"""WITH RECURSIVE $pairCtes, und AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION
       |  SELECT id_b, id_a FROM pairs
       |), reach AS (
       |  SELECT DISTINCT src AS id, src AS r FROM und
       |  UNION
       |  SELECT u.dst AS id, reach.r FROM reach JOIN und u ON u.src = reach.id
       |), comp AS (
       |  SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
       |), assigned AS (
       |  SELECT c.doc_id, CAST(coalesce(comp.cluster_id, c.doc_id) AS BIGINT) AS cluster_id
       |  FROM corpus c LEFT JOIN comp ON comp.id = c.doc_id
       |), sz AS (
       |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
       |  FROM assigned GROUP BY cluster_id
       |)
       |SELECT a.doc_id, a.cluster_id, s.n_members,
       |  CAST(10000 // s.n_members AS BIGINT) AS weight_bp
       |FROM assigned a JOIN sz s USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  /** ≙ ext.Cluster.leakageSafeSplit: 98/1/1 hash split keyed on the
    * CLUSTER id, so a near-dup cluster can never straddle splits. */
  val splitSafeSql: String =
    s"""WITH RECURSIVE $pairCtes, und AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION
       |  SELECT id_b, id_a FROM pairs
       |), reach AS (
       |  SELECT DISTINCT src AS id, src AS r FROM und
       |  UNION
       |  SELECT u.dst AS id, reach.r FROM reach JOIN und u ON u.src = reach.id
       |), comp AS (
       |  SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
       |), assigned AS (
       |  SELECT c.doc_id, CAST(coalesce(comp.cluster_id, c.doc_id) AS BIGINT) AS cluster_id
       |  FROM corpus c LEFT JOIN comp ON comp.id = c.doc_id
       |), s AS (
       |  SELECT cluster_id,
       |    CASE WHEN b < 98 THEN 'train' WHEN b < 99 THEN 'val' ELSE 'test' END AS split
       |  FROM (SELECT cluster_id,
       |          ('0x' || substr(md5(cluster_id::VARCHAR), 1, 4))::BIGINT % 100 AS b
       |        FROM assigned) t
       |)
       |SELECT split, count(*) AS n_docs, count(DISTINCT cluster_id) AS n_clusters
       |FROM s GROUP BY split
       |ORDER BY split""".stripMargin

  /** ≙ ext.Packing.stratifiedSample (1/10 per lang, md5-ordered, integer
    * keep rule r*den <= n*num). */
  val sampleStratifiedSql: String =
    s"""WITH $corpusSql, b AS (
       |  SELECT lang, doc_id,
       |    row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS r,
       |    count(*) OVER (PARTITION BY lang) AS n
       |  FROM corpus
       |)
       |SELECT lang, max(n) AS n_total, count(*) AS n_kept,
       |  CAST(sum(doc_id) AS BIGINT) AS sum_kept_ids
       |FROM b WHERE r * 10 <= n * 1
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  /** E1c ≙ Dedup.simhash (32-bit, distinct-token set, md5-derived hashes). */
  /** The SimHash chain (→ `sims(id, simhash)`) over an arbitrary
    * corpus-shaped CTE — the CDC-composed and survivor-sliced oracles
    * thread their own source; `simhashChainOver("corpus")` is the
    * historical text byte-for-byte. */
  /** @param sfx suffix for every CTE name — lets the chain coexist with
    *        other chains in one WITH list (the freshness oracle composes
    *        it beside the BM25 chain). */
  private def simhashChainOver(src: String, sfx: String = ""): String =
    s"""tok0$sfx AS (
       |  SELECT doc_id AS id, unnest(string_split(text, ' ')) AS t FROM $src
       |), tokd$sfx AS (
       |  SELECT DISTINCT id, t FROM tok0$sfx
       |), hh$sfx AS (
       |  SELECT id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h FROM tokd$sfx
       |), bits$sfx AS (
       |  SELECT id, j,
       |    CASE WHEN sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) > 0
       |         THEN 1 ELSE 0 END AS b
       |  FROM hh$sfx, range(${Dedup.SimHashBits}) r(j)
       |  GROUP BY id, j
       |), sims$sfx AS (
       |  SELECT id, CAST(sum(b * (1::BIGINT << j)) AS BIGINT) AS simhash
       |  FROM bits$sfx GROUP BY id
       |)""".stripMargin

  /** Shared CTE chain ending in `sims(id, simhash)` — consumed by the
    * fingerprint listing and the banded near-dup pair search. */
  private val simhashCtes: String = s"$corpusSql, ${simhashChainOver("corpus")}"

  /** The banded-candidates + hamming-verify tail every simhash pair
    * oracle shares (generated once so band width and threshold cannot
    * diverge between variants). */
  private val simhashPairsTail: String =
    s"""sbands AS (
       |  SELECT id, simhash, b AS band, (simhash >> (b * 8)) & 255 AS bv
       |  FROM sims, range(${Dedup.SimHashBands}) r(b)
       |), cand AS (
       |  SELECT DISTINCT l.id AS id_a, r.id AS id_b
       |  FROM sbands l JOIN sbands r ON l.band = r.band AND l.bv = r.bv AND l.id < r.id
       |)
       |SELECT c.id_a, c.id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM cand c
       |JOIN sims a ON a.id = c.id_a
       |JOIN sims b ON b.id = c.id_b
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= ${Dedup.SimHashMaxHamming}""".stripMargin

  /** ≙ the ext_cdc_simhash_serving_fold rows: the changelog delta applied
    * to the corpus, the whole SimHash chain re-run from scratch over the
    * post-delta text — what folding the delta's values/memberships into
    * the persisted value-granularity layout must land on (fingerprints
    * are per-document pure; value-row LIVENESS re-derives from the
    * folded membership registry). */
  lazy val cdcSimhashDeltaSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    s"""WITH $corpusSql, cl AS MATERIALIZED (
       |${docsCdc.changelogSql}
       |), cdelta AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, new_value AS text
       |  FROM cl WHERE column_name = 'text' AND new_value IS NOT NULL
       |), corpus2 AS MATERIALIZED (
       |  SELECT c.doc_id, coalesce(d.text, c.text) AS text
       |  FROM corpus c LEFT JOIN cdelta d ON c.doc_id = d.doc_id
       |), ${simhashChainOver("corpus2")}, $simhashPairsTail
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** ≙ the ext_cdc_simhash_serving_lifecycle rows: the FULL two-era
    * maintenance lifecycle on the value-granularity layout — the same
    * corpus3 composition as the minhash/BM25/ANN lifecycle oracles, run
    * through the SimHash chain (deletes can empty a value's membership,
    * dropping its band rows — the liveness contract under deletion). */
  lazy val cdcSimhashLifecycleSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    val lcCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsLifecycleSpec, Seq("doc_id"), "documents")
    val off = graft.cdc.ChangeFeed.DocsInsertOffset
    s"""WITH $corpusSql, cl1 AS MATERIALIZED (
       |${docsCdc.changelogRowsSql}
       |), cl2 AS MATERIALIZED (
       |${lcCdc.changelogRowsSql}
       |), c1d AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, new_value AS text
       |  FROM cl1 WHERE column_name = 'text' AND new_value IS NOT NULL
       |), e2upd AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, new_value AS text
       |  FROM cl2 WHERE column_name = 'text' AND new_value IS NOT NULL
       |), e2ins AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl2 WHERE column_name IS NULL AND new_value = 'NEW RECORD'
       |), e2del AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl2 WHERE column_name IS NULL AND old_value = 'DELETED RECORD'
       |), corpus3 AS MATERIALIZED (
       |  SELECT c.doc_id, coalesce(u.text, d1.text, c.text) AS text
       |  FROM corpus c
       |  LEFT JOIN c1d d1 ON c.doc_id = d1.doc_id
       |  LEFT JOIN e2upd u ON c.doc_id = u.doc_id
       |  WHERE NOT EXISTS (SELECT 1 FROM e2del x WHERE x.doc_id = c.doc_id)
       |  UNION ALL
       |  SELECT i.doc_id, d.text || ' fresh' AS text
       |  FROM e2ins i JOIN documents d ON d.doc_id = i.doc_id - $off
       |), ${simhashChainOver("corpus3")}, $simhashPairsTail
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** ≙ ext_cdc_simhash_serving_probe: the ingest restriction of the
    * post-delta SimHash chain — pairs involving a planted batch doc,
    * over the corpus with the era-1 revisions applied (what probing the
    * FOLDED history layout answers). */
  lazy val cdcSimhashIngestSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    s"""WITH $corpusSql, cl AS MATERIALIZED (
       |${docsCdc.changelogSql}
       |), cdelta AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, new_value AS text
       |  FROM cl WHERE column_name = 'text' AND new_value IS NOT NULL
       |), corpus2 AS MATERIALIZED (
       |  SELECT c.doc_id, coalesce(d.text, c.text) AS text
       |  FROM corpus c LEFT JOIN cdelta d ON c.doc_id = d.doc_id
       |), ${simhashChainOver("corpus2")}, $simhashPairsTail
       |  AND (c.id_a >= ${graft.ext.DocFeed.ExactDupOffset}
       |    OR c.id_b >= ${graft.ext.DocFeed.ExactDupOffset})
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** The banded-candidates CTEs of [[simhashPairsTail]] as NAMED,
    * suffixable CTEs (sbands→cand over sims$sfx) — the probe-race oracle
    * composes two of these in one WITH list; the tail variant stays
    * byte-identical for the historical oracles. */
  private def simhashBandCtesOver(sfx: String): String =
    s"""sbands$sfx AS (
       |  SELECT id, simhash, b AS band, (simhash >> (b * 8)) & 255 AS bv
       |  FROM sims$sfx, range(${Dedup.SimHashBands}) r(b)
       |), cand$sfx AS (
       |  SELECT DISTINCT l.id AS id_a, r.id AS id_b
       |  FROM sbands$sfx l JOIN sbands$sfx r
       |    ON l.band = r.band AND l.bv = r.bv AND l.id < r.id
       |)""".stripMargin

  /** One phase's SELECT of the probe-race oracle: the hamming-verified
    * ingest restriction over the chain with suffix `sfx`, labeled. */
  private def simhashPhaseSelect(label: String, sfx: String): String =
    s"""SELECT '$label' AS phase, c.id_a, c.id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM cand$sfx c
       |JOIN sims$sfx a ON a.id = c.id_a
       |JOIN sims$sfx b ON b.id = c.id_b
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= ${Dedup.SimHashMaxHamming}
       |  AND (c.id_a >= ${graft.ext.DocFeed.ExactDupOffset}
       |    OR c.id_b >= ${graft.ext.DocFeed.ExactDupOffset})""".stripMargin

  /** ≙ ext_simhash_serving_probe_race: the TWO answers a probe racing a
    * snapshot-isolated fold can correctly observe on the VALUE-granularity
    * layout — the family where a torn artifact pair is semantically worst
    * (liveness coupling), so the race contract matters most. Phase 'pre'
    * = the ingest restriction over the PRE-fold corpus ([[simhashIngestSql]]'s
    * rows — what a probe that resolved generation 1 answers on graced
    * bytes), phase 'post' = the restriction over the post-delta corpus
    * ([[cdcSimhashIngestSql]]'s rows — a fresh resolve). Composed in ONE
    * WITH list via the CTE-suffix convention (sfx = "_p"). */
  lazy val simhashProbeRaceSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    s"""WITH $corpusSql, ${simhashChainOver("corpus")}, ${simhashBandCtesOver("")},
       |cl AS MATERIALIZED (
       |${docsCdc.changelogSql}
       |), cdelta AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, new_value AS text
       |  FROM cl WHERE column_name = 'text' AND new_value IS NOT NULL
       |), corpus2 AS MATERIALIZED (
       |  SELECT c.doc_id, coalesce(d.text, c.text) AS text
       |  FROM corpus c LEFT JOIN cdelta d ON c.doc_id = d.doc_id
       |), ${simhashChainOver("corpus2", "_p")}, ${simhashBandCtesOver("_p")}
       |${simhashPhaseSelect("pre", "")}
       |UNION ALL
       |${simhashPhaseSelect("post", "_p")}
       |ORDER BY phase, id_a, id_b""".stripMargin
  }

  /** ≙ ext_simhash_serving_forget: subject deletion on the value-
    * granularity layout ≡ the scratch chain over the surviving corpus —
    * in particular a value whose LAST member was the subject must leave
    * the value table (liveness), while a survivor sharing the subject's
    * value keeps pairing. */
  val simhashForgetSql: String =
    s"""WITH $corpusSql, corpusv AS (
       |  SELECT * FROM corpus WHERE doc_id % 7 <> 3
       |), ${simhashChainOver("corpusv")}, $simhashPairsTail
       |ORDER BY id_a, id_b""".stripMargin

  val simhashSql: String =
    s"""WITH $simhashCtes
       |SELECT id AS doc_id, simhash FROM sims
       |ORDER BY doc_id""".stripMargin

  /** ≙ Dedup.simhashNearDupPairs: 4×8-bit bands generate candidates, exact
    * hamming ≤ 3 verifies (lossless by pigeonhole — see the Spark side). */
  val simhashPairsSql: String =
    s"""WITH $simhashCtes, sbands AS (
       |  SELECT id, simhash, b AS band, (simhash >> (b * 8)) & 255 AS bv
       |  FROM sims, range(${Dedup.SimHashBands}) r(b)
       |), cand AS (
       |  SELECT DISTINCT l.id AS id_a, r.id AS id_b
       |  FROM sbands l JOIN sbands r ON l.band = r.band AND l.bv = r.bv AND l.id < r.id
       |)
       |SELECT c.id_a, c.id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM cand c
       |JOIN sims a ON a.id = c.id_a
       |JOIN sims b ON b.id = c.id_b
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= ${Dedup.SimHashMaxHamming}
       |ORDER BY id_a, id_b""".stripMargin

  /** ≙ Dedup.simhashIngest (batch = the planted-dup ids): the full banded
    * recompute restricted to batch-involving pairs — the incremental path
    * touching history only through the persisted fingerprint index must
    * lose nothing vs recomputation. */
  val simhashIngestSql: String =
    s"""WITH $simhashCtes, sbands AS (
       |  SELECT id, simhash, b AS band, (simhash >> (b * 8)) & 255 AS bv
       |  FROM sims, range(${Dedup.SimHashBands}) r(b)
       |), cand AS (
       |  SELECT DISTINCT l.id AS id_a, r.id AS id_b
       |  FROM sbands l JOIN sbands r ON l.band = r.band AND l.bv = r.bv AND l.id < r.id
       |)
       |SELECT c.id_a, c.id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM cand c
       |JOIN sims a ON a.id = c.id_a
       |JOIN sims b ON b.id = c.id_b
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= ${Dedup.SimHashMaxHamming}
       |  AND (c.id_a >= ${graft.ext.DocFeed.ExactDupOffset}
       |    OR c.id_b >= ${graft.ext.DocFeed.ExactDupOffset})
       |ORDER BY id_a, id_b""".stripMargin

  /** E3a ≙ TextOps.tokenStats. */
  val tokenStatsSql: String =
    s"""WITH $corpusSql
       |SELECT doc_id,
       |  len(string_split(text, ' ')) AS n_tokens,
       |  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       |  length(text) AS n_chars,
       |  length(replace(text, ' ', '')) AS n_chars_nospace
       |FROM corpus
       |ORDER BY doc_id""".stripMargin

  private def langCountCols(textRef: String): String =
    TextOps.Stopwords.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(string_split($textRef, ' '), t -> list_contains($list, t))) AS n_$lang"
    }.mkString(",\n    ")

  /** Argmax CASE over the n_<lang> count aliases (≙ TextOps.predLang). */
  private val langCaseSql: String = {
    val langs = TextOps.Stopwords.map(_._1)
    val cases = langs.zipWithIndex.map { case (lang, i) =>
      val geLater = langs.drop(i + 1).map(o => s"AND n_$lang >= n_$o ").mkString
      s"WHEN n_$lang > 0 $geLater" + s"THEN '$lang'"
    }.mkString("\n    ", "\n    ", "\n    ELSE 'und' END")
    s"CASE $cases"
  }

  /** E3b ≙ TextOps.languageId — same stopword lists, same argmax tie order. */
  val languageIdSql: String = {
    val langs = TextOps.Stopwords.map(_._1)
    s"""WITH $corpusSql, counts AS (
       |  SELECT doc_id,
       |    ${langCountCols("text")}
       |  FROM corpus
       |)
       |SELECT doc_id, ${langs.map(l => s"n_$l").mkString(", ")},
       |  $langCaseSql AS pred_lang
       |FROM counts
       |ORDER BY doc_id""".stripMargin
  }

  /** E2d ≙ Similarity.topKCosineIvf (16 centroids, k-means‖-style md5
    * oversampled seeding ×4, 3 Lloyd rounds, 2 probes, k=3) — replays the
    * seeding draw, the candidate weighting, and every assign→re-center
    * alternation bit-for-bit (integer means, md5 ranks, total orders). */
  private val IvfCentroids = 16
  private val IvfOversample = 4
  private val IvfRounds = 3

  /** Shared IVF CTE chain: k-means|| seeding + IvfRounds Lloyd rounds,
    * ending in `r$IvfRounds` (ranked FULL-corpus assignment) and
    * `cell$IvfRounds` (index-side cells) — consumed by the graded IVF ANN,
    * the probe-budget recall curve, and (with `trainWhere` restricting the
    * training set to history) the incremental-maintenance grade: centroids
    * fit on `trainv` only, the FINAL assignment covers all of `allv` — the
    * scratch equivalent of fold-at-frozen-centroids. `extraCtes`
    * (inserted after the training rounds, before the final assignment)
    * and `assignSrc` let the CDC-delta composition assign a DERIVED
    * post-delta vector set at the pre-delta-trained centroids. */
  private def ivfChainCtes(trainWhere: String = "TRUE",
      extraCtes: String = "", assignSrc: String = "allv"): String = {
    val numCentroids = IvfCentroids
    val oversample = IvfOversample
    val rounds = IvfRounds
    // one assignment: ranked cosine argmax against cent$tag (ties to the
    // smaller cid — the TopKByScore order). Training rounds assign the
    // TRAINING vectors; the final round assigns the whole corpus.
    def assign(tag: Int, src: String): String =
      s"""sc$tag AS (
         |  SELECT a.vec_id, c.cid, ${cosineSql("a.v", "c.cv")} AS s FROM $src a, cent$tag c
         |), r$tag AS (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
         |  FROM sc$tag
         |), cell$tag AS (
         |  SELECT vec_id, cid AS cell FROM r$tag WHERE rn = 1
         |)""".stripMargin
    // one re-center: integer element means of cell$tag members → cent${tag+1}
    def recenter(tag: Int): String =
      s"""qx$tag AS (
         |  SELECT c0.cell, i AS pos, CAST(floor(a.v[i+1] * 1000.0) AS BIGINT) AS q
         |  FROM cell$tag c0 JOIN trainv a ON a.vec_id = c0.vec_id,
         |       range(${graft.ext.Similarity.Dim}) ri$tag(i)
         |), qm$tag AS (
         |  SELECT cell, pos, CAST(CAST(sum(q) AS BIGINT) // count(*) AS BIGINT) AS qm
         |  FROM qx$tag GROUP BY cell, pos
         |), cent${tag + 1} AS (
         |  SELECT cell AS cid, (list(qm ORDER BY pos))::DOUBLE[] AS cv
         |  FROM qm$tag GROUP BY cell
         |)""".stripMargin
    val roundCtes =
      (0 until rounds).map(t => s"${assign(t, "trainv")},\n${recenter(t)}").mkString(",\n")
    s"""allv AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), trainv AS (
       |  SELECT vec_id, v FROM allv WHERE $trainWhere
       |), cand0 AS (
       |  SELECT vec_id AS cid, v AS cv FROM trainv
       |  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT, vec_id
       |  LIMIT ${numCentroids * oversample}
       |), scw AS (
       |  SELECT a.vec_id, c.cid, ${cosineSql("a.v", "c.cv")} AS s FROM trainv a, cand0 c
       |), rw AS (
       |  SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
       |  FROM scw
       |), wts AS (
       |  SELECT cid, count(*) AS w FROM rw WHERE rn = 1 GROUP BY cid
       |), cent0 AS (
       |  SELECT c.cid, c.cv FROM cand0 c LEFT JOIN wts ON wts.cid = c.cid
       |  ORDER BY coalesce(wts.w, 0) DESC, c.cid
       |  LIMIT $numCentroids
       |),
       |$roundCtes,
       |$extraCtes
       |${assign(rounds, assignSrc)}""".stripMargin
  }

  private def annIvfSqlWith(trainWhere: String, neighborWhere: String = "TRUE",
      extraCtes: String = "", assignSrc: String = "allv",
      vecSrc: String = "allv"): String =
    s"""WITH ${ivfChainCtes(trainWhere, extraCtes, assignSrc)}, qcell AS (
       |  SELECT vec_id, cid AS cell FROM r$IvfRounds WHERE rn <= 2 AND vec_id % 100 = 0
       |), cnd AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM qcell q JOIN cell$IvfRounds c ON q.cell = c.cell
       |  WHERE q.vec_id <> c.vec_id AND ($neighborWhere)
       |), s2 AS (
       |  SELECT cnd.query_id, cnd.neighbor_id, ${cosineSql("a.v", "b.v")} AS cos
       |  FROM cnd
       |  JOIN $vecSrc a ON a.vec_id = cnd.query_id
       |  JOIN $vecSrc b ON b.vec_id = cnd.neighbor_id
       |), r AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM s2
       |)
       |SELECT query_id, neighbor_id, rnk::INTEGER AS rnk
       |FROM r WHERE rnk <= 3
       |ORDER BY query_id, rnk""".stripMargin

  val annIvfSql: String = annIvfSqlWith("TRUE")

  /** E2d' ≙ the ext_ann_ivf_incremental fold: centroids trained on history
    * (vec_id % 20 <> 3), whole corpus assigned at those FROZEN centroids —
    * exactly what folding the 5% batch into the persisted history index
    * produces, since assignment is per-vector at fixed centroids. */
  val annIvfIncrementalSql: String = annIvfSqlWith("vec_id % 20 <> 3")

  /** ≙ the ext_ann_ivf_forget fold: the deployed model (centroids AND the
    * full-corpus cell assignment) is unchanged; subject deletion only
    * removes the forgotten ids from the candidate cell lists — a frozen
    * model keeps its stale training, the assignment set shrinks. Queries
    * (vec_id % 100 = 0) never intersect the forget set (% 50 = 7). */
  val annIvfForgetSql: String = annIvfSqlWith("TRUE", "c.vec_id % 50 <> 7")

  /** ≙ ext_ivf_serving_probe_race: the TWO answers a pinned search
    * racing a snapshot-isolated fold can correctly observe on the cell
    * layout — phase 'pre' the search over the deployed pre-fold index
    * ([[annIvfSql]]'s rows, graced gen-1 bytes), phase 'post' over the
    * revision-folded cells at the FROZEN model. The revision stub is
    * DETERMINISTICALLY result-visible: each %100=50 id re-embeds as a
    * pure row copy of its vec_id−50 QUERY's vector (engine-exact), so
    * post-fold it shares the query's cell (same vector ⇒ same frozen-
    * centroid assignment ⇒ guaranteed candidate) and lands at cosine 1
    * — the query's new top-1 by construction, never a
    * fixture-regeneration gamble (the subject-deletion variant was
    * vacuous: no %50 residue reached a top-3). Queries themselves are
    * untouched, so the probed qcell set is shared; only the candidate
    * assignment + rerank fork. */
  lazy val annIvfRaceSql: String = {
    val R = IvfRounds
    val extra =
      s"""postv AS (
         |  SELECT e.vec_id, CASE WHEN b.vec_id IS NOT NULL THEN b.v ELSE e.v END AS v
         |  FROM allv e LEFT JOIN allv b
         |    ON e.vec_id % 100 = 50 AND b.vec_id = e.vec_id - 50
         |),""".stripMargin
    s"""WITH ${ivfChainCtes("TRUE", extra, "allv")}, sc_p AS (
       |  SELECT a.vec_id, c.cid, ${cosineSql("a.v", "c.cv")} AS s FROM postv a, cent$R c
       |), r_p AS (
       |  SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
       |  FROM sc_p
       |), cell_p AS (
       |  SELECT vec_id, cid AS cell FROM r_p WHERE rn = 1
       |), qcell AS (
       |  SELECT vec_id, cid AS cell FROM r$R WHERE rn <= 2 AND vec_id % 100 = 0
       |), cnd AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM qcell q JOIN cell$R c ON q.cell = c.cell
       |  WHERE q.vec_id <> c.vec_id
       |), s2 AS (
       |  SELECT cnd.query_id, cnd.neighbor_id, ${cosineSql("a.v", "b.v")} AS cos
       |  FROM cnd
       |  JOIN allv a ON a.vec_id = cnd.query_id
       |  JOIN allv b ON b.vec_id = cnd.neighbor_id
       |), rpre AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM s2
       |), cnd_p AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM qcell q JOIN cell_p c ON q.cell = c.cell
       |  WHERE q.vec_id <> c.vec_id
       |), s2_p AS (
       |  SELECT cnd_p.query_id, cnd_p.neighbor_id, ${cosineSql("a.v", "b.v")} AS cos
       |  FROM cnd_p
       |  JOIN allv a ON a.vec_id = cnd_p.query_id
       |  JOIN postv b ON b.vec_id = cnd_p.neighbor_id
       |), rpost AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM s2_p
       |)
       |SELECT 'pre' AS phase, query_id, neighbor_id, rnk::INTEGER AS rnk
       |FROM rpre WHERE rnk <= 3
       |UNION ALL
       |SELECT 'post' AS phase, query_id, neighbor_id, rnk::INTEGER AS rnk
       |FROM rpost WHERE rnk <= 3
       |ORDER BY phase, query_id, rnk""".stripMargin
  }

  /** ≙ the ext_ivf_cell_audit occupancy report: centroids trained on
    * history (vec_id % 20 <> 3), the WHOLE corpus assigned at those
    * frozen centroids (the chain's final assign), occupancy split into
    * history vs batch members per cell. */
  val ivfCellAuditSql: String =
    s"""WITH ${ivfChainCtes("vec_id % 20 <> 3")}, occ AS (
       |  SELECT cell,
       |    CAST(count(*) FILTER (WHERE vec_id % 20 <> 3) AS BIGINT) AS n_hist,
       |    CAST(count(*) FILTER (WHERE vec_id % 20 = 3) AS BIGINT) AS n_new
       |  FROM cell$IvfRounds GROUP BY cell
       |)
       |SELECT CAST(cell AS BIGINT) AS cell, n_hist, n_new,
       |  n_hist + n_new AS n_total,
       |  CAST(n_new * 10000 // (n_hist + n_new) AS BIGINT) AS new_share_bp
       |FROM occ ORDER BY cell""".stripMargin

  /** ≙ the ext_ann_ivf_refresh re-train: after the fold (history ∪ batch
    * = the full corpus) and the subject deletion (% 50 = 7), refresh
    * re-seeds at fixed k over exactly the SURVIVORS and re-assigns them —
    * a scratch chain trained AND searched on the survivor set (queries,
    * % 100 = 0, never intersect the forget set). */
  val annIvfRefreshSql: String =
    annIvfSqlWith("vec_id % 50 <> 7", "c.vec_id % 50 <> 7")

  /** ≙ Similarity.rankEval(topKCosineIvf(probes = p), brute force, k = 3)
    * micro-averaged per probe budget p = 1..3 — the nprobe tuning curve an
    * IVF deployment reads; ONE clustering chain shared with annIvfSql. */
  val ivfRecallCurveSql: String = {
    def block(p: Int): String =
      s"""qc$p AS (
         |  SELECT vec_id, cid AS cell FROM r$IvfRounds
         |  WHERE rn <= $p AND vec_id % 100 = 0
         |), cn$p AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM qc$p q JOIN cell$IvfRounds c ON q.cell = c.cell
         |  WHERE q.vec_id <> c.vec_id
         |), ss$p AS (
         |  SELECT cn$p.query_id, cn$p.neighbor_id, ${cosineSql("a.v", "b.v")} AS cos
         |  FROM cn$p
         |  JOIN allv a ON a.vec_id = cn$p.query_id
         |  JOIN allv b ON b.vec_id = cn$p.neighbor_id
         |), sy$p AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY cos DESC, neighbor_id) AS rnk
         |    FROM ss$p) x$p
         |  WHERE rnk <= 3
         |), ev$p AS (
         |  SELECT CAST($p AS BIGINT) AS nprobe,
         |    CAST(count(*) AS BIGINT) AS n_truth,
         |    CAST(count(s.query_id) AS BIGINT) AS n_hits
         |  FROM truth t
         |  LEFT JOIN sy$p s
         |    ON s.query_id = t.query_id AND s.neighbor_id = t.neighbor_id
         |)""".stripMargin
    s"""WITH ${ivfChainCtes()}, ts0 AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         ${cosineSql("q.v", "c.v")} AS cos
       |  FROM allv q, allv c
       |  WHERE q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id
       |), truth AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY cos DESC, neighbor_id) AS rnk
       |    FROM ts0) tr
       |  WHERE rnk <= 3
       |),
       |${(1 to 3).map(block).mkString(",\n")}
       |SELECT nprobe, n_truth, n_hits,
       |  CAST(n_hits * 10000 // n_truth AS BIGINT) AS recall_bp
       |FROM (SELECT * FROM ev1 UNION ALL SELECT * FROM ev2
       |      UNION ALL SELECT * FROM ev3) e
       |ORDER BY nprobe""".stripMargin
  }

  /** E2e ≙ Similarity.kmeansAssign (k = 8, 2 rounds) — replays every
    * assign→re-center alternation bit-for-bit: cosine argmax with the
    * (score desc, cid asc) total order, then exact INTEGER element means
    * (floor(x·1000) long sums, integer division) so centroid drift is
    * impossible between engines. Same two primitives `annIvfSql` refines
    * with, iterated. */
  /** k-means CTE chain over an existing `allv(vec_id, v)` CTE: seeds =
    * vec_id < k, two assign→re-center alternations + the final assign;
    * ends in `cell2(vec_id, cell)`. Shared by [[kmeansSql]] and
    * [[semdedupSql]] so the replayed clustering cannot drift between the
    * two graded rows. */
  /** @param trainWhere restricts the TRAINING side (seeds, the first two
    *        assignment rounds, re-centers) to a history subset; the FINAL
    *        assignment always covers `allv` — the scratch equivalent of
    *        encode-at-frozen-centroids. "TRUE" (default) = classic chain. */
  private def kmeansCellCtes(k: Int, trainWhere: String = "TRUE"): String = {
    // one assignment round: argmax cosine against `cents`, ties to the
    // smaller centroid id (≙ Similarity.nearestCells via TopKByScore)
    def assign(tag: Int, cents: String, src: String): String =
      s"""sc$tag AS (
         |  SELECT a.vec_id, c.cid, ${cosineSql("a.v", "c.cv")} AS s FROM $src a, $cents c
         |), r$tag AS (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
         |  FROM sc$tag
         |), cell$tag AS (
         |  SELECT vec_id, cid AS cell FROM r$tag WHERE rn = 1
         |)""".stripMargin
    // one re-center round (≙ Similarity.integerMeanCentroids)
    def recenter(tag: Int, outCents: String): String =
      s"""qx$tag AS (
         |  SELECT c0.cell, i AS pos, CAST(floor(a.v[i+1] * 1000.0) AS BIGINT) AS q
         |  FROM cell$tag c0 JOIN ktrainv a ON a.vec_id = c0.vec_id,
         |       range(${graft.ext.Similarity.Dim}) ri$tag(i)
         |), qm$tag AS (
         |  SELECT cell, pos, CAST(CAST(sum(q) AS BIGINT) // count(*) AS BIGINT) AS qm
         |  FROM qx$tag GROUP BY cell, pos
         |), $outCents AS (
         |  SELECT cell AS cid, (list(qm ORDER BY pos))::DOUBLE[] AS cv
         |  FROM qm$tag GROUP BY cell
         |)""".stripMargin
    s"""ktrainv AS (
       |  SELECT vec_id, v FROM allv WHERE $trainWhere
       |), cent0 AS (
       |  SELECT vec_id AS cid, v AS cv FROM ktrainv WHERE vec_id < $k
       |), ${assign(0, "cent0", "ktrainv")}, ${recenter(0, "cent1")},
       |${assign(1, "cent1", "ktrainv")}, ${recenter(1, "cent2")},
       |${assign(2, "cent2", "allv")}""".stripMargin
  }

  val kmeansSql: String =
    s"""WITH allv AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), ${kmeansCellCtes(8)}
       |SELECT vec_id, CAST(cell AS BIGINT) AS cid FROM cell2
       |ORDER BY vec_id""".stripMargin

  /** E1+E3 composition ≙ ext.Curate.funnel (dedup → length → repetition →
    * language gates, integer thresholds). */
  val curationFunnelSql: String =
    s"""WITH $corpusSql, k AS (
       |  SELECT md5(text) AS h, min(doc_id) AS m FROM corpus GROUP BY md5(text)
       |), d AS (
       |  SELECT c.* FROM corpus c JOIN k ON md5(c.text) = k.h AND c.doc_id = k.m
       |), l AS (
       |  SELECT * FROM d WHERE len(string_split(text, ' ')) BETWEEN 20 AND 200
       |), q AS (
       |  SELECT * FROM l
       |  WHERE len(list_distinct(string_split(text, ' '))) * 2
       |        >= len(string_split(text, ' ')) * 1
       |), rep AS (
       |  SELECT * FROM q
       |  WHERE CASE WHEN len(string_split(text, ' ')) >= 3
       |    THEN ${triDupsSql("string_split(text, ' ')")} * 10000
       |         // (len(string_split(text, ' ')) - 2) <= 200
       |    ELSE true END
       |), qc AS (
       |  SELECT *,
       |    ${langCountCols("text")}
       |  FROM rep
       |), g AS (
       |  SELECT * FROM qc WHERE ($langCaseSql) = 'en'
       |)
       |SELECT '0_input' AS stage, count(*) AS n_rows FROM corpus
       |UNION ALL SELECT '1_dedup', count(*) FROM d
       |UNION ALL SELECT '2_length', count(*) FROM l
       |UNION ALL SELECT '3_quality', count(*) FROM q
       |UNION ALL SELECT '4_repetition', count(*) FROM rep
       |UNION ALL SELECT '5_language', count(*) FROM g
       |ORDER BY stage""".stripMargin

  /** ≙ the ext_pipeline composition: near-dup pairs → recursive-closure
    * components → fullest-member representatives → the funnel's gate
    * chain over the kept corpus → cluster-keyed 98/1/1 split with
    * per-split token sums. Every fragment is the one its standalone
    * graded row uses, so the composition cannot drift from the pieces. */
  val pipelineSql: String =
    s"""WITH RECURSIVE $pairCtes, und AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION
       |  SELECT id_b, id_a FROM pairs
       |), reach AS (
       |  SELECT DISTINCT src AS id, src AS r FROM und
       |  UNION
       |  SELECT u.dst AS id, reach.r FROM reach JOIN und u ON u.src = reach.id
       |), comp AS (
       |  SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
       |), assigned AS (
       |  SELECT c.doc_id, CAST(len(string_split(c.text, ' ')) AS BIGINT) AS n_tokens,
       |         CAST(coalesce(comp.cluster_id, c.doc_id) AS BIGINT) AS cluster_id
       |  FROM corpus c LEFT JOIN comp ON comp.id = c.doc_id
       |), rr AS (
       |  SELECT doc_id, cluster_id,
       |    row_number() OVER (PARTITION BY cluster_id ORDER BY n_tokens DESC, doc_id) AS rn
       |  FROM assigned
       |), kc AS (
       |  SELECT c.* FROM corpus c JOIN rr ON rr.doc_id = c.doc_id AND rr.rn = 1
       |), k2 AS (
       |  SELECT md5(text) AS h, min(doc_id) AS m FROM kc GROUP BY md5(text)
       |), d2 AS (
       |  SELECT kc.* FROM kc JOIN k2 ON md5(kc.text) = k2.h AND kc.doc_id = k2.m
       |), l2 AS (
       |  SELECT * FROM d2 WHERE len(string_split(text, ' ')) BETWEEN 20 AND 200
       |), q2 AS (
       |  SELECT * FROM l2
       |  WHERE len(list_distinct(string_split(text, ' '))) * 2
       |        >= len(string_split(text, ' ')) * 1
       |), rep2 AS (
       |  SELECT * FROM q2
       |  WHERE CASE WHEN len(string_split(text, ' ')) >= 3
       |    THEN ${triDupsSql("string_split(text, ' ')")} * 10000
       |         // (len(string_split(text, ' ')) - 2) <= 200
       |    ELSE true END
       |), sp AS (
       |  SELECT a.cluster_id, a.doc_id, a.n_tokens,
       |    CASE WHEN b < 98 THEN 'train' WHEN b < 99 THEN 'val' ELSE 'test' END AS split
       |  FROM (SELECT a.*, ('0x' || substr(md5(a.cluster_id::VARCHAR), 1, 4))::BIGINT % 100 AS b
       |        FROM assigned a JOIN rep2 ON rep2.doc_id = a.doc_id) a
       |)
       |SELECT split, count(*) AS n_docs, count(DISTINCT cluster_id) AS n_clusters,
       |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
       |FROM sp GROUP BY split
       |ORDER BY split""".stripMargin

  /** E3c ≙ TextOps.jsonExtract over events.props. */
  val jsonExtractSql: String =
    """SELECT event_id, event_type,
      |  json_extract_string(props, '$.k')::INTEGER AS k
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** §2.11 ≙ streaming.EventStream.eventWindowCounts in batch mode
    * (Spark's epoch-aligned window ≙ DuckDB's hour time_bucket). */
  val eventWindowsSql: String =
    """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type,
      |  count(*) AS n_events,
      |  CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** ≙ EventStream.eventWindowTopType: per-window argmax with the
    * (count desc, type desc) total order — Spark's max(struct(n, type)). */
  val eventWindowTopSql: String =
    """WITH w AS (
      |  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type,
      |    count(*) AS n FROM events GROUP BY 1, 2
      |), r AS (
      |  SELECT window_start, event_type, n,
      |    row_number() OVER (PARTITION BY window_start ORDER BY n DESC, event_type DESC) AS rn
      |  FROM w
      |)
      |SELECT window_start, event_type AS top_type, CAST(n AS BIGINT) AS top_n
      |FROM r WHERE rn = 1
      |ORDER BY window_start""".stripMargin

  /** E3c' ≙ TextOps.eventStats. */
  val eventStatsSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
      |  count(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** E3e ≙ TextOps.scrubPii (same patterns, same replacement order; DuckDB
    * needs the 'g' flag to match Spark's replace-all). */
  val piiScrubSql: String = {
    val email = TextOps.EmailPattern
    val url = TextOps.UrlPattern
    val num = TextOps.LongNumberPattern
    s"""WITH $corpusSql
       |SELECT doc_id,
       |  len(regexp_extract_all(lower(text), '$email')) AS n_emails,
       |  len(regexp_extract_all(lower(text), '$url')) AS n_urls,
       |  len(regexp_extract_all(lower(text), '$num')) AS n_numbers,
       |  md5(regexp_replace(regexp_replace(regexp_replace(lower(text),
       |      '$email', '<EMAIL>', 'g'), '$url', '<URL>', 'g'), '$num', '<NUM>', 'g'))
       |    AS fp_scrubbed
       |FROM corpus
       |ORDER BY doc_id""".stripMargin
  }

  /** E3d ≙ TextOps.fingerprints. (min over the shingle multiset equals min
    * over the distinct set, so the shared distinct-shingle CTE serves.) */
  val fingerprintSql: String =
    s"""WITH $corpusSql, $shingleCtes, shh AS (
       |  SELECT id, min(substr(md5(sh), 1, 8)) AS fp_min_shingle
       |  FROM sh
       |  GROUP BY id
       |)
       |SELECT t.id AS doc_id, md5(t.text) AS fp_doc, s.fp_min_shingle
       |FROM tok t JOIN shh s ON s.id = t.id
       |ORDER BY doc_id""".stripMargin

  /** ≙ Similarity.topKMrl (shortDim 16 of 64, shortlist 12, k 3): stage 1
    * ranks by cosine over the vector PREFIX (DuckDB's 1-based inclusive
    * slice v[1:16] ≙ Spark slice(v, 1, 16) — the proven pairing), stage 2
    * re-scores just the shortlist at full dimension. Both stages use the
    * (score DESC, neighbor_id) total order. */
  val annMrlSql: String =
    s"""WITH allv AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), tr AS (
       |  SELECT vec_id, v[1:16] AS t FROM allv
       |), s1 AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         ${cosineSql("q.t", "c.t")} AS cs
       |  FROM tr q, tr c
       |  WHERE q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id
       |), sl AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rn
       |    FROM s1) x
       |  WHERE rn <= 12
       |), s2 AS (
       |  SELECT sl.query_id, sl.neighbor_id, ${cosineSql("a.v", "b.v")} AS cos
       |  FROM sl
       |  JOIN allv a ON a.vec_id = sl.query_id
       |  JOIN allv b ON b.vec_id = sl.neighbor_id
       |), r AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM s2
       |)
       |SELECT query_id, neighbor_id, rnk::INTEGER AS rnk
       |FROM r WHERE rnk <= 3
       |ORDER BY query_id, rnk""".stripMargin

  private def cosineSql(qv: String, cv: String): String =
    s"list_dot_product($qv, $cv) / (sqrt(list_dot_product($qv, $qv)) * sqrt(list_dot_product($cv, $cv)))"

  /** E2a ≙ Similarity.topKCosine (queries = vec_id % 100 = 0, k = 5).
    * Only ids and integer ranks are hash-compared; double-precision cosine
    * drives the ordering on both sides (rank flips would need two
    * candidates within ~1e-13 — below the fixture's score spacing). */
  val topKCosineSql: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id % 100 = 0
      |), c AS (
      |  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
      |), s AS (
      |  SELECT query_id, neighbor_id, COS_EXPR AS cos
      |  FROM q, c WHERE query_id <> neighbor_id
      |), r AS (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
      |  FROM s
      |)
      |SELECT query_id, neighbor_id, rnk::INTEGER AS rnk
      |FROM r WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin
      .replace("COS_EXPR", cosineSql("qv", "cv"))

  /** E2b ≙ Similarity.topKCosineLsh (8 md5-derived hyperplanes, bucket join,
    * k = 3). */
  val annLshSql: String =
    s"""WITH buck AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    ${bucketExprSql("embedding", 0 until graft.ext.Similarity.NumPlanes, p => p)} AS bucket
       |  FROM embeddings
       |), q AS (
       |  SELECT vec_id AS query_id, v AS qv, bucket FROM buck WHERE vec_id % 100 = 0
       |), c AS (
       |  SELECT vec_id AS neighbor_id, v AS cv, bucket FROM buck
       |), s AS (
       |  SELECT query_id, neighbor_id, ${cosineSql("qv", "cv")} AS cos
       |  FROM q JOIN c ON q.bucket = c.bucket
       |  WHERE query_id <> neighbor_id
       |), r AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM s
       |)
       |SELECT query_id, neighbor_id, rnk::INTEGER AS rnk
       |FROM r WHERE rnk <= 3
       |ORDER BY query_id, rnk""".stripMargin

  /** E2-filter ≙ Similarity.filteredTopK (allow = vec_id % 3 = 1, k = 3,
    * shortlist = 12): PRE ranks only allowed neighbors; POST ranks the
    * allowed survivors of the unfiltered top-12 shortlist in shortlist
    * order — starved queries emit fewer than k post rows. */
  val annFilteredSql: String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |  FROM embeddings WHERE vec_id % 100 = 0
       |), c AS (
       |  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
       |    (vec_id % 3 = 1) AS allowed
       |  FROM embeddings
       |), s AS (
       |  SELECT query_id, neighbor_id, ${cosineSql("qv", "cv")} AS cos, allowed
       |  FROM q, c WHERE query_id <> neighbor_id
       |), pre AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM s WHERE allowed
       |), shortl AS (
       |  SELECT query_id, neighbor_id, allowed,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS srnk
       |  FROM s
       |), post AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY srnk) AS rnk
       |  FROM shortl WHERE srnk <= 12 AND allowed
       |)
       |SELECT 'pre' AS strategy, query_id, neighbor_id, rnk::INTEGER AS rnk
       |FROM pre WHERE rnk <= 3
       |UNION ALL
       |SELECT 'post' AS strategy, query_id, neighbor_id, rnk::INTEGER AS rnk
       |FROM post WHERE rnk <= 3
       |ORDER BY strategy, query_id, rnk""".stripMargin

  /** ≙ ext.EmbFeed.withDups — planted scaled-copy near-duplicates. */
  private val embCorpusSql: String =
    """embx AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, list_transform(embedding, x -> x * CAST(1.5 AS FLOAT))
      |  FROM embeddings WHERE vec_id % 20 = 0
      |)""".stripMargin

  /** Hyperplane p as a literal ±1 vector (generated from the same
    * Similarity.planeWeight md5 derivation the Spark side uses). */
  private def planeListSql(p: Int): String =
    (0 until graft.ext.Similarity.Dim)
      .map(j => graft.ext.Similarity.planeWeight(p, j))
      .mkString("[", ", ", "]") + "::DOUBLE[]"

  /** LSH bucket id as a sum of sign tests — each projection is a
    * `list_dot_product` against a literal plane (sequential summation,
    * bit-identical to Spark's FloatVectorDot fold; a grouped SUM over
    * unnested elements would have no ordering guarantee and could flip
    * the sign of a near-zero projection between engines). */
  private def bucketExprSql(vecRef: String, planes: Range, bitFor: Int => Int): String =
    planes.map(p =>
      s"(CASE WHEN list_dot_product($vecRef::DOUBLE[], ${planeListSql(p)}) > 0 " +
        s"THEN ${1L << bitFor(p)}::BIGINT ELSE 0 END)").mkString("\n      + ")

  /** Shared CTE chain ending in `epairs` = the embedding-cosine near-dup
    * pairs (LSH bucket join + exact cosine ≥ 0.9) — consumed by the pair
    * listing and the embedding-cluster assignment. */
  /** The bucket-join + exact-cosine chain over an arbitrary
    * (vec_id, embedding) CTE — the CDC-composed and survivor-sliced
    * dedup oracles thread their own vector source;
    * `embPairChainOver("embx")` is the historical text byte-for-byte. */
  /** @param sfx suffix for every CTE name — lets two pair chains (e.g.
    *        the probe race's pre/post phases) coexist in one WITH list;
    *        "" keeps the historical text byte-identical. */
  private def embPairChainOver(src: String, sfx: String = ""): String =
    s"""sides$sfx AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    ${bucketExprSql("embedding", 0 until graft.ext.Similarity.NumPlanes, p => p)} AS bucket
       |  FROM $src
       |), epairs$sfx AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM sides$sfx a JOIN sides$sfx b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  WHERE ${cosineSql("a.v", "b.v")} >= 0.9
       |)""".stripMargin

  private val embPairCtes: String =
    s"""$embCorpusSql, ${embPairChainOver("embx")}"""

  /** ≙ ext_embdup_pruned: the ingest restriction of the embedding pair
    * chain — pairs involving a planted (+DupOffset) batch vector. */
  val embDupIngestSql: String =
    s"""WITH $embPairCtes
       |SELECT id_a, id_b FROM epairs
       |WHERE id_a >= ${graft.ext.EmbFeed.DupOffset}
       |   OR id_b >= ${graft.ext.EmbFeed.DupOffset}
       |ORDER BY id_a, id_b""".stripMargin

  /** ≙ the ext_cdc_embdup_serving_fold rows: the changelog delta's ids
    * re-embed by the DECADE-BASE stub — the revised doc's new embedding
    * COPIES the vector of vec_id − vec_id%10 (ids are dense from 0, so
    * the base always exists). A pure row copy: engine-exact by
    * construction, direction-changing (buckets move), and — unlike the
    * reversal stub, whose random directions pair with NOTHING at cosine
    * ≥ 0.9 — pair-VISIBLE: the revised doc lands at cosine 1 with its
    * base and the base's planted copy, so the fold's new pairs are in
    * the graded output (the r12 fold-must-differ-from-baseline rule). */
  lazy val cdcEmbDupDeltaSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    s"""WITH $embCorpusSql, cl AS MATERIALIZED (
       |${docsCdc.changelogSql}
       |), cdelta AS (
       |  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl WHERE column_name = 'text' AND new_value IS NOT NULL
       |), postv AS (
       |  SELECT e.vec_id,
       |    CASE WHEN d.doc_id IS NULL THEN e.embedding
       |         ELSE b.embedding END AS embedding
       |  FROM embx e
       |  LEFT JOIN cdelta d ON e.vec_id = d.doc_id
       |  LEFT JOIN embeddings b ON b.vec_id = e.vec_id - e.vec_id % 10
       |), ${embPairChainOver("postv")}
       |SELECT id_a, id_b FROM epairs
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** ≙ the ext_cdc_embdup_serving_lifecycle rows: the FULL two-era
    * maintenance lifecycle on the vector layout, from the SAME CdcOracle
    * changelog chains the cdc_* rows grade against. Era 1: revised docs
    * re-embed by the DECADE-BASE copy stub. Era 2: deleted docs' rows
    * drop; sentinel inserts fetch the source vector by key VERBATIM (a
    * cosine-1 pair with the living source); the re-revision COPIES the
    * raw vector of its deleted m=7 NEIGHBOR (vec_id − 1) — all pure row
    * copies (engine-exact by construction), and the neighbor coupling
    * makes the delete class grade-guarded: a fold that failed to drop
    * the neighbor would surface a spurious cosine-1 pair (verified in
    * DuckDB: inserts add pairs, re-revisions remove the decade pairs, a
    * simulated deletion bug adds (id−1, id) pairs). */
  lazy val cdcEmbDupLifecycleSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    val lcCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsLifecycleSpec, Seq("doc_id"), "documents")
    val off = graft.cdc.ChangeFeed.DocsInsertOffset
    s"""WITH $embCorpusSql, cl1 AS MATERIALIZED (
       |${docsCdc.changelogRowsSql}
       |), cl2 AS MATERIALIZED (
       |${lcCdc.changelogRowsSql}
       |), e1d AS (
       |  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl1 WHERE column_name = 'text' AND new_value IS NOT NULL
       |), e2upd AS (
       |  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl2 WHERE column_name = 'text' AND new_value IS NOT NULL
       |), e2ins AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl2 WHERE column_name IS NULL AND new_value = 'NEW RECORD'
       |), e2del AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl2 WHERE column_name IS NULL AND old_value = 'DELETED RECORD'
       |), postv AS (
       |  SELECT e.vec_id,
       |    CASE WHEN u.doc_id IS NOT NULL THEN nb.embedding
       |         WHEN d1.doc_id IS NOT NULL THEN db.embedding
       |         ELSE e.embedding END AS embedding
       |  FROM embx e
       |  LEFT JOIN e2upd u ON e.vec_id = u.doc_id
       |  LEFT JOIN e1d d1 ON e.vec_id = d1.doc_id
       |  LEFT JOIN embeddings nb ON nb.vec_id = e.vec_id - 1
       |  LEFT JOIN embeddings db ON db.vec_id = e.vec_id - e.vec_id % 10
       |  WHERE NOT EXISTS (SELECT 1 FROM e2del x WHERE x.doc_id = e.vec_id)
       |  UNION ALL
       |  SELECT i.doc_id AS vec_id, e.embedding
       |  FROM e2ins i JOIN embeddings e ON e.vec_id = i.doc_id - $off
       |), ${embPairChainOver("postv")}
       |SELECT id_a, id_b FROM epairs
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** ≙ ext_cdc_embdup_serving_probe: the ingest restriction of the
    * post-delta embedding pair chain — pairs involving a planted
    * (+DupOffset) batch vector, over the vectors with the era-1
    * decade-base re-embeds applied (what probing the FOLDED history
    * layout answers). */
  lazy val cdcEmbDupIngestSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    s"""WITH $embCorpusSql, cl AS MATERIALIZED (
       |${docsCdc.changelogSql}
       |), cdelta AS (
       |  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl WHERE column_name = 'text' AND new_value IS NOT NULL
       |), postv AS (
       |  SELECT e.vec_id,
       |    CASE WHEN d.doc_id IS NULL THEN e.embedding
       |         ELSE b.embedding END AS embedding
       |  FROM embx e
       |  LEFT JOIN cdelta d ON e.vec_id = d.doc_id
       |  LEFT JOIN embeddings b ON b.vec_id = e.vec_id - e.vec_id % 10
       |), ${embPairChainOver("postv")}
       |SELECT id_a, id_b FROM epairs
       |WHERE id_a >= ${graft.ext.EmbFeed.DupOffset}
       |   OR id_b >= ${graft.ext.EmbFeed.DupOffset}
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** ≙ ext.EmbFeed.withNearDups — [[embCorpusSql]]'s planted colinear
    * copies ∪ NON-colinear near-duplicates (last three elements zeroed —
    * pure truncation, engine-exact; cosine ≈ √(61/64) of the base but
    * enough hyperplane-sign flips that single-table bucketing misses
    * ~40% of the pairs the multi-table layout finds). */
  private val embNearCorpusSql: String =
    s"""$embCorpusSql, embn AS (
       |  SELECT vec_id, embedding FROM embx
       |  UNION ALL
       |  SELECT vec_id + ${graft.ext.EmbFeed.NearDupOffset},
       |    embedding[1:${graft.ext.Similarity.Dim - 3}] || [0.0, 0.0, 0.0]::FLOAT[]
       |  FROM embeddings WHERE vec_id % 10 = 0
       |)""".stripMargin

  /** The MULTI-TABLE bucket-join + exact-cosine chain over an arbitrary
    * (vec_id, embedding) CTE — k=${graft.ext.Dedup.EmbTables} independent
    * 4-plane tables (planes t·4…t·4+3, the topKCosineLshMulti
    * configuration), a pair qualifying in ANY table (the DISTINCT);
    * tbucket = t·2^planes + table bucket mirrors
    * [[graft.ext.Dedup.embMultiServingRows]] exactly. */
  private def embMultiPairChainOver(src: String, sfx: String = ""): String = {
    val ppt = graft.ext.Dedup.EmbPlanesPerTable
    val selects = (0 until graft.ext.Dedup.EmbTables).map { t =>
      s"""  SELECT vec_id, embedding::DOUBLE[] AS v,
         |    ${t.toLong * (1L << ppt)}::BIGINT
         |    + ${bucketExprSql("embedding", t * ppt until (t + 1) * ppt, p => p - t * ppt)} AS tbucket
         |  FROM $src""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""msides$sfx AS (
       |$selects
       |), mpairs$sfx AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM msides$sfx a JOIN msides$sfx b
       |    ON a.tbucket = b.tbucket AND a.vec_id < b.vec_id
       |  WHERE ${cosineSql("a.v", "b.v")} >= 0.9
       |)""".stripMargin
  }

  /** ≙ ext_embdup_multiband: the full pair listing of the multi-table
    * serving layout over the near-dup-planted corpus. */
  val embMultibandSql: String =
    s"""WITH $embNearCorpusSql, ${embMultiPairChainOver("embn")}
       |SELECT id_a, id_b FROM mpairs
       |ORDER BY id_a, id_b""".stripMargin

  /** ≙ ext_embdup_multiband_probe: the ingest restriction — pairs
    * involving a planted (+NearDupOffset) batch vector. The graded
    * recall fact: the single-table chain finds 29 of these 50 base
    * pairs, this one 49 (diffed in DuckDB — the stub-visibility rule). */
  val embMultibandIngestSql: String =
    s"""WITH $embNearCorpusSql, ${embMultiPairChainOver("embn")}
       |SELECT id_a, id_b FROM mpairs
       |WHERE id_a >= ${graft.ext.EmbFeed.NearDupOffset}
       |   OR id_b >= ${graft.ext.EmbFeed.NearDupOffset}
       |ORDER BY id_a, id_b""".stripMargin

  /** ≙ ext_embdup_bucket_audit: per-bucket occupancy + cap action of
    * the single-table vector layout — the "no silent caps" companion
    * frame [[graft.ext.Dedup.embDupBucketAudit]] (every bucket 'joined'
    * at fixture scale; the audit grades the cap STRUCTURE cross-engine,
    * like ext_ivf_cell_audit grades cell skew). */
  val embDupBucketAuditSql: String =
    s"""WITH $embCorpusSql, sides AS (
       |  SELECT vec_id,
       |    ${bucketExprSql("embedding", 0 until graft.ext.Similarity.NumPlanes, p => p)} AS bucket
       |  FROM embx
       |)
       |SELECT bucket, n_vecs,
       |  CASE WHEN n_vecs <= ${graft.ext.Dedup.DefaultMaxBucket} THEN 'joined'
       |       ELSE 'skipped' END AS action
       |FROM (SELECT bucket, CAST(count(*) AS BIGINT) AS n_vecs
       |      FROM sides GROUP BY 1) a
       |WHERE n_vecs >= 2
       |ORDER BY bucket""".stripMargin

  /** ≙ ext_embdup_multiband_bucket_audit: the multi-table twin over the
    * (table, bucket) band rows (mpairs rides along unused — DuckDB CTEs
    * are lazy unless MATERIALIZED). */
  val embMultiBucketAuditSql: String =
    s"""WITH $embNearCorpusSql, ${embMultiPairChainOver("embn")}
       |SELECT tbucket, n_ids,
       |  CASE WHEN n_ids <= ${graft.ext.Dedup.DefaultMaxBucket} THEN 'joined'
       |       ELSE 'skipped' END AS action
       |FROM (SELECT tbucket, CAST(count(*) AS BIGINT) AS n_ids
       |      FROM msides GROUP BY 1) a
       |WHERE n_ids >= 2
       |ORDER BY tbucket""".stripMargin

  /** ≙ ext_cdc_embdup_multiband_fold: the changelog delta folded IN
    * PLACE into BOTH multi-table artifacts — the decade-base re-embed
    * stub threaded through the multi-table chain (the cdcEmbDupDeltaSql
    * composition over the near-dup corpus). */
  lazy val cdcEmbMultibandDeltaSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    s"""WITH $embNearCorpusSql, cl AS MATERIALIZED (
       |${docsCdc.changelogSql}
       |), cdelta AS (
       |  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl WHERE column_name = 'text' AND new_value IS NOT NULL
       |), postnv AS (
       |  SELECT e.vec_id,
       |    CASE WHEN d.doc_id IS NULL THEN e.embedding
       |         ELSE b.embedding END AS embedding
       |  FROM embn e
       |  LEFT JOIN cdelta d ON e.vec_id = d.doc_id
       |  LEFT JOIN embeddings b ON b.vec_id = e.vec_id - e.vec_id % 10
       |), ${embMultiPairChainOver("postnv")}
       |SELECT id_a, id_b FROM mpairs
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** ≙ ext_embdup_multiband_probe_race: the two consistent answers of a
    * near-dup probe racing the era-1 fold on the multi-table layout —
    * phase 'pre' the ingest restriction over the pre-fold corpus
    * ([[embMultibandIngestSql]]'s rows, graced gen-1 bytes), phase
    * 'post' over the decade-base-re-embedded vectors (the
    * [[cdcEmbMultibandDeltaSql]] postnv chain, fresh resolve). One WITH
    * list via the CTE-suffix convention. */
  lazy val embMultibandProbeRaceSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    val off = graft.ext.EmbFeed.NearDupOffset
    def phase(label: String, sfx: String): String =
      s"""SELECT '$label' AS phase, id_a, id_b FROM mpairs$sfx
         |WHERE id_a >= $off OR id_b >= $off""".stripMargin
    s"""WITH $embNearCorpusSql, ${embMultiPairChainOver("embn")},
       |cl AS MATERIALIZED (
       |${docsCdc.changelogSql}
       |), cdelta AS (
       |  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl WHERE column_name = 'text' AND new_value IS NOT NULL
       |), postnv AS (
       |  SELECT e.vec_id,
       |    CASE WHEN d.doc_id IS NULL THEN e.embedding
       |         ELSE b.embedding END AS embedding
       |  FROM embn e
       |  LEFT JOIN cdelta d ON e.vec_id = d.doc_id
       |  LEFT JOIN embeddings b ON b.vec_id = e.vec_id - e.vec_id % 10
       |), ${embMultiPairChainOver("postnv", "_p")}
       |${phase("pre", "")}
       |UNION ALL
       |${phase("post", "_p")}
       |ORDER BY phase, id_a, id_b""".stripMargin
  }

  /** ≙ the ext_cdc_embdup_multiband_lifecycle rows: the FULL two-era
    * maintenance lifecycle on BOTH multi-table artifacts — the
    * [[cdcEmbDupLifecycleSql]] composition (era-1 decade-base re-embeds,
    * era-2 deletes / sentinel-insert fetches / deleted-neighbor-copy
    * re-revisions — the delete class stays grade-guarded) threaded over
    * the NEAR-dup-planted corpus through the multi-table chain. */
  lazy val cdcEmbMultibandLifecycleSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    val lcCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsLifecycleSpec, Seq("doc_id"), "documents")
    val off = graft.cdc.ChangeFeed.DocsInsertOffset
    s"""WITH $embNearCorpusSql, cl1 AS MATERIALIZED (
       |${docsCdc.changelogRowsSql}
       |), cl2 AS MATERIALIZED (
       |${lcCdc.changelogRowsSql}
       |), e1d AS (
       |  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl1 WHERE column_name = 'text' AND new_value IS NOT NULL
       |), e2upd AS (
       |  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl2 WHERE column_name = 'text' AND new_value IS NOT NULL
       |), e2ins AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl2 WHERE column_name IS NULL AND new_value = 'NEW RECORD'
       |), e2del AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl2 WHERE column_name IS NULL AND old_value = 'DELETED RECORD'
       |), postnv AS (
       |  SELECT e.vec_id,
       |    CASE WHEN u.doc_id IS NOT NULL THEN nb.embedding
       |         WHEN d1.doc_id IS NOT NULL THEN db.embedding
       |         ELSE e.embedding END AS embedding
       |  FROM embn e
       |  LEFT JOIN e2upd u ON e.vec_id = u.doc_id
       |  LEFT JOIN e1d d1 ON e.vec_id = d1.doc_id
       |  LEFT JOIN embeddings nb ON nb.vec_id = e.vec_id - 1
       |  LEFT JOIN embeddings db ON db.vec_id = e.vec_id - e.vec_id % 10
       |  WHERE NOT EXISTS (SELECT 1 FROM e2del x WHERE x.doc_id = e.vec_id)
       |  UNION ALL
       |  SELECT i.doc_id AS vec_id, e.embedding
       |  FROM e2ins i JOIN embeddings e ON e.vec_id = i.doc_id - $off
       |), ${embMultiPairChainOver("postnv")}
       |SELECT id_a, id_b FROM mpairs
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** ≙ ext_embdup_multiband_forget: subject deletion (vec_id % 7 = 3) on
    * both multi-table artifacts ≡ the scratch multi-table chain over the
    * survivors (per-vector-pure rows in band index AND registry). */
  val embMultibandForgetSql: String =
    s"""WITH $embNearCorpusSql, embnv AS (
       |  SELECT * FROM embn WHERE vec_id % 7 <> 3
       |), ${embMultiPairChainOver("embnv")}
       |SELECT id_a, id_b FROM mpairs
       |ORDER BY id_a, id_b""".stripMargin

  /** ≙ ext_embdup_serving_probe_race — the race matrix's third dedup
    * family: phase 'pre' is the ingest restriction of the pre-fold pair
    * chain ([[embDupIngestSql]]'s rows — the probe that resolved
    * generation 1, answering on graced bytes), phase 'post' the
    * restriction over the decade-base-re-embedded vectors
    * ([[cdcEmbDupIngestSql]]'s rows — a fresh resolve after the flip).
    * One WITH list via the CTE-suffix convention (sfx = "_p"). */
  lazy val embDupProbeRaceSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    val off = graft.ext.EmbFeed.DupOffset
    def phase(label: String, sfx: String): String =
      s"""SELECT '$label' AS phase, id_a, id_b FROM epairs$sfx
         |WHERE id_a >= $off OR id_b >= $off""".stripMargin
    s"""WITH $embCorpusSql, ${embPairChainOver("embx")},
       |cl AS MATERIALIZED (
       |${docsCdc.changelogSql}
       |), cdelta AS (
       |  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl WHERE column_name = 'text' AND new_value IS NOT NULL
       |), postv AS (
       |  SELECT e.vec_id,
       |    CASE WHEN d.doc_id IS NULL THEN e.embedding
       |         ELSE b.embedding END AS embedding
       |  FROM embx e
       |  LEFT JOIN cdelta d ON e.vec_id = d.doc_id
       |  LEFT JOIN embeddings b ON b.vec_id = e.vec_id - e.vec_id % 10
       |), ${embPairChainOver("postv", "_p")}
       |${phase("pre", "")}
       |UNION ALL
       |${phase("post", "_p")}
       |ORDER BY phase, id_a, id_b""".stripMargin
  }

  /** ≙ ext_embdup_serving_forget: subject deletion (vec_id % 7 = 3) on
    * the per-vector-pure layout ≡ the scratch chain over the survivors
    * (the planted +DupOffset copies shift residues mod 7, so deletion
    * hits dup pairs from both sides). */
  val embDupForgetSql: String =
    s"""WITH $embCorpusSql, embv AS (
       |  SELECT * FROM embx WHERE vec_id % 7 <> 3
       |), ${embPairChainOver("embv")}
       |SELECT id_a, id_b FROM epairs
       |ORDER BY id_a, id_b""".stripMargin

  /** E2h ≙ Similarity.hardNegatives over the dup-planted corpus (queries =
    * vec_id % 100 = 0 — every one of which, being % 20 = 0, HAS a planted
    * scaled copy at cosine ~1 that must be excluded): top-5 most-similar
    * non-duplicates, cos < 0.99 filtered before ranking. */
  val hardNegativesSql: String =
    s"""WITH $embCorpusSql, q AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |  FROM embx WHERE vec_id % 100 = 0
       |), c AS (
       |  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embx
       |), s AS (
       |  SELECT query_id, neighbor_id, ${cosineSql("qv", "cv")} AS cos
       |  FROM q, c WHERE query_id <> neighbor_id
       |), r AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM s WHERE cos < 0.99
       |)
       |SELECT query_id, neighbor_id, rnk::INTEGER AS rnk
       |FROM r WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  /** E1d ≙ Dedup.nearDuplicatesByEmbedding (planted pairs sit at cosine
    * ≈ 1, random pairs ≤ ~0.5). */
  val dedupEmbeddingSql: String =
    s"""WITH $embPairCtes
       |SELECT id_a, id_b FROM epairs
       |ORDER BY id_a, id_b""".stripMargin

  /** ≙ ext.Cluster.clusters over Dedup.nearDuplicatesByEmbedding: the
    * embedding family closed through the same connected-components
    * operator as the shingle family (recursive-closure oracle, min
    * reachable id; singletons keep their own id). */
  val dedupClustersEmbSql: String =
    s"""WITH RECURSIVE $embPairCtes, und AS (
       |  SELECT id_a AS src, id_b AS dst FROM epairs
       |  UNION
       |  SELECT id_b, id_a FROM epairs
       |), reach AS (
       |  SELECT DISTINCT src AS id, src AS r FROM und
       |  UNION
       |  SELECT u.dst AS id, reach.r FROM reach JOIN und u ON u.src = reach.id
       |), comp AS (
       |  SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
       |)
       |SELECT e.vec_id, CAST(coalesce(comp.cluster_id, e.vec_id) AS BIGINT) AS cluster_id
       |FROM embx e LEFT JOIN comp ON comp.id = e.vec_id
       |ORDER BY e.vec_id""".stripMargin

  /** E2f ≙ Similarity.semanticDedup — SemDeDup: k-means cells over the
    * dup-planted embedding corpus, then prune any vector with a lower-id
    * cell-mate at cosine ≥ 0.99 (planted scaled copies; random 16-dim
    * pairs never reach the threshold). Declared AFTER embCorpusSql — vals
    * here initialize in file order. */
  val semdedupSql: String =
    s"""WITH $embCorpusSql, allv AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embx
       |), ${kmeansCellCtes(8)}, wc AS (
       |  SELECT c.vec_id, c.cell, a.v FROM cell2 c JOIN allv a ON a.vec_id = c.vec_id
       |), pruned AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM wc a JOIN wc b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${cosineSql("a.v", "b.v")} >= 0.99
       |)
       |SELECT w.vec_id, CAST(w.cell AS BIGINT) AS cid,
       |  CAST(CASE WHEN p.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_kept
       |FROM wc w LEFT JOIN pruned p ON p.vec_id = w.vec_id
       |ORDER BY w.vec_id""".stripMargin

  /** E3k ≙ Curate.lineDedup over the line-planted corpus — cross-document
    * line dedup with ordered surviving-text reconstruction (string_agg
    * ORDER BY pos ≙ Spark's sort_array(collect_list(struct(pos, line)))).
    * A doc whose every line is removed fingerprints the empty string on
    * both sides (coalesce(...,'')). */
  val lineDedupSql: String =
    s"""WITH $repCorpusSql, lnl AS (
       |  SELECT doc_id, string_split(text, chr(10)) AS lines FROM corpus
       |), idx AS (
       |  SELECT unnest(range((SELECT max(len(lines)) FROM lnl))) AS i
       |), ln AS (
       |  SELECT doc_id, i + 1 AS pos, lines[i+1] AS line
       |  FROM lnl, idx WHERE i < len(lines)
       |), dfq AS (
       |  SELECT line, count(DISTINCT doc_id) AS ndocs FROM ln GROUP BY line
       |), j AS (
       |  SELECT l.doc_id, l.pos, l.line, d.ndocs FROM ln l JOIN dfq d ON d.line = l.line
       |)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       |  CAST(sum(CASE WHEN ndocs < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |  md5(coalesce(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE ndocs < 2), ''))
       |    AS kept_fp
       |FROM j GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** E3l ≙ TextOps.chunkWindows — sliding 32-token windows at stride 16
    * with a tail window ending at the last token; full chunks, the tail,
    * and shorter-than-window docs rendered as three UNION branches. */
  val chunkWindowsSql: String = {
    val w = TextOps.ChunkWindow
    val st = TextOps.ChunkStride
    s"""WITH $corpusSql, tk AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks,
       |         len(string_split(text, ' ')) AS n
       |  FROM corpus
       |), idx AS (
       |  SELECT unnest(range((SELECT max(greatest((n - $w) // $st, 0)) + 1 FROM tk))) AS i
       |), full_chunks AS (
       |  SELECT doc_id, i AS chunk_idx, i * $st AS start_tok,
       |         md5(array_to_string(toks[i*$st+1 : i*$st+$w], ' ')) AS chunk_fp
       |  FROM tk, idx WHERE n > $w AND i <= (n - $w) // $st
       |), tail_chunks AS (
       |  SELECT doc_id, (n - $w) // $st + 1 AS chunk_idx, n - $w AS start_tok,
       |         md5(array_to_string(toks[n-$w+1 : n], ' ')) AS chunk_fp
       |  FROM tk WHERE n > $w AND (n - $w) % $st <> 0
       |), short_chunks AS (
       |  SELECT doc_id, 0 AS chunk_idx, 0 AS start_tok,
       |         md5(array_to_string(toks, ' ')) AS chunk_fp
       |  FROM tk WHERE n <= $w
       |)
       |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |       CAST(start_tok AS BIGINT) AS start_tok, chunk_fp
       |FROM (SELECT * FROM full_chunks UNION ALL SELECT * FROM tail_chunks
       |      UNION ALL SELECT * FROM short_chunks)
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }

  /** E3a' ≙ TextOps.bpeTokenStats (regex pre-tokenization counts). */
  val bpeTokensSql: String = {
    def cnt(p: String, as: String) =
      s"len(regexp_extract_all(lower(text), '$p')) AS $as"
    s"""WITH $corpusSql
       |SELECT doc_id,
       |  ${cnt(graft.ext.TextOps.SubwordPattern, "n_subwords")},
       |  ${cnt("[a-z]+", "n_alpha")},
       |  ${cnt("[0-9]+", "n_num")},
       |  ${cnt("[^a-z0-9 ]", "n_other")}
       |FROM corpus
       |ORDER BY doc_id""".stripMargin
  }

  /** E2c ≙ Similarity.topKCosineLshMulti (4 tables × 4 bits, k = 3). */
  val annMultiprobeSql: String = {
    val tables = 4
    val bits = 4
    val bucketList = (0 until tables).map { t =>
      bucketExprSql("embedding", t * bits until (t + 1) * bits, p => p % bits)
    }.mkString("[\n      ", ",\n      ", "\n    ]::BIGINT[]")
    s"""WITH buck AS (
       |  SELECT vec_id, $bucketList AS bl
       |  FROM embeddings
       |), tb AS (
       |  SELECT vec_id, generate_subscripts(bl, 1) AS t, unnest(bl) AS bucket FROM buck
       |), cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM tb q JOIN tb c ON q.t = c.t AND q.bucket = c.bucket
       |  WHERE q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id
       |), s AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |         ${cosineSql("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")} AS cos
       |  FROM cand
       |  JOIN embeddings a ON a.vec_id = cand.query_id
       |  JOIN embeddings b ON b.vec_id = cand.neighbor_id
       |), r AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM s
       |)
       |SELECT query_id, neighbor_id, rnk::INTEGER AS rnk
       |FROM r WHERE rnk <= 3
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** ≙ ops.Analytics.revenueByRegion (star-schema rollup; money as
    * floor-cents so the sum is integer-exact across engines). */
  val starAggSql: String =
    """SELECT r_name, n_name, count(*) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |  count(DISTINCT c_custkey) AS n_customers
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** E3f ≙ TextOps.qualityScore (integer basis points; `//` ≙ Spark `div`,
    * both (num*10000) // den on BIGINT). */
  val qualitySql: String = {
    val stops = TextOps.Stopwords.toMap.apply("en").map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH $corpusSql, base AS (
       |  SELECT doc_id,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    len(regexp_extract_all(lower(text), '[a-z]')) AS n_alpha,
       |    len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS n_punct,
       |    len(list_filter(string_split(text, ' '), t -> list_contains($stops, t))) AS n_stop,
       |    length(text) AS n_chars,
       |    length(replace(text, ' ', '')) AS n_nospace
       |  FROM corpus
       |), scored AS (
       |  SELECT doc_id, n_tokens,
       |    CASE WHEN n_chars > 0 THEN n_alpha * 10000 // n_chars ELSE 0 END AS alpha_bp,
       |    CASE WHEN n_chars > 0 THEN n_punct * 10000 // n_chars ELSE 0 END AS punct_bp,
       |    CASE WHEN n_tokens > 0 THEN n_stop * 10000 // n_tokens ELSE 0 END AS stop_bp,
       |    CASE WHEN n_tokens > 0 THEN n_nospace * 100 // n_tokens ELSE 0 END AS mean_tok_len_x100
       |  FROM base
       |)
       |SELECT doc_id, n_tokens, alpha_bp, punct_bp, stop_bp, mean_tok_len_x100,
       |  CASE WHEN n_tokens < 20 THEN 'short'
       |       WHEN stop_bp >= 500 THEN 'good'
       |       WHEN stop_bp >= 200 THEN 'mid'
       |       ELSE 'low' END AS verdict
       |FROM scored
       |ORDER BY doc_id""".stripMargin
  }

  /** E3m ≙ TextOps.qualitySample — deterministic quality-weighted
    * downsampling (good 100% / mid 50% / low 10% / short 0%, md5-bucket
    * keep rule). */
  val qualitySampleSql: String = {
    val stops = TextOps.Stopwords.toMap.apply("en").map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH $corpusSql, base AS (
       |  SELECT doc_id,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    len(list_filter(string_split(text, ' '), t -> list_contains($stops, t))) AS n_stop
       |  FROM corpus
       |), scored AS (
       |  SELECT doc_id, n_tokens,
       |    CASE WHEN n_tokens > 0 THEN n_stop * 10000 // n_tokens ELSE 0 END AS stop_bp
       |  FROM base
       |), v AS (
       |  SELECT doc_id,
       |    CASE WHEN n_tokens < 20 THEN 'short'
       |         WHEN stop_bp >= 500 THEN 'good'
       |         WHEN stop_bp >= 200 THEN 'mid'
       |         ELSE 'low' END AS verdict,
       |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100 AS b
       |  FROM scored
       |)
       |SELECT verdict, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN b < (CASE verdict WHEN 'good' THEN 100 WHEN 'mid' THEN 50
       |    WHEN 'low' THEN 10 ELSE 0 END) THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM v GROUP BY verdict
       |ORDER BY verdict""".stripMargin
  }

  /** ≙ ops.Sessions.sessionize over events (30-min gap, seconds
    * granularity). First event per user: lag is NULL → NULL condition →
    * ELSE 1, same as Spark's when().otherwise. */
  val sessionizeSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS t_s FROM events
      |), f AS (
      |  SELECT user_id, event_id, t_s,
      |    CASE WHEN t_s - lag(t_s) OVER w <= 1800 THEN 0 ELSE 1 END AS newf
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY t_s, event_id)
      |), s AS (
      |  SELECT user_id, t_s,
      |    CAST(sum(newf) OVER (PARTITION BY user_id ORDER BY t_s, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM f
      |)
      |SELECT user_id, session_seq, count(*) AS n_events,
      |  min(t_s) AS session_start_s, max(t_s) AS session_end_s,
      |  max(t_s) - min(t_s) AS duration_s
      |FROM s GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** ≙ ops.RangeJoin.intervalOverlap over the sessionized events: the
    * naive non-equi self-join IS the oracle (bucket expansion must be
    * result-invisible, including the canonical-bucket dedup). */
  val sessionOverlapSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS t_s FROM events
      |), f AS (
      |  SELECT user_id, event_id, t_s,
      |    CASE WHEN t_s - lag(t_s) OVER w <= 1800 THEN 0 ELSE 1 END AS newf
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY t_s, event_id)
      |), s AS (
      |  SELECT user_id, t_s,
      |    CAST(sum(newf) OVER (PARTITION BY user_id ORDER BY t_s, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM f
      |), sess AS MATERIALIZED (
      |  SELECT user_id, session_seq, min(t_s) AS lo, max(t_s) AS hi
      |  FROM s GROUP BY user_id, session_seq
      |)
      |SELECT a.user_id AS user_a, a.session_seq AS seq_a,
      |       b.user_id AS user_b, b.session_seq AS seq_b,
      |       least(a.hi, b.hi) - greatest(a.lo, b.lo) + 1 AS overlap_s
      |FROM sess a JOIN sess b
      |  ON a.user_id < b.user_id AND a.lo <= b.hi AND b.lo <= a.hi
      |ORDER BY user_a, seq_a, user_b, seq_b""".stripMargin

  /** ≙ ops.AsOfJoin.backward(events, purchase marks): the union+window
    * formulation written out — semantically DuckDB's `ASOF JOIN` with
    * `ON a.user_id = b.user_id AND a.t_s >= b.t_s` plus a deterministic
    * max-event_id tie-break among same-instant marks. */
  val asofSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS t_s, event_type FROM events
      |), u AS (
      |  SELECT user_id, t_s, event_id, 1 AS tag, NULL::BIGINT AS pid FROM e
      |  UNION ALL
      |  SELECT user_id, t_s, NULL::BIGINT, 0 AS tag, event_id AS pid
      |  FROM e WHERE event_type = 'purchase'
      |), w AS (
      |  SELECT user_id, t_s, event_id, tag,
      |    last_value(pid IGNORE NULLS) OVER win AS ref_event_id,
      |    last_value(CASE WHEN tag = 0 THEN t_s END IGNORE NULLS) OVER win AS ref_t_s
      |  FROM u
      |  WINDOW win AS (PARTITION BY user_id ORDER BY t_s, tag, pid ASC NULLS FIRST
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |)
      |SELECT event_id, user_id, t_s, ref_event_id, t_s - ref_t_s AS lag_s
      |FROM w WHERE tag = 1
      |ORDER BY event_id""".stripMargin

  /** ≙ ops.AsOfJoin.selfForward: the asofSql union+window with a FORWARD
    * frame — probes sort before same-instant marks (tag DESC) so `>=`
    * holds at equal times; first_value picks the earliest mark, min-id
    * tiebreak. */
  val asofForwardSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS t_s, event_type FROM events
      |), u AS (
      |  SELECT user_id, t_s, event_id, 1 AS tag, NULL::BIGINT AS pid FROM e
      |  UNION ALL
      |  SELECT user_id, t_s, NULL::BIGINT, 0 AS tag, event_id AS pid
      |  FROM e WHERE event_type = 'purchase'
      |), w AS (
      |  SELECT user_id, t_s, event_id, tag,
      |    first_value(pid IGNORE NULLS) OVER win AS ref_event_id,
      |    first_value(CASE WHEN tag = 0 THEN t_s END IGNORE NULLS) OVER win AS ref_t_s
      |  FROM u
      |  WINDOW win AS (PARTITION BY user_id ORDER BY t_s, tag DESC, pid ASC NULLS FIRST
      |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |)
      |SELECT event_id, user_id, t_s, ref_event_id, ref_t_s - t_s AS lead_s
      |FROM w WHERE tag = 1
      |ORDER BY event_id""".stripMargin

  /** ≙ ops.Analytics.revenueRollup (GROUPING_ID bit order: first arg is the
    * most significant bit in BOTH engines — verified 0/1/3 here). */
  val rollupSql: String =
    """SELECT r_name, n_name, CAST(GROUPING_ID(r_name, n_name) AS BIGINT) AS gid,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |  count(DISTINCT c_custkey) AS n_customers
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY gid, r_name, n_name""".stripMargin

  /** ≙ ops.Analytics.ordersCube — all four grouping combinations in one
    * Expand pass; GROUPING_ID first-arg-MSB matches Spark. */
  val cubeSql: String =
    """SELECT o_orderpriority, o_orderstatus,
      |  CAST(GROUPING_ID(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM orders
      |GROUP BY CUBE(o_orderpriority, o_orderstatus)
      |ORDER BY gid, o_orderpriority, o_orderstatus""".stripMargin

  /** ≙ ops.Analytics.exactQuantiles(per-lang token counts): the rank
    * formula (`ceil(p·n)` via integer division) is written out identically
    * on both engines rather than trusting either engine's quantile_disc
    * rank convention. */
  val exactQuantilesSql: String =
    """WITH t AS (
      |  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents
      |), r AS (
      |  SELECT lang, n, row_number() OVER (PARTITION BY lang ORDER BY n) AS rn,
      |         count(*) OVER (PARTITION BY lang) AS cnt
      |  FROM t
      |)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
      |  min(n) AS min_v,
      |  max(CASE WHEN rn = (cnt + 1) // 2 THEN n END) AS p50_v,
      |  max(CASE WHEN rn = (cnt * 9 + 9) // 10 THEN n END) AS p90_v,
      |  max(n) AS max_v
      |FROM r GROUP BY lang ORDER BY lang""".stripMargin

  /** E3-colloc ≙ TextOps.collocations: integer-lift collocation mining
    * (log-free PMI surrogate — the log is monotone so the ranking is
    * PMI's), minCount 5, top-20 by (lift desc, bigram). */
  val collocationsSql: String =
    s"""WITH $corpusSql, tk AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM corpus
       |), idx AS (
       |  SELECT unnest(range((SELECT max(len(toks)) FROM tk))) AS i
       |), t AS MATERIALIZED (
       |  SELECT toks[i+1] AS w FROM tk, idx WHERE i < len(toks)
       |), uni AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM t GROUP BY 1
       |), nn AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n FROM t
       |), c AS (
       |  SELECT bg, CAST(count(*) AS BIGINT) AS c12 FROM (
       |    SELECT ${ngramConcat("toks", 2)} AS bg
       |    FROM tk, idx WHERE i <= len(toks) - 2) b
       |  GROUP BY bg HAVING count(*) >= 5
       |)
       |SELECT bg, c12,
       |  CAST(c12 * n * 10000 // (u1.c1 * u2.c1) AS BIGINT) AS lift_bp
       |FROM c
       |JOIN uni u1 ON u1.w = string_split(bg, ' ')[1]
       |JOIN uni u2 ON u2.w = string_split(bg, ' ')[2]
       |CROSS JOIN nn
       |ORDER BY lift_bp DESC, bg
       |LIMIT 20""".stripMargin

  /** ≙ TextOps.greedyGenerate: deterministic greedy bigram-LM walks —
    * vocabulary-sized `best` successor table (argmax count, lexicographic
    * tiebreak), top-3 unigram seeds, 6 unrolled left-join steps;
    * concat_ws skips NULL steps on both engines. */
  val lmGenerateSql: String = {
    val steps = (1 to 6).map { k =>
      s"""s$k AS (
         |  SELECT s.*, b.w2 AS g$k FROM s${k - 1} s
         |  LEFT JOIN best b ON b.w1 = s.g${k - 1}
         |)""".stripMargin
    }.mkString(", ")
    val gcols = (0 to 6).map(k => s"g$k").mkString(", ")
    val ncnt = (0 to 6).map(k => s"(CASE WHEN g$k IS NOT NULL THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH $corpusSql, tk AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM corpus
       |), idx AS (
       |  SELECT unnest(range((SELECT max(len(toks)) FROM tk))) AS i
       |), t AS MATERIALIZED (
       |  SELECT toks[i+1] AS w FROM tk, idx WHERE i < len(toks)
       |), uni AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM t GROUP BY 1
       |), bgc AS (
       |  SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2,
       |         CAST(count(*) AS BIGINT) AS c2
       |  FROM (SELECT ${ngramConcat("toks", 2)} AS bg
       |        FROM tk, idx WHERE i <= len(toks) - 2) b
       |  GROUP BY 1, 2
       |), best AS MATERIALIZED (
       |  SELECT w1, w2 FROM (
       |    SELECT w1, w2, row_number() OVER (PARTITION BY w1 ORDER BY c2 DESC, w2) AS rn
       |    FROM bgc) x WHERE rn = 1
       |), s0 AS (
       |  SELECT w AS g0, CAST(rn AS BIGINT) AS seed_rank FROM (
       |    SELECT w, row_number() OVER (ORDER BY c1 DESC, w) AS rn FROM uni) x
       |  WHERE rn <= 3
       |), $steps
       |SELECT seed_rank, g0 AS seed,
       |  concat_ws(' ', $gcols) AS gen_text,
       |  CAST($ncnt AS BIGINT) AS n_tokens
       |FROM s6 ORDER BY seed_rank""".stripMargin
  }

  /** ≙ ops.Profile.percentileRanks over events.value cents per
    * event_type: `(rank − 1) · 10⁴ // n`, rank()'s min-rank tie
    * convention on both engines. */
  val percentileRanksSql: String =
    """WITH e AS (
      |  SELECT event_id, event_type,
      |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events
      |)
      |SELECT event_id, event_type, cents,
      |  CAST(((rank() OVER (PARTITION BY event_type ORDER BY cents)) - 1) * 10000
      |    // (count(*) OVER (PARTITION BY event_type)) AS BIGINT) AS pct_bp
      |FROM e
      |ORDER BY event_id""".stripMargin

  /** ≙ Packing.temporalSplit over events: range-based 80% time cut +
    * 1-day embargo buffer; membership pinned by id sums. All time math
    * at epoch seconds (the repo rule). */
  val temporalSplitSql: String =
    s"""WITH e AS (
       |  SELECT event_id, epoch_ns(ts) // 1000000000 AS t_s FROM events
       |), b AS (
       |  SELECT min(t_s) AS lo, max(t_s) AS hi FROM e
       |), cut AS (
       |  SELECT lo + ((hi - lo) * 8000) // 10000 AS c FROM b
       |), tagged AS (
       |  SELECT e.*, CASE WHEN t_s <= c THEN 'train'
       |                   WHEN t_s <= c + 86400 THEN 'embargo'
       |                   ELSE 'test' END AS split
       |  FROM e CROSS JOIN cut
       |)
       |SELECT split, CAST(count(*) AS BIGINT) AS n_rows,
       |  min(t_s) AS min_t, max(t_s) AS max_t,
       |  CAST(sum(event_id) AS BIGINT) AS id_sum
       |FROM tagged GROUP BY split
       |ORDER BY split""".stripMargin

  /** ≙ ops.Profile.outlierFences over events.value cents per event_type:
    * rank-selected quartiles + doubled-value Tukey fences. */
  val outlierFencesSql: String =
    """WITH t AS (
      |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events
      |), r AS (
      |  SELECT event_type, v,
      |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM t
      |), q AS (
      |  SELECT event_type,
      |    max(CASE WHEN rn = (cnt + 3) // 4 THEN v END) AS p25_v,
      |    max(CASE WHEN rn = (cnt * 3 + 3) // 4 THEN v END) AS p75_v
      |  FROM r GROUP BY event_type
      |)
      |SELECT t.event_type, CAST(count(*) AS BIGINT) AS n_rows,
      |  max(p25_v) AS p25_v, max(p75_v) AS p75_v,
      |  CAST(sum(CASE WHEN t.v * 2 < p25_v * 2 - (p75_v - p25_v) * 3
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      |  CAST(sum(CASE WHEN t.v * 2 > p75_v * 2 + (p75_v - p25_v) * 3
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      |FROM t JOIN q ON t.event_type = q.event_type
      |GROUP BY t.event_type
      |ORDER BY t.event_type""".stripMargin

  /** ≙ the salted skew join graded query: salting must be RESULT-INVISIBLE,
    * so the oracle is the plain inner join + aggregation. */
  val skewJoinSql: String =
    """SELECT o_orderpriority, count(*) AS n_lines,
      |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** ≙ Similarity.quantizeInt8. Explicit CAST-to-DOUBLE at every float
    * step so both engines run the identical double-precision expression. */
  val quantizeSql: String =
    """WITH src AS (
      |  -- NULL/empty vectors excluded identically to the Spark side
      |  SELECT vec_id, embedding FROM embeddings
      |  WHERE embedding IS NOT NULL AND len(embedding) > 0
      |), q AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 /
      |      list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE))))) AS INTEGER)) AS qv
      |  FROM src
      |  WHERE list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) > 0
      |  UNION ALL
      |  SELECT vec_id, list_transform(embedding, x -> 0)
      |  FROM src
      |  WHERE NOT (list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) > 0)
      |)
      |SELECT vec_id,
      |  list_min(qv) AS q_min,
      |  list_max(qv) AS q_max,
      |  CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
      |  len(list_filter(qv, x -> x != 0)) AS n_nonzero,
      |  md5(array_to_string(qv, ',')) AS fp_q
      |FROM q
      |ORDER BY vec_id""".stripMargin

  /** E3g ≙ TextOps.topTerms (k=3, maxDfPct=50). */
  val topTermsSql: String =
    s"""WITH $corpusSql, tf AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM corpus
       |), tfc AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY doc_id, term
       |), dfc AS (
       |  SELECT term, count(*) AS df FROM tfc GROUP BY term
       |), ranked AS (
       |  SELECT t.doc_id, t.term, t.tf, d.df,
       |    row_number() OVER (PARTITION BY t.doc_id ORDER BY t.tf DESC, t.term ASC) AS rnk
       |  FROM tfc t JOIN dfc d ON d.term = t.term
       |  WHERE d.df * 100 <= (SELECT count(*) FROM corpus) * 50
       |)
       |SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, term, tf, df
       |FROM ranked WHERE rnk <= 3
       |ORDER BY doc_id, rnk""".stripMargin

  /** E3h ≙ TextOps.tokenDeciles (standard ntile distribution, ties
    * totalized by doc_id on both engines). */
  val tokenDecilesSql: String =
    s"""WITH $corpusSql, base AS (
       |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens FROM corpus
       |), d AS (
       |  SELECT lang, n_tokens,
       |    CAST(ntile(10) OVER (PARTITION BY lang ORDER BY n_tokens ASC, doc_id ASC) AS INTEGER)
       |      AS decile
       |  FROM base
       |)
       |SELECT lang, decile, count(*) AS n_docs,
       |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
       |FROM d GROUP BY lang, decile
       |ORDER BY lang, decile""".stripMargin

  /** ≙ Similarity.kmvDistinct over (event_type, user_id), k=16. */
  val kmvSql: String =
    """WITH d AS (
      |  SELECT DISTINCT event_type, user_id FROM events
      |), h AS (
      |  SELECT event_type,
      |    ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT AS hv
      |  FROM d
      |), r AS (
      |  SELECT event_type, hv,
      |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      |  FROM h
      |), kept AS (
      |  SELECT event_type, count(*) AS n_kept, CAST(max(hv) AS BIGINT) AS kth_hash
      |  FROM r WHERE rn <= 16 GROUP BY event_type
      |)
      |SELECT event_type, n_kept, kth_hash,
      |  CASE WHEN n_kept < 16 THEN n_kept
      |       WHEN kth_hash = 0 THEN NULL
      |       ELSE CAST(15::BIGINT * 4294967296 // kth_hash AS BIGINT) END AS est_distinct
      |FROM kept
      |ORDER BY event_type""".stripMargin

  /** ≙ ext_zorder: the z-clustered layout must be result-invisible — the
    * oracle aggregates the plain table. */
  /** E2g ≙ Similarity.hllDistinct over per-language tokens — HyperLogLog
    * registers (first-hex-char bucket, 33 − length(bin(v)) rho) and the
    * integer-rendered alpha·m²/Σ2^-Mj estimate, exact count alongside. */
  val hllSql: String = hllSqlWhere("TRUE")

  /** ≙ the ext_hll_forget fallback: max registers cannot subtract, so the
    * deletion re-SKETCHES the survivors and replaces the state — which by
    * construction equals the direct chain over the survivor slice (this
    * oracle). The exactly-once replay contract is pinned by
    * EventStreamSpec, not the hash. */
  val hllForgetSql: String = hllSqlWhere("doc_id % 7 <> 3")

  private def hllSqlWhere(where: String): String =
    s"""WITH $corpusSql, tokl AS (
       |  SELECT lang, string_split(text, ' ') AS toks FROM corpus
       |  WHERE $where
       |), idx AS (
       |  SELECT unnest(range((SELECT max(len(toks)) FROM tokl))) AS i
       |), tok AS (
       |  SELECT lang, ${shingleConcat("toks")} AS t
       |  FROM tokl, idx
       |  WHERE i <= len(toks) - ${Dedup.ShingleLen}
       |), hashed AS (
       |  SELECT lang, ('0x' || substr(md5(t), 1, 1))::BIGINT AS bucket,
       |         ('0x' || substr(md5(t), 2, 8))::BIGINT AS v
       |  FROM tok
       |), regs AS (
       |  SELECT lang, bucket,
       |    max(CASE WHEN v = 0 THEN 33 ELSE 33 - length(bin(v)) END) AS register
       |  FROM hashed GROUP BY lang, bucket
       |), filled AS (
       |  SELECT l.lang, b.bucket, coalesce(r.register, 0) AS register
       |  FROM (SELECT DISTINCT lang FROM corpus WHERE $where) l
       |  CROSS JOIN (SELECT unnest(range(${graft.ext.Similarity.HllBuckets})) AS bucket) b
       |  LEFT JOIN regs r ON r.lang = l.lang AND r.bucket = b.bucket
       |), agg AS (
       |  SELECT lang,
       |    CAST(sum(CAST(1 AS BIGINT) << CAST(33 - register AS INTEGER)) AS BIGINT) AS denom,
       |    CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_buckets
       |  FROM filled GROUP BY lang
       |), ex AS (
       |  SELECT lang, count(DISTINCT t) AS exact_distinct FROM tok GROUP BY lang
       |)
       |SELECT a.lang, ex.exact_distinct,
       |  CAST(CAST(${graft.ext.Similarity.HllNumerator} AS BIGINT) // (a.denom * 1000)
       |    AS BIGINT) AS hll_est,
       |  a.n_zero_buckets
       |FROM agg a JOIN ex ON ex.lang = a.lang
       |ORDER BY a.lang""".stripMargin

  /** ≙ Similarity.hllMergedDistinct — per-language register tables merged
    * by max per bucket into one global estimate, data never re-read. */
  val hllMergedSql: String =
    s"""WITH $corpusSql, tokl AS (
       |  SELECT lang, string_split(text, ' ') AS toks FROM corpus
       |), idx AS (
       |  SELECT unnest(range((SELECT max(len(toks)) FROM tokl))) AS i
       |), tok AS (
       |  SELECT lang, ${shingleConcat("toks")} AS t
       |  FROM tokl, idx
       |  WHERE i <= len(toks) - ${Dedup.ShingleLen}
       |), hashed AS (
       |  SELECT lang, ('0x' || substr(md5(t), 1, 1))::BIGINT AS bucket,
       |         ('0x' || substr(md5(t), 2, 8))::BIGINT AS v
       |  FROM tok
       |), pergroup AS (
       |  SELECT lang, bucket,
       |    max(CASE WHEN v = 0 THEN 33 ELSE 33 - length(bin(v)) END) AS register
       |  FROM hashed GROUP BY lang, bucket
       |), merged AS (
       |  SELECT bucket, max(register) AS register FROM pergroup GROUP BY bucket
       |), filled AS (
       |  SELECT b.bucket, coalesce(m.register, 0) AS register
       |  FROM (SELECT unnest(range(${graft.ext.Similarity.HllBuckets})) AS bucket) b
       |  LEFT JOIN merged m ON m.bucket = b.bucket
       |), agg AS (
       |  SELECT CAST(sum(CAST(1 AS BIGINT) << CAST(33 - register AS INTEGER)) AS BIGINT) AS denom,
       |    CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_buckets
       |  FROM filled
       |), ex AS (
       |  SELECT count(DISTINCT t) AS exact_distinct FROM tok
       |)
       |SELECT 'all' AS scope, ex.exact_distinct,
       |  CAST(CAST(${graft.ext.Similarity.HllNumerator} AS BIGINT) // (agg.denom * 1000)
       |    AS BIGINT) AS hll_est,
       |  agg.n_zero_buckets
       |FROM agg, ex""".stripMargin

  val zorderSql: String =
    """SELECT l_returnflag, count(*) AS n_rows,
      |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** ≙ Similarity.kmvMergedDistinct: per-group sketches unioned (distinct
    * kept hashes, k smallest survive) into one global estimate — the merge
    * path exercised end-to-end. */
  val kmvMergedSql: String =
    """WITH d AS (
      |  SELECT DISTINCT event_type, user_id FROM events
      |), h AS (
      |  SELECT event_type,
      |    ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT AS hv
      |  FROM d
      |), r AS (
      |  SELECT event_type, hv,
      |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      |  FROM h
      |), merged AS (
      |  SELECT DISTINCT hv FROM r WHERE rn <= 16
      |), mr AS (
      |  SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM merged
      |), kept AS (
      |  SELECT count(*) AS n_kept, CAST(max(hv) AS BIGINT) AS kth_hash
      |  FROM mr WHERE rn <= 16
      |)
      |SELECT 'all' AS scope, n_kept, kth_hash,
      |  CASE WHEN n_kept < 16 THEN n_kept
      |       WHEN kth_hash = 0 THEN NULL
      |       ELSE CAST(15::BIGINT * 4294967296 // kth_hash AS BIGINT) END AS est_distinct
      |FROM kept""".stripMargin

  /** ≙ streaming.EventStream.dedupStreamedToFiles: the planted duplicate
    * deliveries collapse to exactly the original fixture rows. */
  val dedupStreamSql: String =
    """SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS t_s, event_type
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** ≙ ops.IntervalJoin.withinAfter over view→purchase conversions. */
  val intervalJoinSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS t_s, event_type FROM events
      |)
      |SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
      |  p.t_s - v.t_s AS gap_s
      |FROM e v JOIN e p
      |  ON p.user_id = v.user_id
      | AND v.event_type = 'view' AND p.event_type = 'purchase'
      | AND p.t_s >= v.t_s AND p.t_s <= v.t_s + 3600
      |ORDER BY view_id, purchase_id""".stripMargin

  /** ≙ the LEFT-OUTER interval join (batch and stream-stream drives share
    * it): every view row survives; unconverted views carry NULL
    * purchase_id / gap_s. The view filter lives in a CTE, not the ON
    * clause — in a left join an ON-side left predicate would change
    * semantics. */
  val intervalJoinLeftSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS t_s, event_type FROM events
      |), v AS (
      |  SELECT event_id, user_id, t_s FROM e WHERE event_type = 'view'
      |), p AS (
      |  SELECT event_id, user_id, t_s FROM e WHERE event_type = 'purchase'
      |)
      |SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
      |  p.t_s - v.t_s AS gap_s
      |FROM v LEFT JOIN p
      |  ON p.user_id = v.user_id
      | AND p.t_s >= v.t_s AND p.t_s <= v.t_s + 3600
      |ORDER BY view_id, purchase_id""".stripMargin

  /** ≙ IntervalJoin.withinAfter(full_outer): the left rows plus the
    * ORPHANED purchases no view preceded within the hour (NULL view
    * columns, key coalesced across sides) — the attribution-gap audit. */
  val intervalJoinFullSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS t_s, event_type FROM events
      |), v AS (
      |  SELECT event_id, user_id, t_s FROM e WHERE event_type = 'view'
      |), p AS (
      |  SELECT event_id, user_id, t_s FROM e WHERE event_type = 'purchase'
      |)
      |SELECT v.event_id AS view_id, p.event_id AS purchase_id,
      |  coalesce(v.user_id, p.user_id) AS user_id,
      |  p.t_s - v.t_s AS gap_s
      |FROM v FULL OUTER JOIN p
      |  ON p.user_id = v.user_id
      | AND p.t_s >= v.t_s AND p.t_s <= v.t_s + 3600
      |ORDER BY view_id, purchase_id""".stripMargin

  /** ≙ EventStream.enrichedWindowCountsStreamedToFiles: the stream–static
    * broadcast enrichment (user → customer → nation via
    * `c_custkey − 1 = user_id % |customer|`) followed by 1-hour windowed
    * counts; window start = epoch floored to 3600 (UTC session both
    * engines). */
  val streamStaticJoinSql: String =
    """WITH e AS (
      |  SELECT epoch_ns(ts) // 1000000000 AS t_s, user_id FROM events
      |), n AS (SELECT count(*) AS n FROM customer),
      |j AS (
      |  SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
      |         (e.t_s // 3600) * 3600 AS window_start_s
      |  FROM e CROSS JOIN n
      |  JOIN customer c ON c.c_custkey - 1 = e.user_id % n.n
      |)
      |SELECT nation, window_start_s, CAST(count(*) AS BIGINT) AS n_events
      |FROM j GROUP BY nation, window_start_s
      |ORDER BY nation, window_start_s""".stripMargin

  /** ≙ cdc.ServingBridge.enrichAsOf ∘ timedEpisodes ∘ servingRequests
    * (batch AND streamed drives): purchases mapped into the changelog's
    * key space ((event_id mod N//10)*10 + an m∈{2,3,5,7} residue) and
    * clock (base + event-seconds mod N), LEFT-joined to the single SCD2
    * o_orderstatus episode whose [from, to) interval contains the serving
    * instant. The changelog CTE is the SAME CdcOracle chain every cdc_*
    * query grades against; epoch() is exact (whole-second commit times). */
  private def cdcServingSqlOver(
      changelogSql: String, column: String, residues: Seq[Int],
      reqWhere: String = "TRUE", epsWhere: String = "TRUE"): String =
    s"""WITH cl AS (
       |$changelogSql
       |), eps0 AS (
       |  SELECT CAST(o_orderkey AS BIGINT) AS serve_key, new_value AS status_asof,
       |         changelog_id AS ep_id,
       |         CAST(epoch(commit_time) AS BIGINT) AS valid_from_s
       |  FROM cl WHERE column_name = '$column' AND ($epsWhere)
       |), eps AS (
       |  SELECT *, lead(valid_from_s) OVER (PARTITION BY serve_key ORDER BY ep_id)
       |    AS valid_to_s
       |  FROM eps0
       |), nn AS (SELECT CAST(max(o_orderkey) AS BIGINT) AS n FROM orders),
       |req AS (
       |  SELECT CAST(event_id AS BIGINT) AS event_id,
       |    CAST((event_id % (n // 10)) * 10
       |      + (${graft.cdc.ServingBridge.residueCaseSql(residues)})
       |      AS BIGINT) AS serve_key,
       |    CAST(788918400 + ((epoch_ns(ts) // 1000000000) % n) AS BIGINT) AS serve_s
       |  FROM events CROSS JOIN nn
       |  WHERE event_type = 'purchase'
       |), reqf AS (
       |  SELECT * FROM req WHERE $reqWhere
       |)
       |SELECT r.event_id, r.serve_key, r.serve_s, e.status_asof, e.ep_id
       |FROM reqf r LEFT JOIN eps e
       |  ON e.serve_key = r.serve_key AND e.valid_from_s <= r.serve_s
       | AND (e.valid_to_s IS NULL OR r.serve_s < e.valid_to_s)
       |ORDER BY event_id""".stripMargin

  lazy val cdcServingJoinSql: String = cdcServingSqlOver(
    OrdersCdcOracle.changelogSql, "o_orderstatus",
    graft.cdc.ServingBridge.DefaultResidues)

  /** ≙ ext_cdc_serving_grace_read: the reader pinned to the MID-HWM
    * generation of the episode store answers every request from the
    * window-1 episode set alone — open episodes at the HWM stay open
    * (the lead() recomputes within the filtered set, exactly what the
    * mid layout stores), and window-1 changelog ids are the global ids'
    * prefix (the resume contract's append-stability), so the filter
    * composes with the full chain. Visibly different from the post-fold
    * state a fresh read serves. */
  lazy val cdcServingGraceSql: String = cdcServingSqlOver(
    OrdersCdcOracle.changelogSql, "o_orderstatus",
    graft.cdc.ServingBridge.DefaultResidues,
    epsWhere = s"commit_time <= TIMESTAMP '${OrdersCdcOracle.ResumeMid}'")

  /** ≙ ext_cdc_serving_probe_race: the TWO answers a pinned enrichment
    * racing a snapshot-isolated window-2 fold can correctly observe —
    * phase 'pre' serves every request from the mid-HWM episode set
    * ([[cdcServingGraceSql]]'s rows, graced gen-1 bytes: open episodes
    * at the HWM stay open), phase 'post' from the folded full-history
    * store ([[cdcServingJoinSql]]'s rows, a fresh resolve). One WITH
    * list: cl and the request side are shared (MATERIALIZED — two
    * consumers), only the episode chain forks on the HWM filter. */
  lazy val cdcServingRaceSql: String =
    s"""WITH cl AS MATERIALIZED (
       |${OrdersCdcOracle.changelogSql}
       |), eps0 AS (
       |  SELECT CAST(o_orderkey AS BIGINT) AS serve_key, new_value AS status_asof,
       |         changelog_id AS ep_id,
       |         CAST(epoch(commit_time) AS BIGINT) AS valid_from_s
       |  FROM cl WHERE column_name = 'o_orderstatus'
       |), eps AS (
       |  SELECT *, lead(valid_from_s) OVER (PARTITION BY serve_key ORDER BY ep_id)
       |    AS valid_to_s
       |  FROM eps0
       |), eps0_g AS (
       |  SELECT CAST(o_orderkey AS BIGINT) AS serve_key, new_value AS status_asof,
       |         changelog_id AS ep_id,
       |         CAST(epoch(commit_time) AS BIGINT) AS valid_from_s
       |  FROM cl WHERE column_name = 'o_orderstatus'
       |    AND commit_time <= TIMESTAMP '${OrdersCdcOracle.ResumeMid}'
       |), eps_g AS (
       |  SELECT *, lead(valid_from_s) OVER (PARTITION BY serve_key ORDER BY ep_id)
       |    AS valid_to_s
       |  FROM eps0_g
       |), nn AS (SELECT CAST(max(o_orderkey) AS BIGINT) AS n FROM orders),
       |req AS MATERIALIZED (
       |  SELECT CAST(event_id AS BIGINT) AS event_id,
       |    CAST((event_id % (n // 10)) * 10
       |      + (${graft.cdc.ServingBridge.residueCaseSql(graft.cdc.ServingBridge.DefaultResidues)})
       |      AS BIGINT) AS serve_key,
       |    CAST(788918400 + ((epoch_ns(ts) // 1000000000) % n) AS BIGINT) AS serve_s
       |  FROM events CROSS JOIN nn
       |  WHERE event_type = 'purchase'
       |)
       |SELECT 'pre' AS phase, r.event_id, r.serve_key, r.serve_s,
       |       e.status_asof, e.ep_id
       |FROM req r LEFT JOIN eps_g e
       |  ON e.serve_key = r.serve_key AND e.valid_from_s <= r.serve_s
       | AND (e.valid_to_s IS NULL OR r.serve_s < e.valid_to_s)
       |UNION ALL
       |SELECT 'post' AS phase, r.event_id, r.serve_key, r.serve_s,
       |       e.status_asof, e.ep_id
       |FROM req r LEFT JOIN eps e
       |  ON e.serve_key = r.serve_key AND e.valid_from_s <= r.serve_s
       | AND (e.valid_to_s IS NULL OR r.serve_s < e.valid_to_s)
       |ORDER BY phase, event_id""".stripMargin

  /** ≙ ext_cdc_serving_retention: the ORACLE serves every in-contract
    * request (serve_s at-or-after the mid-clock horizon) from the FULL
    * episode set — retention on the store must be invisible to them,
    * which is exactly what the graded equality proves. */
  lazy val cdcServingRetentionSql: String = cdcServingSqlOver(
    OrdersCdcOracle.changelogSql, "o_orderstatus",
    graft.cdc.ServingBridge.DefaultResidues,
    reqWhere = "serve_s >= 788918400 + (SELECT n // 2 FROM nn)")

  /** ≙ ext_cdc_serving_pruned: the point-read slice served over the
    * persisted partitioned store must answer exactly as the full join
    * restricted to the slice — the layout and pruning are
    * result-invisible. */
  lazy val cdcServingPrunedSql: String = cdcServingSqlOver(
    OrdersCdcOracle.changelogSql, "o_orderstatus",
    graft.cdc.ServingBridge.DefaultResidues,
    reqWhere = "event_id % 20 = 0")

  /** ≙ ext_cdc_serving_forget: subject deletion on the serving store is a
    * row FILTER on per-(key, interval)-pure episodes, so the oracle builds
    * episodes from the survivor slice of the changelog and serves EVERY
    * request over them — the subject's requests must answer NULL (never a
    * stale value), everyone else's byte-identically. */
  lazy val cdcServingForgetSql: String = cdcServingSqlOver(
    OrdersCdcOracle.changelogSql, "o_orderstatus",
    graft.cdc.ServingBridge.DefaultResidues,
    epsWhere = "CAST(o_orderkey AS BIGINT) % 97 <> 0")

  /** ≙ ext_cdc_serving_dropped: the bridge over the DROPPED-column era
    * changelog — pre-drop m=6 keys serve their stale last-known value at
    * every later instant; post-drop m=6 keys never acquire one. */
  lazy val cdcServingDroppedSql: String = cdcServingSqlOver(
    OrdersCdcOracle.dropChangelogSql, "o_orderpriority", Seq(6))

  /** ≙ ext_cdc_serving_multi (ServingBridge.enrichAsOfMany): the
    * feature-store MULTI-feature read — each request LEFT joins its
    * o_orderstatus AND o_totalprice episodes at the same instant; m∈{5,7}
    * keys have status episodes but no price ones (price updates only at
    * m∈{2,3}), so the price pair is NULL there — per-feature sparsity at
    * one consistent read time. */
  lazy val cdcServingMultiSql: String = {
    def epsCtes(tag: String, column: String): String =
      s"""eps${tag}0 AS (
         |  SELECT CAST(o_orderkey AS BIGINT) AS serve_key, new_value AS v,
         |         changelog_id AS ep_id,
         |         CAST(epoch(commit_time) AS BIGINT) AS valid_from_s
         |  FROM cl WHERE column_name = '$column'
         |), eps$tag AS (
         |  SELECT *, lead(valid_from_s) OVER (PARTITION BY serve_key ORDER BY ep_id)
         |    AS valid_to_s
         |  FROM eps${tag}0
         |)""".stripMargin
    s"""WITH cl AS (
       |${OrdersCdcOracle.changelogSql}
       |), ${epsCtes("s", "o_orderstatus")}, ${epsCtes("p", "o_totalprice")},
       |nn AS (SELECT CAST(max(o_orderkey) AS BIGINT) AS n FROM orders),
       |req AS (
       |  SELECT CAST(event_id AS BIGINT) AS event_id,
       |    CAST((event_id % (n // 10)) * 10
       |      + (${graft.cdc.ServingBridge.residueCaseSql(
                  graft.cdc.ServingBridge.DefaultResidues)})
       |      AS BIGINT) AS serve_key,
       |    CAST(788918400 + ((epoch_ns(ts) // 1000000000) % n) AS BIGINT) AS serve_s
       |  FROM events CROSS JOIN nn
       |  WHERE event_type = 'purchase'
       |)
       |SELECT r.event_id, r.serve_key, r.serve_s,
       |  s.v AS status_asof, s.ep_id AS status_ep_id,
       |  p.v AS price_asof, p.ep_id AS price_ep_id
       |FROM req r
       |LEFT JOIN epss s
       |  ON s.serve_key = r.serve_key AND s.valid_from_s <= r.serve_s
       | AND (s.valid_to_s IS NULL OR r.serve_s < s.valid_to_s)
       |LEFT JOIN epsp p
       |  ON p.serve_key = r.serve_key AND p.valid_from_s <= r.serve_s
       | AND (p.valid_to_s IS NULL OR r.serve_s < p.valid_to_s)
       |ORDER BY event_id""".stripMargin
  }

  /** ≙ ops.Features.purchaseFeatures: the point-in-time feature matrix —
    * trailing-hour view count (RANGE frame, peers included), session
    * ordinal (gaps-and-islands running sum over the totalized order),
    * previous-purchase gap (lag over the purchase subset), broadcast
    * nation enrichment. Window sums CAST (DuckDB sum→HUGEINT). */
  val featureMatrixSql: String =
    s"""WITH e AS (
       |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS t_s, event_type FROM events
       |), n AS (SELECT count(*) AS n FROM customer),
       |w1 AS (
       |  SELECT *,
       |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER
       |      (PARTITION BY user_id ORDER BY t_s
       |       RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS tv,
       |    lag(t_s) OVER (PARTITION BY user_id ORDER BY t_s, event_id) AS prev_t
       |  FROM e
       |), w2 AS (
       |  SELECT *,
       |    sum(CASE WHEN prev_t IS NULL OR t_s - prev_t > ${graft.ops.Features.SessionGapS}
       |             THEN 1 ELSE 0 END) OVER
       |      (PARTITION BY user_id ORDER BY t_s, event_id) AS ss
       |  FROM w1
       |), p AS (
       |  SELECT *,
       |    t_s - lag(t_s) OVER (PARTITION BY user_id ORDER BY t_s, event_id)
       |      AS prev_purchase_gap_s
       |  FROM w2 WHERE event_type = 'purchase'
       |)
       |SELECT p.event_id, p.user_id, CAST(c.c_nationkey AS BIGINT) AS nation,
       |  CAST(tv AS BIGINT) AS trailing_views_1h,
       |  CAST(ss AS BIGINT) AS sess_seq,
       |  prev_purchase_gap_s
       |FROM p CROSS JOIN n
       |JOIN customer c ON c.c_custkey - 1 = p.user_id % n.n
       |ORDER BY p.event_id""".stripMargin

  /** ≙ Packing.packBins (contiguous-fill, 512-token bins, per source). */
  val packBinsSql: String =
    s"""WITH $corpusSql, base AS (
       |  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens FROM corpus
       |), cum AS (
       |  SELECT source, n_tokens,
       |    COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
       |  FROM base
       |), binned AS (
       |  SELECT source, CAST(bef AS BIGINT) // 512 AS bin, n_tokens FROM cum
       |)
       |SELECT source, bin, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens_packed,
       |  CAST(sum(n_tokens) AS BIGINT) * 10000 // 512 AS fill_bp
       |FROM binned GROUP BY source, bin
       |ORDER BY source, bin""".stripMargin

  /** ≙ Packing.epochShuffle (3 epochs, 512-token bins): the same packed
    * bins, each epoch's consumption order re-derived from the identical
    * md5("epoch:<e>:<source>:<bin>") rank (bin tiebreak). */
  val epochShuffleSql: String =
    s"""WITH $corpusSql, base AS (
       |  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens FROM corpus
       |), cum AS (
       |  SELECT source, n_tokens,
       |    COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
       |  FROM base
       |), bins AS (
       |  SELECT DISTINCT source, CAST(bef AS BIGINT) // 512 AS bin FROM cum
       |), x AS (
       |  SELECT e.epoch, b.source, b.bin,
       |    md5('epoch:' || e.epoch || ':' || b.source || ':' || b.bin) AS k
       |  FROM bins b, (SELECT unnest(range(3)) AS epoch) e
       |)
       |SELECT epoch, source, bin,
       |  CAST(row_number() OVER (PARTITION BY epoch, source ORDER BY k, bin)
       |    AS BIGINT) AS ord
       |FROM x
       |ORDER BY epoch, source, bin""".stripMargin

  /** ≙ Packing.hashSplit (98/1/1 by content-hash bucket). */
  val hashSplitSql: String =
    s"""WITH $corpusSql, b AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
       |    ('0x' || substr(md5(text), 1, 4))::BIGINT % 100 AS bucket
       |  FROM corpus
       |)
       |SELECT CASE WHEN bucket < 98 THEN 'train'
       |            WHEN bucket < 99 THEN 'val' ELSE 'test' END AS split,
       |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |FROM b GROUP BY 1
       |ORDER BY split""".stripMargin

  /** ≙ the left-anti-join graded query (customers with no urgent orders —
    * every fixture customer has SOME order, so the unfiltered anti join
    * would be vacuously empty). */
  val antiJoinSql: String =
    """SELECT c_nationkey, count(*) AS n_custs_no_urgent
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** ≙ the EXCEPT/INTERSECT graded query (user segments by event type). */
  val setOpsSql: String =
    """WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
      |p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |SELECT 'both' AS segment, count(*) AS n_users FROM (SELECT * FROM v INTERSECT SELECT * FROM p)
      |UNION ALL
      |SELECT 'purchase_only', count(*) FROM (SELECT * FROM p EXCEPT SELECT * FROM v)
      |UNION ALL
      |SELECT 'view_only', count(*) FROM (SELECT * FROM v EXCEPT SELECT * FROM p)
      |ORDER BY segment""".stripMargin

  /** E4 ≙ MultiModal.metadata (payload bytes derived from text). */
  val multiModalSql: String =
    s"""WITH $corpusSql
       |SELECT doc_id,
       |  octet_length(encode(text)) AS n_bytes,
       |  lower(hex(encode(substr(text, 1, 8)))) AS head_hex,
       |  CASE WHEN lower(hex(encode(substr(text, 1, 4)))) LIKE 'ffd8ff%' THEN 'jpeg'
       |       WHEN lower(hex(encode(substr(text, 1, 4)))) = '89504e47' THEN 'png'
       |       WHEN lower(hex(encode(substr(text, 1, 4)))) = '52494646' THEN 'riff'
       |       ELSE 'raw' END AS fmt
       |FROM corpus
       |ORDER BY doc_id""".stripMargin

  /** ≙ Packing.tokenBudget (5000 tokens per source, contiguous fill in
    * md5-hash order). */
  val tokenBudgetSql: String =
    s"""WITH $corpusSql, b AS (
       |  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens,
       |    md5(text) AS h
       |  FROM corpus
       |), r AS (
       |  SELECT source, doc_id, n_tokens,
       |    coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_tokens
       |  FROM b
       |)
       |SELECT source, count(*) AS n_kept,
       |  CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
       |  CAST(sum(doc_id) AS BIGINT) AS sum_kept_ids
       |FROM r WHERE before_tokens < 5000
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** E3j ≙ TextOps.tokenRarity (distinct tokens per doc, document
    * frequency join, integer mean/min/hapax stats). */
  val tokenRaritySql: String =
    s"""WITH $corpusSql, tok AS (
       |  SELECT DISTINCT doc_id AS id, unnest(string_split(text, ' ')) AS t FROM corpus
       |), dft AS (
       |  SELECT t, count(*) AS df FROM tok GROUP BY t
       |), j AS (
       |  SELECT tok.id, dft.df FROM tok JOIN dft ON dft.t = tok.t
       |)
       |SELECT id AS doc_id, count(*) AS n_distinct_tokens,
       |  CAST(CAST(sum(df) AS BIGINT) * 100 // count(*) AS BIGINT) AS mean_df_x100,
       |  CAST(min(df) AS BIGINT) AS min_df,
       |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
       |FROM j GROUP BY id
       |ORDER BY doc_id""".stripMargin

  /** ≙ TextOps.lmFluency: the corpus-self-trained bigram LM — unigram and
    * bigram INSTANCE counts over the raw token stream, per-doc mean of
    * `c2 * 10^4 // c1(first word)` over its bigram instances. Both `//`
    * divisions truncate identically on both engines; the inner sum is
    * CAST to BIGINT before the mean (HUGEINT rule). */
  /** Shared bigram-LM fragment (≙ TextOps.lmFluency): corpus-self-trained
    * unigram/bigram counts, per-doc mean conditional probability in basis
    * points — ends with a `flu(id, n_bigrams, fluency_bp)` relation
    * consumed by both the fluency report and the perplexity buckets. */
  private val fluencyCtes: String =
    s"""tk AS (
       |  SELECT doc_id AS id, string_split(text, ' ') AS toks FROM corpus
       |), idx AS (
       |  SELECT unnest(range((SELECT max(len(toks)) FROM tk))) AS i
       |), uni AS (
       |  SELECT toks[i+1] AS w, count(*) AS c1
       |  FROM tk, idx WHERE i < len(toks) GROUP BY toks[i+1]
       |), inst AS (
       |  SELECT id, ${ngramConcat("toks", 2)} AS bg, toks[i+1] AS w1
       |  FROM tk, idx WHERE i <= len(toks) - 2
       |), big AS (
       |  SELECT bg, count(*) AS c2 FROM inst GROUP BY bg
       |), flu AS (
       |  SELECT x.id, count(*) AS n_bigrams,
       |    CAST(CAST(sum(b.c2 * 10000 // u.c1) AS BIGINT) // count(*) AS BIGINT) AS fluency_bp
       |  FROM inst x
       |  JOIN big b ON b.bg = x.bg
       |  JOIN uni u ON u.w = x.w1
       |  GROUP BY x.id
       |)""".stripMargin

  val lmFluencySql: String =
    s"""WITH $corpusSql, $fluencyCtes
       |SELECT id AS doc_id, n_bigrams, fluency_bp FROM flu
       |ORDER BY doc_id""".stripMargin

  /** E3r' ≙ TextOps.fluencyBuckets — CCNet perplexity buckets: per-lang
    * ntile(3) terciles over (fluency desc, id asc), md5-salted keep rule
    * at the head/middle/tail percentages, per-bucket audit. */
  val fluencyBucketsSql: String =
    s"""WITH $corpusSql, $fluencyCtes, langd AS (
       |  SELECT f.id AS doc_id, c.lang, f.fluency_bp
       |  FROM flu f JOIN corpus c ON c.doc_id = f.id
       |), terc AS (
       |  SELECT doc_id, lang, fluency_bp,
       |    ntile(3) OVER (PARTITION BY lang ORDER BY fluency_bp DESC, doc_id) AS t
       |  FROM langd
       |), b AS (
       |  SELECT doc_id, lang, fluency_bp,
       |    CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       |    ('0x' || substr(md5('ppl:' || doc_id::VARCHAR), 1, 4))::BIGINT % 100 AS hb
       |  FROM terc
       |), k AS (
       |  SELECT *, CASE WHEN hb < (CASE bucket WHEN 'head' THEN ${TextOps.PplKeepHead}
       |                            WHEN 'middle' THEN ${TextOps.PplKeepMiddle}
       |                            ELSE ${TextOps.PplKeepTail} END)
       |            THEN 1 ELSE 0 END AS keep
       |  FROM b
       |)
       |SELECT lang, bucket,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(keep) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN keep = 1 THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum,
       |  CAST(min(fluency_bp) AS BIGINT) AS min_bp,
       |  CAST(max(fluency_bp) AS BIGINT) AS max_bp
       |FROM k GROUP BY lang, bucket
       |ORDER BY lang, bucket""".stripMargin

  /** Shared DSIR fragment: distinct (doc, token) relation, vocabulary df
    * with the target count riding the same aggregate, per-doc integer
    * score/mean — `dsir` ends as the per-doc scored relation. */
  private val importanceCtes: String =
    s"""$corpusSql, tok AS (
       |  SELECT DISTINCT doc_id AS id, lang, unnest(string_split(text, ' ')) AS t FROM corpus
       |), dft AS (
       |  SELECT t, count(*) AS df,
       |         count(CASE WHEN lang = 'en' THEN 1 END) AS tdf
       |  FROM tok GROUP BY t
       |), jw AS (
       |  SELECT tok.id, dft.tdf * 10000 // dft.df AS w
       |  FROM tok JOIN dft ON dft.t = tok.t
       |), dsir AS (
       |  SELECT id AS doc_id, count(*) AS n_distinct_tokens,
       |    CAST(sum(w) AS BIGINT) AS score_bp,
       |    CAST(CAST(sum(w) AS BIGINT) // count(*) AS BIGINT) AS mean_w_bp
       |  FROM jw GROUP BY id
       |)""".stripMargin

  /** E3m ≙ TextOps.importanceScore — DSIR-style integer importance score:
    * per-token weight = target_df·10000 // corpus_df over the distinct
    * (doc, token) relation; per-doc sum + integer mean. */
  val importanceSql: String =
    s"""WITH $importanceCtes
       |SELECT doc_id, n_distinct_tokens, score_bp, mean_w_bp
       |FROM dsir
       |ORDER BY doc_id""".stripMargin

  /** E3m' ≙ TextOps.importanceSample — importance RESAMPLING: keep iff
    * md5-bucket(id) % 10000 < mean_w_bp; per-lang counts with the kept-id
    * sum pinning the exact keep set. */
  val importanceSampleSql: String =
    s"""WITH $importanceCtes, sel AS (
       |  SELECT s.doc_id, c.lang, s.n_distinct_tokens,
       |    CASE WHEN ('0x' || substr(md5(s.doc_id::VARCHAR), 1, 4))::BIGINT % 10000
       |              < s.mean_w_bp THEN 1 ELSE 0 END AS keep
       |  FROM dsir s JOIN corpus c ON c.doc_id = s.doc_id
       |)
       |SELECT lang, count(*) AS n_docs, CAST(sum(keep) AS BIGINT) AS n_kept,
       |  CAST(coalesce(sum(CASE WHEN keep = 1 THEN doc_id END), 0) AS BIGINT) AS sum_kept_ids,
       |  CAST(coalesce(sum(CASE WHEN keep = 1 THEN n_distinct_tokens END), 0) AS BIGINT)
       |    AS kept_distinct_tokens
       |FROM sel GROUP BY lang
       |ORDER BY lang""".stripMargin

  /** E3n ≙ TextOps.histQuantiles — mergeable fixed-bin histogram sketch:
    * per-(lang, source) partials summed into per-lang sketches, approx
    * p50/p90 read off the merged cumulative counts as bin lower bounds. */
  val histQuantilesSql: String = histQuantilesSqlWhere("TRUE")

  /** ≙ the ext_hist_forget fold: subtracting the subject's additive bin
    * counts equals the scratch sketch over the survivor slice — so the
    * oracle just runs the direct chain with the survivor filter. */
  val histForgetSql: String = histQuantilesSqlWhere("doc_id % 7 <> 3")

  private def histQuantilesSqlWhere(where: String): String = {
    val b = TextOps.HistBin
    s"""WITH $corpusSql, partial AS (
       |  SELECT lang, source, len(string_split(text, ' ')) // $b AS bin, count(*) AS n
       |  FROM corpus WHERE $where GROUP BY lang, source, bin
       |), merged AS (
       |  SELECT lang, bin, CAST(sum(n) AS BIGINT) AS n FROM partial GROUP BY lang, bin
       |), cum AS (
       |  SELECT lang, bin, n,
       |    CAST(sum(n) OVER (PARTITION BY lang ORDER BY bin) AS BIGINT) AS cum,
       |    CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS total
       |  FROM merged
       |)
       |SELECT lang, max(total) AS n_docs, count(*) AS n_bins,
       |  CAST(min(CASE WHEN cum * 2 >= total THEN bin END) * $b AS BIGINT) AS p50_lo,
       |  CAST(min(CASE WHEN cum * 10 >= total * 9 THEN bin END) * $b AS BIGINT) AS p90_lo,
       |  CAST(max(bin) * $b AS BIGINT) AS max_bin_lo
       |FROM cum GROUP BY lang
       |ORDER BY lang""".stripMargin
  }

  /** CDC→corpus bridge oracle ≙ ChangeFeed.docsSpec ∘ ChangelogBuilder ∘
    * Dedup.incrementalNew: the update-after text rows of the documents
    * changelog ARE the corpus delta; collapse per content hash
    * (within-batch burst → one row), anti-join the existing corpus index.
    * The changelog CTE comes from the SAME CdcOracle machinery every cdc_*
    * query grades against. */
  lazy val cdcCorpusDeltaSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    s"""WITH cl AS (
       |${docsCdc.changelogSql}
       |), delta AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, new_value AS text
       |  FROM cl WHERE column_name = 'text' AND new_value IS NOT NULL
       |), inc AS (
       |  SELECT md5(text) AS fp, CAST(min(doc_id) AS BIGINT) AS doc_id,
       |         CAST(count(*) AS BIGINT) AS n_in_batch
       |  FROM delta GROUP BY md5(text)
       |)
       |SELECT fp, doc_id, n_in_batch
       |FROM inc
       |WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE md5(d.text) = inc.fp)
       |ORDER BY doc_id""".stripMargin
  }

  /** CDC→RETRIEVAL-index bridge oracle ≙ the ext_cdc_bm25_delta fold:
    * the documents changelog's update-after text rows are applied to the
    * corpus (delta text replaces the base doc's; planted dup copies keep
    * their pre-delta text — they were copied before the feed ran), and
    * the whole BM25 chain indexes that POST-delta corpus from scratch —
    * which is what replacing the updated docs' postings inside the
    * persisted index must equal, since postings are per-document pure
    * and df/dl/N/avgdl re-derive from the folded postings. */
  lazy val cdcBm25DeltaSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    val extra =
      s"""cl AS (
         |${docsCdc.changelogSql}
         |), cdelta AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, new_value AS text
         |  FROM cl WHERE column_name = 'text' AND new_value IS NOT NULL
         |), corpus2 AS (
         |  SELECT c.doc_id, coalesce(d.text, c.text) AS text
         |  FROM corpus c LEFT JOIN cdelta d ON c.doc_id = d.doc_id
         |), """.stripMargin
    s"""WITH ${bm25Ctes(5, src = "corpus2", extraCtes = extra)}
       |SELECT query_id, rnk, doc_id, score_micro FROM bmr
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** ≙ ext_bm25_serving_probe_race: the TWO answers a search racing a
    * snapshot-isolated fold can correctly observe on the THREE-artifact
    * layout — the family where a torn read is numerically worst (new
    * postings scored against old (n, avgdl) stats / stale df). Phase
    * 'pre' is the whole-corpus BM25 chain (what a pinned search that
    * resolved generation 1 before the flip answers on graced bytes —
    * [[bm25Sql]]'s rows); phase 'post' the chain over the era-1
    * post-delta corpus (a fresh resolve: [[cdcBm25DeltaSql]]'s rows,
    * queries re-derived from the post-delta text). Composed in ONE WITH
    * list via the CTE-suffix convention (sfx = "_p"). */
  lazy val bm25ProbeRaceSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    s"""WITH ${bm25Ctes(5)},
       |cl AS MATERIALIZED (
       |${docsCdc.changelogSql}
       |), cdelta AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, new_value AS text
       |  FROM cl WHERE column_name = 'text' AND new_value IS NOT NULL
       |), corpus2 AS MATERIALIZED (
       |  SELECT c.doc_id, coalesce(d.text, c.text) AS text
       |  FROM corpus c LEFT JOIN cdelta d ON c.doc_id = d.doc_id
       |), ${bm25ChainOver(5, src = "corpus2", sfx = "_p")}
       |SELECT 'pre' AS phase, query_id, rnk, doc_id, score_micro FROM bmr
       |UNION ALL
       |SELECT 'post' AS phase, query_id, rnk, doc_id, score_micro FROM bmr_p
       |ORDER BY phase, query_id, rnk""".stripMargin
  }

  /** CDC→DEDUP-index bridge oracle ≙ the ext_cdc_minhash_serving_fold
    * rows: the changelog's update-after text rows replace the revised
    * docs' text (planted copies keep their pre-delta text — copied before
    * the feed ran) and the whole MinHash → bands → candidate → verify
    * chain runs from scratch over that POST-delta corpus. Signatures are
    * per-document pure, so swapping the delta ids' band/fingerprint rows
    * inside the persisted layout must land exactly here. */
  lazy val cdcMinhashDeltaSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    s"""WITH $corpusSql, cl AS MATERIALIZED (
       |${docsCdc.changelogSql}
       |), cdelta AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, new_value AS text
       |  FROM cl WHERE column_name = 'text' AND new_value IS NOT NULL
       |), corpus2 AS MATERIALIZED (
       |  SELECT c.doc_id, coalesce(d.text, c.text) AS text
       |  FROM corpus c LEFT JOIN cdelta d ON c.doc_id = d.doc_id
       |), ${shingleCtesOver("corpus2")}, ${pairCtesOver("sh")}
       |SELECT id_a, id_b, n_common, n_a, n_b
       |FROM pairs
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** ≙ ext_cdc_minhash_serving_probe: the ingest RESTRICTION of the
    * post-delta chain — the planted batch's pairs against (and within)
    * the delta-folded corpus. Planted copies keep their pre-delta text
    * (copied before the feed ran), so corpus2 is exactly the store the
    * folded layout indexes plus the arriving batch. */
  lazy val cdcMinhashIngestSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    s"""WITH $corpusSql, cl AS MATERIALIZED (
       |${docsCdc.changelogSql}
       |), cdelta AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, new_value AS text
       |  FROM cl WHERE column_name = 'text' AND new_value IS NOT NULL
       |), corpus2 AS MATERIALIZED (
       |  SELECT c.doc_id, coalesce(d.text, c.text) AS text
       |  FROM corpus c LEFT JOIN cdelta d ON c.doc_id = d.doc_id
       |), ${shingleCtesOver("corpus2")}, ${pairCtesOver("sh")}
       |SELECT id_a, id_b, n_common, n_a, n_b
       |FROM pairs
       |WHERE id_a >= ${graft.ext.DocFeed.ExactDupOffset}
       |   OR id_b >= ${graft.ext.DocFeed.ExactDupOffset}
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** ≙ ext_minhash_serving_probe_race: the TWO answers a probe racing a
    * snapshot-isolated fold can correctly observe, each consistent —
    * phase 'pre' is the ingest restriction over the PRE-fold corpus (what
    * a probe that resolved generation 1 before the flip answers on graced
    * bytes: [[minhashIngestSql]]'s rows), phase 'post' the restriction
    * over the post-delta corpus (what a probe resolving after the flip
    * answers: [[cdcMinhashIngestSql]]'s rows). The two chains compose in
    * ONE WITH list via the CTE-suffix convention (sfx = "_p"). */
  lazy val minhashProbeRaceSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    val batchRestrict =
      s"""WHERE id_a >= ${graft.ext.DocFeed.ExactDupOffset}
         |   OR id_b >= ${graft.ext.DocFeed.ExactDupOffset}""".stripMargin
    s"""WITH $corpusSql, ${shingleCtesOver("corpus")}, ${pairCtesOver("sh")},
       |cl AS MATERIALIZED (
       |${docsCdc.changelogSql}
       |), cdelta AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, new_value AS text
       |  FROM cl WHERE column_name = 'text' AND new_value IS NOT NULL
       |), corpus2 AS MATERIALIZED (
       |  SELECT c.doc_id, coalesce(d.text, c.text) AS text
       |  FROM corpus c LEFT JOIN cdelta d ON c.doc_id = d.doc_id
       |), ${shingleCtesOver("corpus2", "_p")}, ${pairCtesOver("sh_p", "_p")}
       |SELECT 'pre' AS phase, id_a, id_b, n_common, n_a, n_b FROM pairs
       |$batchRestrict
       |UNION ALL
       |SELECT 'post' AS phase, id_a, id_b, n_common, n_a, n_b FROM pairs_p
       |$batchRestrict
       |ORDER BY phase, id_a, id_b""".stripMargin
  }

  /** ≙ ext_minhash_compact_grace_read: a reader pinned ACROSS a
    * compaction — the one mutation whose content-identity contract makes
    * both phases answer the SAME pair set (what the row grades: the
    * pinned generation's bytes survive the repack intact, and the fresh
    * resolve reads identical content off the repacked files). MATERIALIZED
    * so the pair chain runs once, not once per phase ("BOTH" is a
    * reserved word — hence `phased`). */
  lazy val minhashCompactGraceSql: String =
    s"""WITH $corpusSql, ${shingleCtesOver("corpus")}, ${pairCtesOver("sh")},
       |phased AS MATERIALIZED (
       |  SELECT id_a, id_b, n_common, n_a, n_b FROM pairs
       |)
       |SELECT 'pre' AS phase, id_a, id_b, n_common, n_a, n_b FROM phased
       |UNION ALL
       |SELECT 'post' AS phase, id_a, id_b, n_common, n_a, n_b FROM phased
       |ORDER BY phase, id_a, id_b""".stripMargin

  /** CDC→ANN-index bridge oracle ≙ the ext_cdc_ann_delta fold: the
    * changelog delta names the revised docs; each one is deterministically
    * RE-EMBEDDED (stub: vector reversal — a pure permutation, bit-exact on
    * both engines, and direction-changing so the fold is result-VISIBLE,
    * unlike a scale factor that cosine would erase). Centroids stay the
    * deployed pre-delta model (train = allv); the final assignment and the
    * exact rerank read the POST-delta vectors — exactly what replacing the
    * delta ids' rows in the persisted cell index at frozen centroids
    * produces, since assignment is per-vector. */
  lazy val cdcAnnDeltaSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    val extra =
      s"""cl2 AS (
         |${docsCdc.changelogSql}
         |), cdelta AS (
         |  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
         |  FROM cl2 WHERE column_name = 'text' AND new_value IS NOT NULL
         |), postv AS (
         |  SELECT e.vec_id,
         |    CASE WHEN d.doc_id IS NULL THEN e.embedding::DOUBLE[]
         |         ELSE list_reverse(e.embedding)::DOUBLE[] END AS v
         |  FROM embeddings e LEFT JOIN cdelta d ON e.vec_id = d.doc_id
         |),""".stripMargin
    annIvfSqlWith("TRUE", "TRUE", extraCtes = extra,
      assignSrc = "postv", vecSrc = "postv")
  }

  /** ≙ the ext_cdc_bm25_lifecycle fold — the FULL index-maintenance
    * lifecycle: the second changelog window (docsLifecycleSpec: deletes,
    * sentinel-only inserts whose content is fetched by key, a further
    * revision) applied on top of the era-1 revisions, and the whole BM25
    * chain run from scratch over that post-lifecycle corpus — deletes
    * shrink N, inserts grow it, df/dl/avgdl/idf re-derive. The delta sets
    * come from the SAME CdcOracle changelog chains the cdc_* rows grade
    * against (nested-WITH era composition), never from m-arithmetic, so
    * planted dup copies are untouched exactly as the fold leaves them. */
  lazy val cdcBm25LifecycleSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    val lcCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsLifecycleSpec, Seq("doc_id"), "documents")
    val off = graft.cdc.ChangeFeed.DocsInsertOffset
    val extra =
      s"""cl1 AS MATERIALIZED (
         |${docsCdc.changelogRowsSql}
         |), cl2 AS MATERIALIZED (
         |${lcCdc.changelogRowsSql}
         |), c1d AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, new_value AS text
         |  FROM cl1 WHERE column_name = 'text' AND new_value IS NOT NULL
         |), e2upd AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, new_value AS text
         |  FROM cl2 WHERE column_name = 'text' AND new_value IS NOT NULL
         |), e2ins AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id
         |  FROM cl2 WHERE column_name IS NULL AND new_value = 'NEW RECORD'
         |), e2del AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id
         |  FROM cl2 WHERE column_name IS NULL AND old_value = 'DELETED RECORD'
         |), corpus3 AS (
         |  SELECT c.doc_id, coalesce(u.text, d1.text, c.text) AS text
         |  FROM corpus c
         |  LEFT JOIN c1d d1 ON c.doc_id = d1.doc_id
         |  LEFT JOIN e2upd u ON c.doc_id = u.doc_id
         |  WHERE NOT EXISTS (SELECT 1 FROM e2del x WHERE x.doc_id = c.doc_id)
         |  UNION ALL
         |  SELECT i.doc_id, d.text || ' fresh' AS text
         |  FROM e2ins i JOIN documents d ON d.doc_id = i.doc_id - $off
         |), """.stripMargin
    s"""WITH ${bm25Ctes(5, src = "corpus3", extraCtes = extra)}
       |SELECT query_id, rnk, doc_id, score_micro FROM bmr
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** ≙ the ext_cdc_minhash_serving_lifecycle folds — the FULL
    * index-maintenance lifecycle on the dedup index: era-1 revisions,
    * then the second window's deletes (rows out), sentinel-only inserts
    * (content fetched by key, suffixed ' fresh'), and the further
    * revision — and the whole banding chain run from scratch over that
    * post-lifecycle corpus. Same corpus3 composition as the BM25/ANN
    * lifecycle oracles, so the three families' graded corpora can never
    * diverge. */
  lazy val cdcMinhashLifecycleSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    val lcCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsLifecycleSpec, Seq("doc_id"), "documents")
    val off = graft.cdc.ChangeFeed.DocsInsertOffset
    s"""WITH $corpusSql, cl1 AS MATERIALIZED (
       |${docsCdc.changelogRowsSql}
       |), cl2 AS MATERIALIZED (
       |${lcCdc.changelogRowsSql}
       |), c1d AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, new_value AS text
       |  FROM cl1 WHERE column_name = 'text' AND new_value IS NOT NULL
       |), e2upd AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, new_value AS text
       |  FROM cl2 WHERE column_name = 'text' AND new_value IS NOT NULL
       |), e2ins AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl2 WHERE column_name IS NULL AND new_value = 'NEW RECORD'
       |), e2del AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl2 WHERE column_name IS NULL AND old_value = 'DELETED RECORD'
       |), corpus3 AS MATERIALIZED (
       |  SELECT c.doc_id, coalesce(u.text, d1.text, c.text) AS text
       |  FROM corpus c
       |  LEFT JOIN c1d d1 ON c.doc_id = d1.doc_id
       |  LEFT JOIN e2upd u ON c.doc_id = u.doc_id
       |  WHERE NOT EXISTS (SELECT 1 FROM e2del x WHERE x.doc_id = c.doc_id)
       |  UNION ALL
       |  SELECT i.doc_id, d.text || ' fresh' AS text
       |  FROM e2ins i JOIN documents d ON d.doc_id = i.doc_id - $off
       |), ${shingleCtesOver("corpus3")}, ${pairCtesOver("sh")}
       |SELECT id_a, id_b, n_common, n_a, n_b
       |FROM pairs
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** ≙ ext_index_freshness over ALL SEVEN maintained families: per-index
    * state size (post-era-1 postings / cells / codes / LSH band rows /
    * SimHash artifacts — the cell index holds one row per vector, the
    * code index one row per (vector, subspace) so 4 N, the LSH layout
    * NumBands rows per doc that emits ≥ 1 shingle (≥ ShingleLen tokens),
    * the SimHash layout SimHashBands rows per DISTINCT fingerprint plus
    * one membership row per doc), folded vs feed HWM
    * (changelog epoch seconds) and
    * the pending backlog by op class. The docs-feed indexes share the
    * composed era chains; the SERVING episode store tracks the ORDERS
    * changelog — one episode per o_orderstatus row, folded hwm = the max
    * status commit, backlog = ops after it (empty for a fully-folded
    * store, derived not literal). */
  lazy val indexFreshnessSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    val lcCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsLifecycleSpec, Seq("doc_id"), "documents")
    val extra =
      s"""cl1 AS MATERIALIZED (
         |${docsCdc.changelogRowsSql}
         |), cl2 AS MATERIALIZED (
         |${lcCdc.changelogRowsSql}
         |), c1d AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, new_value AS text
         |  FROM cl1 WHERE column_name = 'text' AND new_value IS NOT NULL
         |), corpus2 AS (
         |  SELECT c.doc_id, coalesce(d.text, c.text) AS text
         |  FROM corpus c LEFT JOIN c1d d ON c.doc_id = d.doc_id
         |), """.stripMargin
    s"""WITH ${bm25Ctes(5, src = "corpus2", extraCtes = extra)},
       |${simhashChainOver("corpus2", sfx = "_f")}, sc AS (
       |  SELECT
       |    (SELECT CAST(max(epoch(commit_time)) AS BIGINT) FROM cl1) AS folded_hwm_s,
       |    (SELECT CAST(max(epoch(commit_time)) AS BIGINT) FROM cl2) AS feed_hwm_s,
       |    (SELECT CAST(count(*) FILTER (WHERE column_name = 'text'
       |        AND new_value IS NOT NULL) AS BIGINT) FROM cl2) AS pending_upserts,
       |    (SELECT CAST(count(*) FILTER (WHERE column_name IS NULL
       |        AND new_value = 'NEW RECORD') AS BIGINT) FROM cl2) AS pending_inserts,
       |    (SELECT CAST(count(*) FILTER (WHERE column_name IS NULL
       |        AND old_value = 'DELETED RECORD') AS BIGINT) FROM cl2) AS pending_deletes
       |), st AS (
       |  SELECT 'bm25' AS index_name,
       |    (SELECT CAST(count(*) AS BIGINT) FROM post) AS state_rows
       |  UNION ALL
       |  SELECT 'ivf', (SELECT CAST(count(*) AS BIGINT) FROM embeddings)
       |  UNION ALL
       |  SELECT 'ivfpq', (SELECT CAST(4 * count(*) AS BIGINT) FROM embeddings)
       |  UNION ALL
       |  SELECT 'minhash', (SELECT CAST(${Dedup.NumBands} * count(*) AS BIGINT)
       |    FROM corpus2 WHERE len(string_split(text, ' ')) >= ${Dedup.ShingleLen})
       |  UNION ALL
       |  SELECT 'simhash', (SELECT CAST(${Dedup.SimHashBands} * count(DISTINCT simhash)
       |      + count(*) AS BIGINT) FROM sims_f)
       |  UNION ALL
       |  SELECT 'embdup', (SELECT CAST(count(*)
       |      + count(*) FILTER (WHERE vec_id % 20 = 0) AS BIGINT)
       |    FROM embeddings)
       |  UNION ALL
       |  SELECT 'embmulti', (SELECT CAST((${Dedup.EmbTables} + 1) * (count(*)
       |      + count(*) FILTER (WHERE vec_id % 20 = 0)
       |      + count(*) FILTER (WHERE vec_id % 10 = 0)) AS BIGINT)
       |    FROM embeddings)
       |), ocl AS MATERIALIZED (
       |${OrdersCdcOracle.changelogSql}
       |), ssc AS (
       |  SELECT
       |    (SELECT CAST(count(*) AS BIGINT) FROM ocl
       |      WHERE column_name = 'o_orderstatus'
       |        AND commit_time <= TIMESTAMP '${OrdersCdcOracle.ResumeMid}')
       |      AS state_rows,
       |    (SELECT CAST(max(epoch(commit_time)) AS BIGINT) FROM ocl
       |      WHERE column_name = 'o_orderstatus'
       |        AND commit_time <= TIMESTAMP '${OrdersCdcOracle.ResumeMid}')
       |      AS folded_hwm_s,
       |    (SELECT CAST(max(epoch(commit_time)) AS BIGINT) FROM ocl) AS feed_hwm_s
       |), spend AS (
       |  SELECT
       |    CAST(count(*) FILTER (WHERE column_name = 'o_orderstatus'
       |      AND epoch(commit_time) > (SELECT folded_hwm_s FROM ssc)) AS BIGINT)
       |      AS pending_upserts,
       |    CAST(count(*) FILTER (WHERE column_name IS NULL
       |      AND new_value = 'NEW RECORD'
       |      AND epoch(commit_time) > (SELECT folded_hwm_s FROM ssc)) AS BIGINT)
       |      AS pending_inserts,
       |    CAST(count(*) FILTER (WHERE column_name IS NULL
       |      AND old_value = 'DELETED RECORD'
       |      AND epoch(commit_time) > (SELECT folded_hwm_s FROM ssc)) AS BIGINT)
       |      AS pending_deletes
       |  FROM ocl
       |)
       |SELECT st.index_name, st.state_rows, sc.folded_hwm_s, sc.feed_hwm_s,
       |  sc.feed_hwm_s - sc.folded_hwm_s AS lag_s,
       |  sc.pending_upserts, sc.pending_inserts, sc.pending_deletes
       |FROM st CROSS JOIN sc
       |UNION ALL
       |SELECT 'serving', ssc.state_rows, ssc.folded_hwm_s, ssc.feed_hwm_s,
       |  ssc.feed_hwm_s - ssc.folded_hwm_s AS lag_s,
       |  spend.pending_upserts, spend.pending_inserts, spend.pending_deletes
       |FROM ssc CROSS JOIN spend
       |ORDER BY index_name""".stripMargin
  }

  /** ≙ the ext_cdc_ann_lifecycle fold: post-lifecycle vector view —
    * second-revision docs re-embedded by the NEGATION stub (distinct from
    * era-1's reversal so the second fold is result-visible), era-1-only
    * revised docs keep their reversal, deleted docs gone, inserted docs'
    * fetched content embedded by the reversal stub — assigned and
    * reranked at the pre-delta-trained centroids (train = allv). */
  /** The post-LIFECYCLE vector view as prependable CTEs — second-revision
    * docs re-embedded by the NEGATION stub (distinct from era-1's
    * reversal so the second fold is result-visible), era-1-only revised
    * docs keep their reversal, deleted docs gone, inserted docs' fetched
    * content embedded by the reversal stub. Shared by the IVF-flat and
    * the IVF-PQ lifecycle compositions. */
  private lazy val lifecyclePostvCtes: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    val lcCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsLifecycleSpec, Seq("doc_id"), "documents")
    val off = graft.cdc.ChangeFeed.DocsInsertOffset
    s"""cl1 AS MATERIALIZED (
       |${docsCdc.changelogRowsSql}
       |), cl2 AS MATERIALIZED (
       |${lcCdc.changelogRowsSql}
       |), e1d AS (
       |  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl1 WHERE column_name = 'text' AND new_value IS NOT NULL
       |), e2upd AS (
       |  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl2 WHERE column_name = 'text' AND new_value IS NOT NULL
       |), e2ins AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl2 WHERE column_name IS NULL AND new_value = 'NEW RECORD'
       |), e2del AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id
       |  FROM cl2 WHERE column_name IS NULL AND old_value = 'DELETED RECORD'
       |), postv AS (
       |  SELECT e.vec_id,
       |    CASE WHEN u.doc_id IS NOT NULL THEN list_transform(e.embedding, x -> -x)::DOUBLE[]
       |         WHEN d1.doc_id IS NOT NULL THEN list_reverse(e.embedding)::DOUBLE[]
       |         ELSE e.embedding::DOUBLE[] END AS v
       |  FROM embeddings e
       |  LEFT JOIN e2upd u ON e.vec_id = u.doc_id
       |  LEFT JOIN e1d d1 ON e.vec_id = d1.doc_id
       |  WHERE NOT EXISTS (SELECT 1 FROM e2del x WHERE x.doc_id = e.vec_id)
       |  UNION ALL
       |  SELECT i.doc_id AS vec_id, list_reverse(e.embedding)::DOUBLE[] AS v
       |  FROM e2ins i JOIN embeddings e ON e.vec_id = i.doc_id - $off
       |),""".stripMargin
  }

  lazy val cdcAnnLifecycleSql: String =
    annIvfSqlWith("TRUE", "TRUE", extraCtes = lifecyclePostvCtes,
      assignSrc = "postv", vecSrc = "postv")

  /** ≙ ext_cdc_ivfpq_serving_lifecycle[_stream]: the same post-lifecycle
    * vector view encoded at the frozen pre-delta compressed model
    * (coarse centroids + residual codebooks trained on `allv`) — exactly
    * what the era-2 fold of the ccell-partitioned code layout produces
    * on top of the post-era-1 codes. */
  lazy val cdcIvfPqLifecycleSql: String =
    annIvfPqSqlWith("TRUE", "TRUE", None,
      extraCtes = lifecyclePostvCtes, encSrc = "postv")

  /** ≙ the CSV round-trip graded query: the ORACLE is the direct read —
    * losslessness means the post-round-trip fingerprints equal these. */
  val csvRoundtripSql: String =
    s"""WITH $corpusSql
       |SELECT doc_id, md5(text) AS fp_text,
       |  md5('{"url": "https://w' || ((doc_id % 1000000) % 7)::VARCHAR ||
       |      '.example.com/d/' || doc_id::VARCHAR || '"}') AS fp_meta,
       |  n_chars
       |FROM corpus
       |ORDER BY doc_id""".stripMargin

  /** ≙ the ORC round-trip graded query: the oracle is the direct read
    * (payload bytes ARE the UTF-8 text, so fp_payload = fp_text; n_bytes
    * and the magic-number sniff mirror [[multiModalSql]]). */
  val orcRoundtripSql: String =
    s"""WITH $corpusSql
       |SELECT doc_id, md5(text) AS fp_text, md5(text) AS fp_payload,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |  CASE WHEN lower(hex(encode(substr(text, 1, 4)))) LIKE 'ffd8ff%' THEN 'jpeg'
       |       WHEN lower(hex(encode(substr(text, 1, 4)))) = '89504e47' THEN 'png'
       |       WHEN lower(hex(encode(substr(text, 1, 4)))) = '52494646' THEN 'riff'
       |       ELSE 'raw' END AS format,
       |  n_chars
       |FROM corpus
       |ORDER BY doc_id""".stripMargin

  /** ≙ DocFeed.withUrlMeta + Curate.domainOf: the corpus with synthetic
    * URL JSON metadata and the regexp-extracted host. */
  private val domainCorpusSql: String =
    s"""$corpusSql, domc AS (
       |  SELECT *, regexp_extract(json_extract_string(
       |      '{"url": "https://w' || ((doc_id % 1000000) % 7)::VARCHAR ||
       |        '.example.com/d/' || doc_id::VARCHAR || '"}', '$$.url'),
       |    '^https?://([^/]+)', 1) AS domain
       |  FROM corpus
       |)""".stripMargin

  /** E3-drift ≙ Curate.domainTokenDrift over the url-meta corpus:
    * chi-square-shaped per-domain token-mix drift, divisions interleaved
    * exactly as the Spark side (bp shares first, then the squared-diff
    * over exp+1). */
  val domainDriftSql: String =
    s"""WITH $domainCorpusSql, dt AS MATERIALIZED (
       |  SELECT domain, w, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT domain, unnest(string_split(text, ' ')) AS w FROM domc) x
       |  GROUP BY domain, w
       |), dtot AS (
       |  SELECT domain, CAST(sum(c) AS BIGINT) AS dn FROM dt GROUP BY domain
       |), vtot AS (
       |  SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM dt GROUP BY w
       |), nn AS (
       |  SELECT CAST(sum(cw) AS BIGINT) AS n FROM vtot
       |), grid AS (
       |  SELECT dtot.domain, dtot.dn, vtot.w, vtot.cw, nn.n,
       |         coalesce(dt.c, 0) AS c
       |  FROM dtot CROSS JOIN vtot CROSS JOIN nn
       |  LEFT JOIN dt ON dt.domain = dtot.domain AND dt.w = vtot.w
       |)
       |SELECT domain, max(dn) AS n_tokens,
       |  CAST(sum(((c * 10000 // dn) - (cw * 10000 // n))
       |         * ((c * 10000 // dn) - (cw * 10000 // n))
       |         // ((cw * 10000 // n) + 1)) AS BIGINT) AS drift_score
       |FROM grid
       |GROUP BY domain
       |ORDER BY domain""".stripMargin

  /** E3-url ≙ Curate.urlDedupGroups over DocFeed.withMessyUrlMeta: the
    * messy surface forms rebuilt inline (page identity = doc_id % 1e6, so
    * planted copies share their original's page; form varies by
    * `(doc_id div 1e6 + doc_id) % 4`), canonicalized with the LITERAL
    * regex passes the Spark side runs (host lowercased, `www.` dropped,
    * scheme/query/fragment/trailing-slash stripped), grouped with an
    * ordered id-list fingerprint. */
  val urlCanonSql: String =
    s"""WITH $corpusSql, mu AS (
       |  SELECT doc_id,
       |    CASE (doc_id // 1000000 + doc_id) % 4
       |      WHEN 0 THEN 'https://w' || h || '.example.com/d/' || b
       |      WHEN 1 THEN 'HTTPS://W' || h || '.EXAMPLE.COM/d/' || b || '/'
       |      WHEN 2 THEN 'http://w' || h || '.example.com/d/' || b || '?utm_source=feed'
       |      ELSE 'https://www.w' || h || '.example.com/d/' || b || '#frag'
       |    END AS url
       |  FROM (SELECT doc_id, ((doc_id % 1000000) % 7)::VARCHAR AS h,
       |               (doc_id % 1000000)::VARCHAR AS b FROM corpus)
       |), canon AS (
       |  SELECT doc_id,
       |    regexp_replace(lower(regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1)),
       |        '^www\\.', '')
       |      || regexp_replace(regexp_replace(
       |           regexp_replace(url, '^[a-zA-Z]+://[^/?#]*', ''),
       |           '[?#].*', ''), '/$$', '') AS canon_url
       |  FROM mu
       |)
       |SELECT canon_url, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS min_id,
       |  md5(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)) AS ids_fp
       |FROM canon GROUP BY canon_url
       |ORDER BY canon_url""".stripMargin

  /** ≙ Curate.domainDedupStats: per-host totals, distinct contents, dup
    * overhang. */
  val domainDedupSql: String =
    s"""WITH $domainCorpusSql, g AS (
       |  SELECT domain, md5(text) AS fp, count(*) AS n
       |  FROM domc GROUP BY domain, md5(text)
       |)
       |SELECT domain, CAST(sum(n) AS BIGINT) AS n_docs, count(*) AS n_groups,
       |  CAST(sum(n) - count(*) AS BIGINT) AS n_dup_docs
       |FROM g GROUP BY domain
       |ORDER BY domain""".stripMargin

  /** ≙ the ext_domain_topk composition (qualityScore's stop_bp ranked per
    * URL host, top 3, id tiebreak): the "best docs per source" export a
    * curation run ships to review. */
  val domainTopKSql: String = {
    val stops = TextOps.Stopwords.toMap.apply("en").map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH $domainCorpusSql, q AS (
       |  SELECT doc_id, domain,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    len(list_filter(string_split(text, ' '), t -> list_contains($stops, t))) AS n_stop
       |  FROM domc
       |), scored AS (
       |  SELECT doc_id, domain,
       |    CASE WHEN n_tokens > 0 THEN n_stop * 10000 // n_tokens ELSE 0 END AS stop_bp
       |  FROM q
       |), r AS (
       |  SELECT domain, doc_id, CAST(stop_bp AS BIGINT) AS stop_bp,
       |    row_number() OVER (PARTITION BY domain ORDER BY stop_bp DESC, doc_id) AS rnk
       |  FROM scored
       |)
       |SELECT domain, doc_id, stop_bp, rnk::INTEGER AS rnk
       |FROM r WHERE rnk <= 3
       |ORDER BY domain, rnk""".stripMargin
  }

  /** ≙ Packing.tokenBudget with the URL host as the stratum (budget 3000):
    * the per-domain mixture cap of a web-corpus training mix. */
  val domainBudgetSql: String =
    s"""WITH $domainCorpusSql, b AS (
       |  SELECT domain, doc_id, len(string_split(text, ' ')) AS n_tokens,
       |    md5(text) AS h
       |  FROM domc
       |), r AS (
       |  SELECT domain, doc_id, n_tokens,
       |    coalesce(sum(n_tokens) OVER (PARTITION BY domain ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_tokens
       |  FROM b
       |)
       |SELECT domain, count(*) AS n_kept,
       |  CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
       |  CAST(sum(doc_id) AS BIGINT) AS sum_kept_ids
       |FROM r WHERE before_tokens < 3000
       |GROUP BY domain
       |ORDER BY domain""".stripMargin

  /** ≙ Packing.domainMix (budget = N div 2, alpha = 0.5): per-host
    * temperature quotas — weight = floor(sqrt(n_d)) (exact double floor on
    * both engines), quota = (N // 2) * w // sum(w), kept = quota-first
    * under the (md5(text), doc_id) rank; kept_id_sum pins the exact set. */
  val domainMixSql: String =
    s"""WITH $domainCorpusSql, ranked AS (
       |  SELECT domain, doc_id,
       |    row_number() OVER (PARTITION BY domain ORDER BY md5(text), doc_id) AS r,
       |    count(*) OVER (PARTITION BY domain) AS n
       |  FROM domc
       |), w AS (
       |  SELECT *, CAST(floor(sqrt(n::DOUBLE)) AS BIGINT) AS weight FROM ranked
       |), scal AS (
       |  SELECT CAST(sum(nd) AS BIGINT) AS nn, CAST(sum(wd) AS BIGINT) AS sumw
       |  FROM (SELECT domain, max(n) AS nd, max(weight) AS wd FROM w GROUP BY domain)
       |), q AS (
       |  SELECT w.*, ((nn * 1 // 2) * weight) // sumw AS quota FROM w, scal
       |)
       |SELECT domain, CAST(max(n) AS BIGINT) AS n_docs, max(weight) AS weight,
       |  CAST(max(quota) AS BIGINT) AS quota,
       |  CAST(sum(CASE WHEN r <= quota THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(coalesce(sum(CASE WHEN r <= quota THEN doc_id END), 0) AS BIGINT) AS kept_id_sum
       |FROM q GROUP BY domain
       |ORDER BY domain""".stripMargin

  /** ≙ Curate.decontaminate (eval set = doc_id ≡ 3 mod 97, shared word
    * 3-grams). */
  val decontaminateSql: String =
    s"""WITH $corpusSql, $shingleCtes
       |SELECT t.id AS doc_id, count(*) AS n_shared
       |FROM sh t
       |JOIN (SELECT DISTINCT sh FROM sh WHERE id % 97 = 3) e ON e.sh = t.sh
       |WHERE t.id % 97 <> 3
       |GROUP BY t.id
       |ORDER BY doc_id""".stripMargin

  /** ≙ Curate.bloomDecontaminate: the Bloom-filter probe rebuilt bit-for-bit
    * — four md5 lanes per shingle (the Md5Lanes family), positions mod 2^18,
    * packed into 32-bit words via bit_or, probed with the same shift-and-mask
    * test. Deterministic false positives (all four bits set by OTHER eval
    * shingles) reproduce identically, so the hash grades the filter's exact
    * admit set, not just the true overlaps. */
  val bloomDecontaminateSql: String = {
    val B = graft.ext.Curate.BloomBits
    val W = graft.ext.Curate.BloomWordBits
    val K = graft.ext.Curate.BloomLanes
    def lane(sh: String) =
      s"('0x' || substr(md5((h // 4)::VARCHAR || ':' || $sh), (h % 4) * 8 + 1, 8))::BIGINT % $B"
    s"""WITH $corpusSql, $shingleCtes, evpos AS (
       |  SELECT DISTINCT ${lane("e.sh")} AS p
       |  FROM (SELECT DISTINCT sh FROM sh WHERE id % 97 = 3) e, range($K) hh(h)
       |), bloom AS (
       |  SELECT p // $W AS bucket, bit_or((1::BIGINT) << CAST(p % $W AS INT)) AS words
       |  FROM evpos GROUP BY p // $W
       |), probe AS (
       |  SELECT t.id, t.sh, ${lane("t.sh")} AS p
       |  FROM sh t, range($K) hh(h) WHERE t.id % 97 <> 3
       |), maybe AS (
       |  SELECT p.id, p.sh
       |  FROM probe p JOIN bloom b ON b.bucket = p.p // $W
       |  WHERE (b.words & ((1::BIGINT) << CAST(p.p % $W AS INT))) <> 0
       |  GROUP BY p.id, p.sh
       |  HAVING count(*) = $K
       |), sizes AS (
       |  SELECT id, count(*) AS n_sh FROM sh WHERE id % 97 <> 3 GROUP BY id
       |)
       |SELECT m.id AS doc_id, s.n_sh AS n_shingles,
       |  CAST(count(*) AS BIGINT) AS n_maybe
       |FROM (SELECT id, sh FROM maybe) m
       |JOIN sizes s ON s.id = m.id
       |GROUP BY m.id, s.n_sh
       |ORDER BY doc_id""".stripMargin
  }

  /** ≙ Curate.contaminationScores (eval = doc_id ≡ 3 mod 97): per-EVAL-doc
    * share of its distinct shingles already present in ANY train doc, in
    * exact integer basis points. The train side is pre-reduced to a
    * DISTINCT shingle index so the left join fans out at most 1:1. */
  val contaminationSql: String =
    s"""WITH $corpusSql, $shingleCtes, tr AS (
       |  SELECT DISTINCT sh FROM sh WHERE id % 97 <> 3
       |)
       |SELECT e.id AS doc_id, count(*) AS n_shingles, count(tr.sh) AS n_contaminated,
       |  CAST(count(tr.sh) * 10000 // count(*) AS BIGINT) AS contamination_bp
       |FROM sh e LEFT JOIN tr ON tr.sh = e.sh
       |WHERE e.id % 97 = 3
       |GROUP BY e.id
       |ORDER BY doc_id""".stripMargin

  /** ≙ Curate.boilerplate (shingles in ≥ 5‰ of docs). */
  val boilerplateSql: String =
    s"""WITH $corpusSql, $shingleCtes, df AS (
       |  SELECT sh, count(*) AS n_docs FROM sh GROUP BY sh
       |)
       |SELECT sh, n_docs
       |FROM df
       |WHERE n_docs * 1000 >= (SELECT count(*) FROM corpus) * 5
       |ORDER BY n_docs DESC, sh""".stripMargin

  /** ≙ ext.BpeTrain.merges — BPE tokenizer training, mirrored round by
    * round: the same delimited-string symbol encoding (`|l||o||w|`), the
    * same weighted pair counts over the word vocabulary, the same
    * (count desc, s1, s2) winner, the same `replace()` merge application
    * (both engines scan left-to-right non-overlapping — BPE's greedy
    * order). Rounds are UNROLLED as a CTE chain generated from
    * [[graft.ext.BpeTrain.DefaultRounds]], so bound and construction
    * derive from one constant. */
  /** The unrolled BPE training chain (w1 → top1 → w2 → … → topR), shared
    * by the merge-table and encode oracles. */
  private def bpeChainCtes(rounds: Int): String = {
    val base =
      s"""w1 AS MATERIALIZED (
         |  SELECT regexp_replace(w, '(.)', '|\\1|', 'g') AS s,
         |         CAST(count(*) AS BIGINT) AS wc
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM corpus) t
         |  WHERE regexp_matches(w, '${graft.ext.BpeTrain.WordPattern}')
         |  GROUP BY 1
         |)""".stripMargin
    val perRound = (1 to rounds).map { r =>
      val apply =
        if (r == rounds) ""
        else s""", w${r + 1} AS MATERIALIZED (
                |  SELECT replace(w$r.s, '|' || top$r.s1 || '||' || top$r.s2 || '|',
                |                 '|' || top$r.s1 || top$r.s2 || '|') AS s, wc
                |  FROM w$r, top$r
                |)""".stripMargin
      s""", syms$r AS MATERIALIZED (
         |  SELECT wc, string_split(trim(s, '|'), '||') AS a FROM w$r
         |), idx$r AS (
         |  SELECT unnest(range((SELECT max(len(a)) FROM syms$r))) AS i
         |), pc$r AS MATERIALIZED (
         |  SELECT a[i+1] AS s1, a[i+2] AS s2, CAST(sum(wc) AS BIGINT) AS cnt
         |  FROM syms$r, idx$r WHERE i <= len(a) - 2
         |  GROUP BY a[i+1], a[i+2]
         |), top$r AS MATERIALIZED (
         |  SELECT s1, s2, cnt FROM pc$r ORDER BY cnt DESC, s1, s2 LIMIT 1
         |)$apply""".stripMargin
    }.mkString("\n")
    base + "\n" + perRound
  }

  val bpeMergesSql: String = {
    val rounds = graft.ext.BpeTrain.DefaultRounds
    val sel = (1 to rounds)
      .map(r => s"SELECT $r AS merge_round, s1, s2, cnt AS pair_count FROM top$r")
      .mkString("\nUNION ALL\n")
    s"""WITH $corpusSql, ${bpeChainCtes(rounds)}
       |$sel
       |ORDER BY merge_round""".stripMargin
  }

  /** ≙ ext.BpeTrain.encode — tokenize with the trained merges: each
    * distinct word replays the merge list in round order via a
    * `list_reduce` fold (the word's symbolized form rides as the list
    * head — DuckDB's reduce takes no initial accumulator), OOV words
    * pass through whole, then docs rebuild their subword stream in
    * position order. Must match the Spark side's `aggregate` HOF fold
    * exactly — same replace(), same greedy order. */
  val bpeEncodeSql: String = {
    val rounds = graft.ext.BpeTrain.DefaultRounds
    val mergeList = (1 to rounds)
      .map(r => s"(SELECT s1 || chr(1) || s2 FROM top$r)").mkString(", ")
    s"""WITH $corpusSql, ${bpeChainCtes(rounds)}, mg AS (
       |  SELECT list_value($mergeList) AS ms
       |), tkw AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM corpus
       |), idxw AS (
       |  SELECT unnest(range((SELECT max(len(toks)) FROM tkw))) AS i
       |), words AS (
       |  SELECT doc_id, i AS pos, toks[i+1] AS w FROM tkw, idxw WHERE i < len(toks)
       |), vocab AS MATERIALIZED (
       |  SELECT DISTINCT w FROM words
       |), encv AS MATERIALIZED (
       |  SELECT w,
       |    CASE WHEN regexp_matches(w, '${graft.ext.BpeTrain.WordPattern}')
       |      THEN trim(list_reduce(
       |             list_prepend(regexp_replace(w, '(.)', '|\\1|', 'g'), ms),
       |             (acc, x) -> replace(acc,
       |               '|' || split_part(x, chr(1), 1) || '||' || split_part(x, chr(1), 2) || '|',
       |               '|' || split_part(x, chr(1), 1) || split_part(x, chr(1), 2) || '|')), '|')
       |      ELSE NULL END AS encd
       |  FROM vocab, mg
       |), encx AS (
       |  SELECT w,
       |    CASE WHEN encd IS NULL THEN w
       |         ELSE array_to_string(string_split(encd, '||'), ' ') END AS sub_str,
       |    CASE WHEN encd IS NULL THEN 1
       |         ELSE len(string_split(encd, '||')) END AS n_sub
       |  FROM encv
       |)
       |SELECT d.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(e.n_sub) AS BIGINT) AS n_subwords,
       |  md5(string_agg(e.sub_str, ' ' ORDER BY d.pos)) AS fp_subwords
       |FROM words d JOIN encx e ON e.w = d.w
       |GROUP BY d.doc_id
       |ORDER BY doc_id""".stripMargin
  }

  /** ≙ BpeTrain.vocabCoverage — the per-LANGUAGE tokenizer acceptance
    * report: word/OOV/subword counts and the two basis-point ratios
    * (OOV share, subword fan-out). Same merge chain + per-distinct-word
    * replay as [[bpeEncodeSql]], aggregated per language instead of per
    * doc. */
  val bpeCoverageSql: String = {
    val rounds = graft.ext.BpeTrain.DefaultRounds
    val mergeList = (1 to rounds)
      .map(r => s"(SELECT s1 || chr(1) || s2 FROM top$r)").mkString(", ")
    s"""WITH $corpusSql, ${bpeChainCtes(rounds)}, mg AS (
       |  SELECT list_value($mergeList) AS ms
       |), tkw AS (
       |  SELECT lang, string_split(text, ' ') AS toks FROM corpus
       |), idxw AS (
       |  SELECT unnest(range((SELECT max(len(toks)) FROM tkw))) AS i
       |), words AS (
       |  SELECT lang, toks[i+1] AS w FROM tkw, idxw WHERE i < len(toks)
       |), vocab AS MATERIALIZED (
       |  SELECT DISTINCT w FROM words
       |), encv AS MATERIALIZED (
       |  SELECT w,
       |    CASE WHEN regexp_matches(w, '${graft.ext.BpeTrain.WordPattern}')
       |      THEN trim(list_reduce(
       |             list_prepend(regexp_replace(w, '(.)', '|\\1|', 'g'), ms),
       |             (acc, x) -> replace(acc,
       |               '|' || split_part(x, chr(1), 1) || '||' || split_part(x, chr(1), 2) || '|',
       |               '|' || split_part(x, chr(1), 1) || split_part(x, chr(1), 2) || '|')), '|')
       |      ELSE NULL END AS encd
       |  FROM vocab, mg
       |), encx AS (
       |  SELECT w,
       |    CASE WHEN encd IS NULL THEN 1 ELSE 0 END AS is_oov,
       |    CASE WHEN encd IS NULL THEN 1
       |         ELSE len(string_split(encd, '||')) END AS n_sub
       |  FROM encv
       |)
       |SELECT d.lang,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(e.is_oov) AS BIGINT) AS n_oov,
       |  CAST(sum(e.n_sub) AS BIGINT) AS n_subwords,
       |  CAST(CAST(sum(e.is_oov) AS BIGINT) * 10000 // count(*) AS BIGINT) AS oov_bp,
       |  CAST(CAST(sum(e.n_sub) AS BIGINT) * 10000 // count(*) AS BIGINT) AS fanout_bp
       |FROM words d JOIN encx e ON e.w = d.w
       |GROUP BY d.lang
       |ORDER BY lang""".stripMargin
  }

  /** ≙ BpeTrain.decodeRoundTrip — the tokenizer LOSSLESSNESS identity:
    * decode(encode(text)) == text for every document, so BOTH fingerprint
    * columns are just md5(text). The Spark side earns this the hard way
    * (merge application, subword re-concatenation, position-ordered
    * reassembly); any asymmetry anywhere in that chain hash-mismatches. */
  val bpeRoundtripSql: String =
    s"""WITH $corpusSql
       |SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |  md5(text) AS decoded_fp,
       |  md5(text) AS src_fp
       |FROM corpus
       |ORDER BY doc_id""".stripMargin

  /** E4-frames ≙ MultiModal.frameSample(32, 100) over the raw documents
    * bytes: frame i covers [i·100, i·100+32), i = 0..⌊(n−1)/100⌋; the
    * order-exact hex fingerprint pins stride AND offsets. ASCII fixture →
    * VARCHAR substr slices the same bytes Spark's binary substring does
    * (asserted by length(text) = octet_length at generation). */
  val multiModalFramesSql: String =
    """WITH idx AS (
      |  SELECT unnest(range((SELECT (max(length(text)) - 1) // 100 + 1 FROM documents))) AS i
      |), f AS (
      |  SELECT d.doc_id, idx.i,
      |    lower(hex(substr(d.text, CAST(idx.i * 100 + 1 AS BIGINT), 32)::BLOB)) AS hx
      |  FROM documents d, idx
      |  WHERE idx.i <= greatest((length(d.text) - 1) // 100, 0)
      |)
      |SELECT doc_id,
      |  CAST(count(*) AS BIGINT) AS n_frames,
      |  md5(string_agg(hx, '|' ORDER BY i)) AS frames_fp
      |FROM f GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** E4' ≙ MultiModal.decodeFeatures (stub decoder): 16 feature bytes from
    * md5(payload), graded as exact integers + the vector fingerprint. */
  val multiModalDecodeSql: String =
    s"""WITH $corpusSql, f AS (
       |  SELECT doc_id,
       |    list_transform(range(1, 17),
       |      i -> ('0x' || substr(md5(text), (i - 1) * 2 + 1, 2))::BIGINT) AS fv
       |  FROM corpus
       |)
       |SELECT doc_id,
       |  CAST(list_aggregate(fv, 'sum') AS BIGINT) AS f_sum,
       |  fv[1] AS f_first,
       |  md5(array_to_string(fv, ',')) AS fp_features
       |FROM f
       |ORDER BY doc_id""".stripMargin

  /** E4'' ≙ MultiModal.plantedDims — rebuilds the SAME planted PNG/JPEG
    * payloads as hex (independent construction from the planting spec)
    * and then PARSES them with the same container arithmetic in hex
    * space: byte b (1-based) lives at hex position 2b−1, big-endian
    * fields are `('0x'||substr)::BIGINT`, and the JPEG marker-segment
    * walk is a bounded recursive CTE (steps < 5 mirrors the Spark fold's
    * maxSegs). A Spark-side offset bug cannot match because the oracle's
    * offsets come from the container specs, not from the Spark code. */
  val multiModalDimsSql: String = {
    val sofIn = "('ffc0','ffc1','ffc2')"
    s"""WITH RECURSIVE $corpusSql, g AS (
       |  SELECT doc_id, text,
       |    (doc_id * 7) % 2000 + 16 AS w, (doc_id * 13) % 1500 + 16 AS h,
       |    (doc_id % 5) + 2 AS cl, doc_id % 3 AS nc
       |  FROM corpus
       |), ph AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 2 = 0 THEN
       |      '${graft.ext.MultiModal.PngMagicHex}' || '0000000d49484452' ||
       |      lpad(lower(to_hex(w)), 8, '0') || lpad(lower(to_hex(h)), 8, '0') ||
       |      '0802000000' || md5(text)
       |    ELSE
       |      'ffd8' || 'ffe000104a46494600010100000100010000' ||
       |      repeat('fffe' || lpad(lower(to_hex(cl + 2)), 4, '0') ||
       |             substr(md5(text), 1, 2 * cl), nc) ||
       |      'ffc00011' || '08' || lpad(lower(to_hex(h)), 4, '0') ||
       |      lpad(lower(to_hex(w)), 4, '0') || '03011100021101031101' ||
       |      md5(text) || 'ffd9'
       |    END AS p
       |  FROM g
       |), png AS (
       |  SELECT doc_id,
       |    ('0x' || substr(p, 33, 8))::BIGINT AS width,
       |    ('0x' || substr(p, 41, 8))::BIGINT AS height
       |  FROM ph
       |  WHERE substr(p, 1, 16) = '${graft.ext.MultiModal.PngMagicHex}'
       |    AND substr(p, 25, 8) = '49484452'
       |), walk(doc_id, off, steps) AS (
       |  SELECT doc_id, 3, 0 FROM ph WHERE substr(p, 1, 4) = 'ffd8'
       |  UNION ALL
       |  SELECT w.doc_id,
       |    w.off + 2 + ('0x' || substr(p.p, 2 * (w.off + 2) - 1, 4))::BIGINT,
       |    w.steps + 1
       |  FROM walk w JOIN ph p ON p.doc_id = w.doc_id
       |  WHERE substr(p.p, 2 * w.off - 1, 4) NOT IN $sofIn AND w.steps < 5
       |), sof AS (
       |  SELECT w.doc_id,
       |    ('0x' || substr(p.p, 2 * (w.off + 7) - 1, 4))::BIGINT AS width,
       |    ('0x' || substr(p.p, 2 * (w.off + 5) - 1, 4))::BIGINT AS height
       |  FROM walk w JOIN ph p ON p.doc_id = w.doc_id
       |  WHERE substr(p.p, 2 * w.off - 1, 4) IN $sofIn
       |)
       |SELECT ph.doc_id,
       |  CASE WHEN substr(p, 1, 6) = 'ffd8ff' THEN 'jpeg'
       |       WHEN substr(p, 1, 8) = '89504e47' THEN 'png'
       |       ELSE 'raw' END AS fmt,
       |  coalesce(png.width, sof.width) AS width,
       |  coalesce(png.height, sof.height) AS height
       |FROM ph
       |LEFT JOIN png ON png.doc_id = ph.doc_id
       |LEFT JOIN sof ON sof.doc_id = ph.doc_id
       |ORDER BY ph.doc_id""".stripMargin
  }

  /** ≙ MultiModal.plantedResizedDims: the EXPECTED geometry straight from
    * the planting spec — the Spark side must parse its own rewritten
    * bytes back to exactly these values (even ids halved, floor, min 1;
    * odd ids untouched), so a surgery offset bug cannot match. */
  val multiModalResizeSql: String =
    s"""WITH $corpusSql, g AS (
       |  SELECT doc_id,
       |    (doc_id * 7) % 2000 + 16 AS w, (doc_id * 13) % 1500 + 16 AS h
       |  FROM corpus
       |)
       |SELECT doc_id,
       |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
       |  CAST(CASE WHEN doc_id % 2 = 0 THEN greatest(w // 2, 1) ELSE w END AS BIGINT) AS width,
       |  CAST(CASE WHEN doc_id % 2 = 0 THEN greatest(h // 2, 1) ELSE h END AS BIGINT) AS height
       |FROM g
       |ORDER BY doc_id""".stripMargin

  /** E4''' ≙ MultiModal.plantedWavMeta — rebuilds the SAME planted
    * RIFF/WAVE payloads as hex (independent construction from the
    * planting spec) and parses them with the same container arithmetic:
    * LITTLE-endian fields assembled by reversing byte pairs in hex space,
    * the chunk walk as a bounded recursive CTE emitting every chunk
    * offset, fmt/data chunks selected from the walk set. Raw plants
    * (doc_id % 11 = 0) must come back as fmt='raw' with NULL metadata. */
  val multiModalWavSql: String = {
    def leHexSql(expr: String, bytes: Int): String = {
      val be = s"lpad(lower(to_hex($expr)), ${2 * bytes}, '0')"
      (bytes to 1 by -1).map(i => s"substr($be, ${2 * i - 1}, 2)").mkString(" || ")
    }
    def leFieldSql(off: String, n: Int): String =
      "('0x' || " +
        ((n - 1) to 0 by -1).map(i => s"substr(p, 2 * (($off) + $i) - 1, 2)").mkString(" || ") +
        ")::BIGINT"
    s"""WITH RECURSIVE $corpusSql, g AS (
       |  SELECT doc_id, text,
       |    doc_id % 2 + 1 AS ch, (doc_id % 4 + 1) * 11025 AS rate,
       |    (doc_id % 2 + 1) * 2 AS ba, doc_id % 5 + 2 AS lcl, doc_id % 3 AS nl
       |  FROM corpus
       |), g2 AS (
       |  SELECT *, rate * ba AS brate, (doc_id % 9 + 1) * 500 * ba AS dsize,
       |    4 + nl * (lcl + lcl % 2 + 8) + 24 + ((doc_id % 9 + 1) * 500 * ba + 8) AS rs
       |  FROM g
       |), ph AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 11 = 0 THEN md5(text) ELSE
       |      '${graft.ext.MultiModal.RiffMagicHex}' || ${leHexSql("rs", 4)} ||
       |      '${graft.ext.MultiModal.WaveMagicHex}' ||
       |      repeat('4c495354' || ${leHexSql("lcl", 4)} || substr(md5(text), 1, 2 * lcl)
       |             || repeat('00', lcl % 2), nl) ||
       |      '${graft.ext.MultiModal.FmtChunkHex}' || '10000000' || '0100' ||
       |      ${leHexSql("ch", 2)} || ${leHexSql("rate", 4)} || ${leHexSql("brate", 4)} ||
       |      ${leHexSql("ba", 2)} || '1000' ||
       |      '${graft.ext.MultiModal.DataChunkHex}' || ${leHexSql("dsize", 4)} || md5(text)
       |    END AS p
       |  FROM g2
       |), walk(doc_id, off, steps) AS (
       |  SELECT doc_id, 13, 0 FROM ph
       |  WHERE substr(p, 1, 8) = '${graft.ext.MultiModal.RiffMagicHex}'
       |    AND substr(p, 17, 8) = '${graft.ext.MultiModal.WaveMagicHex}'
       |  UNION ALL
       |  SELECT w.doc_id,
       |    w.off + 8 + ${leFieldSql("w.off + 4", 4)} + (${leFieldSql("w.off + 4", 4)} % 2),
       |    w.steps + 1
       |  FROM walk w JOIN ph ON ph.doc_id = w.doc_id
       |  WHERE w.steps < 6
       |    AND 2 * (w.off + 8 + ${leFieldSql("w.off + 4", 4)}
       |             + (${leFieldSql("w.off + 4", 4)} % 2)) + 6 <= len(ph.p)
       |), fmtc AS (
       |  SELECT w.doc_id, w.off FROM walk w JOIN ph ON ph.doc_id = w.doc_id
       |  WHERE substr(p, 2 * w.off - 1, 8) = '${graft.ext.MultiModal.FmtChunkHex}'
       |), datac AS (
       |  SELECT w.doc_id, w.off FROM walk w JOIN ph ON ph.doc_id = w.doc_id
       |  WHERE substr(p, 2 * w.off - 1, 8) = '${graft.ext.MultiModal.DataChunkHex}'
       |)
       |SELECT ph.doc_id,
       |  CASE WHEN substr(p, 1, 6) = 'ffd8ff' THEN 'jpeg'
       |       WHEN substr(p, 1, 8) = '89504e47' THEN 'png'
       |       WHEN substr(p, 1, 8) = '52494646' THEN 'riff'
       |       ELSE 'raw' END AS fmt,
       |  ${leFieldSql("f.off + 10", 2)} AS channels,
       |  ${leFieldSql("f.off + 12", 4)} AS sample_rate,
       |  ${leFieldSql("f.off + 22", 2)} AS bits,
       |  (${leFieldSql("d.off + 4", 4)} * 1000) // ${leFieldSql("f.off + 16", 4)} AS duration_ms
       |FROM ph
       |LEFT JOIN fmtc f ON f.doc_id = ph.doc_id
       |LEFT JOIN datac d ON d.doc_id = ph.doc_id
       |ORDER BY ph.doc_id""".stripMargin
  }

  /** ≙ ops.RangeJoin.pointInRange over sessions: the keyless containment
    * join written as the naive non-equi join (the bucket expansion must be
    * result-invisible). Session CTEs mirror sessionizeSql verbatim. */
  val sessionConcurrencySql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS t_s FROM events
      |), f AS (
      |  SELECT user_id, event_id, t_s,
      |    CASE WHEN t_s - lag(t_s) OVER w <= 1800 THEN 0 ELSE 1 END AS newf
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY t_s, event_id)
      |), s AS (
      |  SELECT user_id, t_s,
      |    CAST(sum(newf) OVER (PARTITION BY user_id ORDER BY t_s, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM f
      |), sess AS (
      |  SELECT user_id, session_seq,
      |    min(t_s) AS session_start_s, max(t_s) AS session_end_s
      |  FROM s GROUP BY user_id, session_seq
      |)
      |SELECT sess.user_id, sess.session_seq, sess.session_start_s, sess.session_end_s,
      |  count(*) AS n_concurrent
      |FROM sess JOIN e ON e.t_s BETWEEN sess.session_start_s AND sess.session_end_s
      |GROUP BY 1, 2, 3, 4
      |ORDER BY 1, 2""".stripMargin

  /** ≙ ops.AsOfJoin.nearest: the asofSql union+window formulation with a
    * second, mirror-image frame (first_value over CURRENT ROW → UNBOUNDED
    * FOLLOWING) resolving the forward candidate; equidistant pairs resolve
    * backward. Per-column (id, t) resolution is safe here because both are
    * non-NULL on every mark row — the two window reads cannot stitch
    * different marks. */
  val asofNearestSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS t_s, event_type FROM events
      |), u AS (
      |  SELECT user_id, t_s, event_id, 1 AS tag, NULL::BIGINT AS pid FROM e
      |  UNION ALL
      |  SELECT user_id, t_s, NULL::BIGINT, 0 AS tag, event_id AS pid
      |  FROM e WHERE event_type = 'purchase'
      |), w AS (
      |  SELECT user_id, t_s, event_id, tag,
      |    last_value(pid IGNORE NULLS) OVER wb AS b_id,
      |    last_value(CASE WHEN tag = 0 THEN t_s END IGNORE NULLS) OVER wb AS b_t,
      |    first_value(pid IGNORE NULLS) OVER wf AS f_id,
      |    first_value(CASE WHEN tag = 0 THEN t_s END IGNORE NULLS) OVER wf AS f_t
      |  FROM u
      |  WINDOW wb AS (PARTITION BY user_id ORDER BY t_s, tag, pid ASC NULLS FIRST
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         wf AS (PARTITION BY user_id ORDER BY t_s, tag, pid ASC NULLS FIRST
      |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |)
      |SELECT event_id, user_id, t_s,
      |  CASE WHEN f_id IS NULL THEN b_id
      |       WHEN b_id IS NULL THEN f_id
      |       WHEN t_s - b_t <= f_t - t_s THEN b_id ELSE f_id END AS ref_event_id,
      |  CASE WHEN f_id IS NULL THEN t_s - b_t
      |       WHEN b_id IS NULL THEN t_s - f_t
      |       WHEN t_s - b_t <= f_t - t_s THEN t_s - b_t ELSE t_s - f_t END AS lag_s
      |FROM w WHERE tag = 1
      |ORDER BY event_id""".stripMargin

  /** ≙ ext.Graph.pageRank over the part↔supplier co-supply graph: 3
    * unrolled synchronous rounds, micro-unit integer ranks, `//`
    * truncating division matching Spark's IntegralDivide. Constants
    * interpolate from the same Graph object the Spark side runs. */
  val pagerankSql: String = {
    val damp = graft.ext.Graph.DefaultDampBp
    val base = (10000L - damp) * 100L
    val rounds = (1 to 3).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS node, CAST(sum(r.pr // d.deg) AS BIGINT) AS cs
         |  FROM ed e JOIN r${i - 1} r ON r.node = e.src JOIN deg d ON d.src = e.src
         |  GROUP BY e.dst
         |), r$i AS (
         |  SELECT n.node,
         |    CAST($base + ($damp * COALESCE(c.cs, 0)) // 10000 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN c$i c ON c.node = n.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH pairs AS (
       |  SELECT DISTINCT 'P' || CAST(l_partkey AS VARCHAR) AS part,
       |                  'S' || CAST(l_suppkey AS VARCHAR) AS supp
       |  FROM lineitem
       |), ed AS (
       |  SELECT part AS src, supp AS dst FROM pairs
       |  UNION ALL
       |  SELECT supp AS src, part AS dst FROM pairs
       |), nodes AS (SELECT DISTINCT src AS node FROM ed),
       |deg AS (SELECT src, count(*) AS deg FROM ed GROUP BY src),
       |r0 AS (SELECT node, CAST(${graft.ext.Graph.InitRankMicro} AS BIGINT) AS pr FROM nodes),
       |$rounds
       |SELECT node, pr FROM r3 ORDER BY node""".stripMargin
  }

  /** ≙ ext.Graph.pageRankWarmStart: the two-phase chain — 3 rounds from
    * uniform over the HISTORY edges (l_orderkey % 10 <> 9), then 2
    * refresh rounds over the FULL graph seeded from those ranks (new
    * nodes enter at init). Fixed-round mirroring on both engines makes
    * the grade exact independent of convergence. */
  val pagerankIncrementalSql: String = {
    val damp = graft.ext.Graph.DefaultDampBp
    val base = (10000L - damp) * 100L
    val init = graft.ext.Graph.InitRankMicro
    def roundCtes(pfx: String, n: Int, ed: String, deg: String,
        nodes: String, r0: String): String =
      (1 to n).map { i =>
        val prev = if (i == 1) r0 else s"${pfx}r${i - 1}"
        s"""${pfx}c$i AS (
           |  SELECT e.dst AS node, CAST(sum(r.pr // d.deg) AS BIGINT) AS cs
           |  FROM $ed e JOIN $prev r ON r.node = e.src JOIN $deg d ON d.src = e.src
           |  GROUP BY e.dst
           |), ${pfx}r$i AS (
           |  SELECT n.node,
           |    CAST($base + ($damp * COALESCE(c.cs, 0)) // 10000 AS BIGINT) AS pr
           |  FROM $nodes n LEFT JOIN ${pfx}c$i c ON c.node = n.node
           |)""".stripMargin
      }.mkString(", ")
    s"""WITH hpairs AS (
       |  SELECT DISTINCT 'P' || CAST(l_partkey AS VARCHAR) AS part,
       |                  'S' || CAST(l_suppkey AS VARCHAR) AS supp
       |  FROM lineitem WHERE l_orderkey % 10 <> 9
       |), hed AS (
       |  SELECT part AS src, supp AS dst FROM hpairs
       |  UNION ALL
       |  SELECT supp AS src, part AS dst FROM hpairs
       |), hnodes AS (SELECT DISTINCT src AS node FROM hed),
       |hdeg AS (SELECT src, count(*) AS deg FROM hed GROUP BY src),
       |hr0 AS (SELECT node, CAST($init AS BIGINT) AS pr FROM hnodes),
       |${roundCtes("h", 3, "hed", "hdeg", "hnodes", "hr0")},
       |pairs AS (
       |  SELECT DISTINCT 'P' || CAST(l_partkey AS VARCHAR) AS part,
       |                  'S' || CAST(l_suppkey AS VARCHAR) AS supp
       |  FROM lineitem
       |), ed AS (
       |  SELECT part AS src, supp AS dst FROM pairs
       |  UNION ALL
       |  SELECT supp AS src, part AS dst FROM pairs
       |), nodes AS (SELECT DISTINCT src AS node FROM ed),
       |deg AS (SELECT src, count(*) AS deg FROM ed GROUP BY src),
       |wr0 AS (
       |  SELECT n.node, CAST(COALESCE(h.pr, $init) AS BIGINT) AS pr
       |  FROM nodes n LEFT JOIN hr3 h ON h.node = n.node
       |),
       |${roundCtes("w", 2, "ed", "deg", "nodes", "wr0")}
       |SELECT node, pr FROM wr2 ORDER BY node""".stripMargin
  }

  /** ≙ ext.Graph.pageRankWarmStart as the FORGET fold: the same
    * history-trained rank state (3 uniform rounds over l_orderkey % 10
    * <> 9 — trained BEFORE the deletion request, so survivor seeds keep
    * its stale influence, exactly like frozen centroids keep a deleted
    * subject's training), then 2 refresh rounds over the SURVIVOR graph —
    * every edge of the forgotten suppliers (l_suppkey % 13 = 5) gone, so
    * their nodes leave the node set and receive no rank at all. */
  val pagerankForgetSql: String = {
    val damp = graft.ext.Graph.DefaultDampBp
    val base = (10000L - damp) * 100L
    val init = graft.ext.Graph.InitRankMicro
    def roundCtes(pfx: String, n: Int, ed: String, deg: String,
        nodes: String, r0: String): String =
      (1 to n).map { i =>
        val prev = if (i == 1) r0 else s"${pfx}r${i - 1}"
        s"""${pfx}c$i AS (
           |  SELECT e.dst AS node, CAST(sum(r.pr // d.deg) AS BIGINT) AS cs
           |  FROM $ed e JOIN $prev r ON r.node = e.src JOIN $deg d ON d.src = e.src
           |  GROUP BY e.dst
           |), ${pfx}r$i AS (
           |  SELECT n.node,
           |    CAST($base + ($damp * COALESCE(c.cs, 0)) // 10000 AS BIGINT) AS pr
           |  FROM $nodes n LEFT JOIN ${pfx}c$i c ON c.node = n.node
           |)""".stripMargin
      }.mkString(", ")
    s"""WITH hpairs AS (
       |  SELECT DISTINCT 'P' || CAST(l_partkey AS VARCHAR) AS part,
       |                  'S' || CAST(l_suppkey AS VARCHAR) AS supp
       |  FROM lineitem WHERE l_orderkey % 10 <> 9
       |), hed AS (
       |  SELECT part AS src, supp AS dst FROM hpairs
       |  UNION ALL
       |  SELECT supp AS src, part AS dst FROM hpairs
       |), hnodes AS (SELECT DISTINCT src AS node FROM hed),
       |hdeg AS (SELECT src, count(*) AS deg FROM hed GROUP BY src),
       |hr0 AS (SELECT node, CAST($init AS BIGINT) AS pr FROM hnodes),
       |${roundCtes("h", 3, "hed", "hdeg", "hnodes", "hr0")},
       |pairs AS (
       |  SELECT DISTINCT 'P' || CAST(l_partkey AS VARCHAR) AS part,
       |                  'S' || CAST(l_suppkey AS VARCHAR) AS supp
       |  FROM lineitem WHERE l_suppkey % 13 <> 5
       |), ed AS (
       |  SELECT part AS src, supp AS dst FROM pairs
       |  UNION ALL
       |  SELECT supp AS src, part AS dst FROM pairs
       |), nodes AS (SELECT DISTINCT src AS node FROM ed),
       |deg AS (SELECT src, count(*) AS deg FROM ed GROUP BY src),
       |wr0 AS (
       |  SELECT n.node, CAST(COALESCE(h.pr, $init) AS BIGINT) AS pr
       |  FROM nodes n LEFT JOIN hr3 h ON h.node = n.node
       |),
       |${roundCtes("w", 2, "ed", "deg", "nodes", "wr0")}
       |SELECT node, pr FROM wr2 ORDER BY node""".stripMargin
  }

  /** ≙ ext.Graph.coOccurrenceEdges ∘ triangleStats over the part
    * co-purchase projection: canonical a<b edges from orders' part sets
    * (groups above [[graft.ext.Graph.CoPurchaseGroupCap]] skipped on BOTH
    * engines — the hot-key guard is ACTIVE at fixture scale and part of
    * the graded contract), exact triangle enumeration x<y<z, clustering
    * coefficient in truncating integer basis points. `pm`/`e` are fan-out
    * CTEs → MATERIALIZED (the r8 re-execution lesson). */
  val trianglesSql: String =
    s"""WITH pm AS MATERIALIZED (
       |  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS g,
       |                  CAST(l_partkey AS BIGINT) AS m
       |  FROM lineitem
       |), ok AS (
       |  SELECT g FROM pm GROUP BY g
       |  HAVING count(*) <= ${graft.ext.Graph.CoPurchaseGroupCap}
       |), e AS MATERIALIZED (
       |  SELECT DISTINCT p1.m AS a, p2.m AS b
       |  FROM pm p1 JOIN pm p2 ON p1.g = p2.g AND p1.m < p2.m
       |  JOIN ok ON ok.g = p1.g
       |), deg AS (
       |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
       |    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
       |  ) GROUP BY node
       |), t AS (
       |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |  FROM e e1
       |  JOIN e e2 ON e2.a = e1.b
       |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
       |), tn AS (
       |  SELECT node, CAST(count(*) AS BIGINT) AS tri FROM (
       |    SELECT x AS node FROM t
       |    UNION ALL SELECT y AS node FROM t
       |    UNION ALL SELECT z AS node FROM t
       |  ) GROUP BY node
       |)
       |SELECT d.node, d.deg,
       |  CAST(COALESCE(tn.tri, 0) AS BIGINT) AS tri,
       |  CAST(CASE WHEN d.deg >= 2
       |    THEN (COALESCE(tn.tri, 0) * 20000) // (d.deg * (d.deg - 1))
       |    ELSE 0 END AS BIGINT) AS cc_bp
       |FROM deg d LEFT JOIN tn ON tn.node = d.node
       |ORDER BY d.node""".stripMargin

  /** ≙ ext.Graph.pageRankWeighted over the co-purchase STRENGTH graph
    * (pair support counts as edge weights, both directions): 3 unrolled
    * rounds, per-edge `pr · w // W_src` truncating contributions. */
  val pagerankWeightedSql: String = {
    val damp = graft.ext.Graph.DefaultDampBp
    val base = (10000L - damp) * 100L
    val rounds = (1 to 3).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS node, CAST(sum((r.pr * e.w) // s.ws) AS BIGINT) AS cs
         |  FROM ed e JOIN r${i - 1} r ON r.node = e.src JOIN wsum s ON s.src = e.src
         |  GROUP BY e.dst
         |), r$i AS (
         |  SELECT n.node,
         |    CAST($base + ($damp * COALESCE(c.cs, 0)) // 10000 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN c$i c ON c.node = n.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH pm AS MATERIALIZED (
       |  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS g,
       |                  CAST(l_partkey AS BIGINT) AS m
       |  FROM lineitem
       |), ok AS (
       |  SELECT g FROM pm GROUP BY g
       |  HAVING count(*) <= ${graft.ext.Graph.CoPurchaseGroupCap}
       |), pr0 AS MATERIALIZED (
       |  SELECT p1.m AS a, p2.m AS b, CAST(count(*) AS BIGINT) AS w
       |  FROM pm p1 JOIN pm p2 ON p1.g = p2.g AND p1.m < p2.m
       |  JOIN ok ON ok.g = p1.g
       |  GROUP BY 1, 2
       |), ed AS MATERIALIZED (
       |  SELECT a AS src, b AS dst, w FROM pr0
       |  UNION ALL
       |  SELECT b AS src, a AS dst, w FROM pr0
       |), wsum AS (
       |  SELECT src, CAST(sum(w) AS BIGINT) AS ws FROM ed GROUP BY src
       |), nodes AS (SELECT DISTINCT src AS node FROM ed),
       |r0 AS (SELECT node, CAST(${graft.ext.Graph.InitRankMicro} AS BIGINT) AS pr FROM nodes),
       |$rounds
       |SELECT node, pr FROM r3 ORDER BY node""".stripMargin
  }

  /** ≙ ext.Graph.kCore over the same co-purchase projection as
    * [[trianglesSql]]: [[graft.ext.Graph.KCoreRounds]] unrolled peel
    * rounds (each round restricts the edge list to the previous round's
    * survivors, recomputes degrees, keeps deg >= k) — EXACTLY the round
    * count the Spark side runs, so the grade is engine-exact even before
    * convergence; fixpoint semantics live in GraphSpec. a<i> CTEs are
    * referenced twice each (both endpoint restrictions) → MATERIALIZED. */
  val kCoreSql: String = {
    val k = graft.ext.Graph.KCoreK
    val rounds = (1 to graft.ext.Graph.KCoreRounds).map { i =>
      s"""e$i AS (
         |  SELECT e.a, e.b FROM e
         |  JOIN a${i - 1} x ON x.node = e.a
         |  JOIN a${i - 1} y ON y.node = e.b
         |), a$i AS MATERIALIZED (
         |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS node FROM e$i UNION ALL SELECT b AS node FROM e$i
         |  ) GROUP BY node HAVING count(*) >= $k
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH pm AS MATERIALIZED (
       |  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS g,
       |                  CAST(l_partkey AS BIGINT) AS m
       |  FROM lineitem
       |), ok AS (
       |  SELECT g FROM pm GROUP BY g
       |  HAVING count(*) <= ${graft.ext.Graph.CoPurchaseGroupCap}
       |), e AS MATERIALIZED (
       |  SELECT DISTINCT p1.m AS a, p2.m AS b
       |  FROM pm p1 JOIN pm p2 ON p1.g = p2.g AND p1.m < p2.m
       |  JOIN ok ON ok.g = p1.g
       |), a0 AS MATERIALIZED (
       |  SELECT DISTINCT node FROM (
       |    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
       |  )
       |), $rounds
       |SELECT node, deg FROM a${graft.ext.Graph.KCoreRounds}
       |ORDER BY node""".stripMargin
  }

  /** ≙ DocFeed.withDups(plantScripts = true): the shared corpus plus the
    * script plants — fully-Cyrillic / fully-CJK docs and a mixed-script
    * suffix copy. Units and offsets interpolate from DocFeed. */
  val scriptCorpusSql: String = corpusSql.stripSuffix(")") +
    s"""  UNION ALL
       |  SELECT doc_id + ${graft.ext.DocFeed.CyrDocOffset},
       |         repeat('${graft.ext.DocFeed.CyrUnit}', CAST(doc_id % 7 AS INT) + 2), lang,
       |         'doc_cyr', (doc_id % 7 + 2) * ${graft.ext.DocFeed.CyrUnit.length}
       |  FROM documents WHERE doc_id % 10 = 4
       |  UNION ALL
       |  SELECT doc_id + ${graft.ext.DocFeed.CjkDocOffset},
       |         repeat('${graft.ext.DocFeed.CjkUnit}', CAST(doc_id % 7 AS INT) + 2), lang,
       |         'doc_cjk', (doc_id % 7 + 2) * ${graft.ext.DocFeed.CjkUnit.length}
       |  FROM documents WHERE doc_id % 10 = 5
       |  UNION ALL
       |  SELECT doc_id + ${graft.ext.DocFeed.MixedDocOffset},
       |         text || '${graft.ext.DocFeed.MixedSuffix}', lang,
       |         'doc_mixed', n_chars + ${graft.ext.DocFeed.MixedSuffix.length}
       |  FROM documents WHERE doc_id % 10 = 6
       |)""".stripMargin

  /** E3s ≙ TextOps.scriptStats: literal-range regex classes shared with
    * the Spark side (no \\p{Script} spelling divergence between Java regex
    * and RE2), dominant-script label with the same deterministic tie order,
    * share in integer basis points. */
  val scriptStatsSql: String =
    s"""WITH $scriptCorpusSql, m AS (
       |  SELECT doc_id,
       |    CAST(len(text) AS BIGINT) AS n_chars_c,
       |    CAST(len(regexp_extract_all(text, '${graft.ext.TextOps.LatinClass}')) AS BIGINT) AS latin_n,
       |    CAST(len(regexp_extract_all(text, '${graft.ext.TextOps.CyrillicClass}')) AS BIGINT) AS cyr_n,
       |    CAST(len(regexp_extract_all(text, '${graft.ext.TextOps.CjkClass}')) AS BIGINT) AS cjk_n
       |  FROM corpus
       |)
       |SELECT doc_id, n_chars_c, latin_n, cyr_n, cjk_n,
       |  CASE WHEN greatest(latin_n, cyr_n, cjk_n) = 0 THEN 'other'
       |       WHEN latin_n = greatest(latin_n, cyr_n, cjk_n) THEN 'latin'
       |       WHEN cyr_n = greatest(latin_n, cyr_n, cjk_n) THEN 'cyrillic'
       |       ELSE 'cjk' END AS script,
       |  CAST(CASE WHEN n_chars_c = 0 THEN 0
       |       ELSE greatest(latin_n, cyr_n, cjk_n) * 10000 // n_chars_c
       |       END AS BIGINT) AS script_bp
       |FROM m
       |ORDER BY doc_id""".stripMargin

  /** ≙ ops.Funnel.sequentialFunnel(view → click → purchase): the same
    * chained running-min windows written out CTE-by-CTE (each step's CASE
    * conditions on the previous step's running column; min of a running
    * min is its final value). */
  val funnelStepsSql: String = {
    val win = "(PARTITION BY user_id ORDER BY t_s, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    s"""WITH e AS (
       |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS t_s, event_type FROM events
       |), r1 AS (
       |  SELECT user_id, event_id, t_s, event_type,
       |    min(CASE WHEN event_type = 'view' THEN t_s END) OVER w AS r_view
       |  FROM e WINDOW w AS $win
       |), r2 AS (
       |  SELECT *, min(CASE WHEN event_type = 'click' AND r_view IS NOT NULL
       |                     THEN t_s END) OVER w AS r_click
       |  FROM r1 WINDOW w AS $win
       |), r3 AS (
       |  SELECT *, min(CASE WHEN event_type = 'purchase' AND r_click IS NOT NULL
       |                     THEN t_s END) OVER w AS r_purchase
       |  FROM r2 WINDOW w AS $win
       |)
       |SELECT user_id,
       |  min(r_view) AS t_view, min(r_click) AS t_click, min(r_purchase) AS t_purchase,
       |  CAST((CASE WHEN min(r_view) IS NOT NULL THEN 1 ELSE 0 END)
       |     + (CASE WHEN min(r_click) IS NOT NULL THEN 1 ELSE 0 END)
       |     + (CASE WHEN min(r_purchase) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage
       |FROM r3 GROUP BY user_id
       |ORDER BY user_id""".stripMargin
  }

  /** ≙ Funnel.sequentialFunnel(withinS = GradedWindowS): the anchored
    * conversion window — steps 2+ only count within W seconds of the
    * user's FIRST view. Same chained running-min shape; the bound rides
    * each CASE. */
  val funnelWindowSql: String = {
    val w0 = graft.ops.Funnel.GradedWindowS
    val win = "(PARTITION BY user_id ORDER BY t_s, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    s"""WITH e AS (
       |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS t_s, event_type FROM events
       |), r1 AS (
       |  SELECT user_id, event_id, t_s, event_type,
       |    min(CASE WHEN event_type = 'view' THEN t_s END) OVER w AS r_view
       |  FROM e WINDOW w AS $win
       |), r2 AS (
       |  SELECT *, min(CASE WHEN event_type = 'click' AND r_view IS NOT NULL
       |                     AND t_s <= r_view + $w0 THEN t_s END) OVER w AS r_click
       |  FROM r1 WINDOW w AS $win
       |), r3 AS (
       |  SELECT *, min(CASE WHEN event_type = 'purchase' AND r_click IS NOT NULL
       |                     AND t_s <= r_view + $w0 THEN t_s END) OVER w AS r_purchase
       |  FROM r2 WINDOW w AS $win
       |)
       |SELECT user_id,
       |  min(r_view) AS t_view, min(r_click) AS t_click, min(r_purchase) AS t_purchase,
       |  CAST((CASE WHEN min(r_view) IS NOT NULL THEN 1 ELSE 0 END)
       |     + (CASE WHEN min(r_click) IS NOT NULL THEN 1 ELSE 0 END)
       |     + (CASE WHEN min(r_purchase) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage
       |FROM r3 GROUP BY user_id
       |ORDER BY user_id""".stripMargin
  }

  /** ≙ the cohort-retention graded query: distinct user-days, per-user min
    * day as the cohort, count per (cohort, offset) cell. */
  val cohortRetentionSql: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id, (epoch_ns(ts) // 1000000000) // 86400 AS d FROM events
      |), c AS (
      |  SELECT user_id, min(d) AS cohort_d FROM d GROUP BY user_id
      |)
      |SELECT c.cohort_d, d.d - c.cohort_d AS day_offset,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM d JOIN c ON d.user_id = c.user_id
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** E3-spell ≙ TextOps.spellMatches over the deterministic typo feed:
    * the oracle is the all-pairs GROUND TRUTH (length-difference ≤ 1
    * prefilter — provably lossless for edit distance 1 — then exact
    * `levenshtein`), so the Spark side's deletion-neighborhood index is
    * graded at recall 1.0, the same contract as the containment join's
    * naive-oracle proof. Typo derivations mirror SparkEntry: delete the
    * 3rd char / substitute the 2nd with 'z' on every distinct ≥5-char
    * token of the BASE documents table. */
  val spellCorrectSql: String =
    """WITH tkw AS (
      |  SELECT string_split(text, ' ') AS toks FROM documents
      |), w0 AS (
      |  SELECT DISTINCT unnest(toks) AS word FROM tkw
      |), vocab AS (
      |  SELECT word FROM w0 WHERE len(word) >= 3
      |), base5 AS (
      |  SELECT word FROM w0 WHERE len(word) >= 5
      |), typos AS (
      |  SELECT DISTINCT q FROM (
      |    SELECT substring(word, 1, 2) || substring(word, 4) AS q FROM base5
      |    UNION ALL
      |    SELECT substring(word, 1, 1) || 'z' || substring(word, 3) AS q FROM base5
      |  ) WHERE len(q) >= 3
      |)
      |SELECT t.q, v.word, CAST(levenshtein(t.q, v.word) AS BIGINT) AS dist
      |FROM typos t JOIN vocab v ON abs(len(t.q) - len(v.word)) <= 1
      |WHERE t.q <> v.word AND levenshtein(t.q, v.word) <= 1
      |ORDER BY q, word""".stripMargin

  /** WITH-body of the PQ chain through the ADC ranking CTE `rk` (plus
    * `allv`, the raw-vector table the re-rank stage reads back) — shared
    * between [[annPqSql]] (reads `rk` at k=3) and [[annPqRerankSql]]
    * (reads a deeper shortlist and re-scores it exactly). */
  private val annPqCteBody: String = {
    val m = 4; val codes = 8; val rounds = 2
    val subDim = graft.ext.Similarity.Dim / m
    def d2(sv: String, cv: String): String =
      s"list_dot_product($sv, $sv) - 2 * list_dot_product($sv, $cv)" +
        s" + list_dot_product($cv, $cv)"
    // one Lloyd round: assign to nearest sub-centroid (ties to smaller
    // cid), then exact-integer-mean re-center per (m, cell)
    def round(t: Int): String =
      s"""a$t AS (
         |  SELECT s.vec_id, s.m, c.cid, ${d2("s.sv", "c.cv")} AS d2
         |  FROM subv s JOIN cb$t c ON c.m = s.m
         |), r$t AS (
         |  SELECT vec_id, m, cid,
         |    row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, cid) AS rn
         |  FROM a$t
         |), cell$t AS (
         |  SELECT vec_id, m, cid AS cell FROM r$t WHERE rn = 1
         |), qx$t AS (
         |  SELECT c0.m, c0.cell, i AS pos, CAST(floor(s.sv[i+1] * 1000.0) AS BIGINT) AS q
         |  FROM cell$t c0 JOIN subv s ON s.vec_id = c0.vec_id AND s.m = c0.m,
         |       range($subDim) ri$t(i)
         |), qm$t AS (
         |  SELECT m, cell, pos, CAST(CAST(sum(q) AS BIGINT) // count(*) AS BIGINT) AS qm
         |  FROM qx$t GROUP BY m, cell, pos
         |), cb${t + 1} AS (
         |  SELECT m, cell AS cid,
         |    list_transform(list(qm ORDER BY pos),
         |      x -> CAST(CAST(CAST(x AS DOUBLE) / 1000.0 AS FLOAT) AS DOUBLE)) AS cv
         |  FROM qm$t GROUP BY m, cell
         |)""".stripMargin
    val adcPivot = (0 until m)
      .map(i => s"max(CASE WHEN dt.m = $i THEN dt.dq END)")
      .mkString(" + ")
    s"""allv AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), subv AS (
       |  SELECT vec_id, m, v[m * $subDim + 1 : (m + 1) * $subDim] AS sv
       |  FROM allv, range($m) rm(m)
       |), cb0 AS (
       |  SELECT m, vec_id AS cid, sv AS cv FROM subv WHERE vec_id < $codes
       |),
       |${(0 until rounds).map(round).mkString(",\n")},
       |af AS (
       |  SELECT s.vec_id, s.m, c.cid, ${d2("s.sv", "c.cv")} AS d2
       |  FROM subv s JOIN cb$rounds c ON c.m = s.m
       |), rf AS (
       |  SELECT vec_id, m, cid,
       |    row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, cid) AS rn
       |  FROM af
       |), enc AS (
       |  SELECT vec_id AS neighbor_id, m, cid AS cell FROM rf WHERE rn = 1
       |), dt AS (
       |  SELECT s.vec_id AS query_id, s.m, c.cid AS cell, ${d2("s.sv", "c.cv")} AS dq
       |  FROM subv s JOIN cb$rounds c ON c.m = s.m
       |  WHERE s.vec_id % 100 = 0
       |), pair AS (
       |  SELECT dt.query_id, e.neighbor_id, $adcPivot AS d2s
       |  FROM enc e JOIN dt ON dt.m = e.m AND dt.cell = e.cell
       |  WHERE dt.query_id <> e.neighbor_id
       |  GROUP BY 1, 2
       |), rk AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY d2s ASC, neighbor_id) AS rnk
       |  FROM pair
       |)""".stripMargin
  }

  /** E2-PQ ≙ Similarity.topKPq (queries = vec_id % 100 = 0, k = 3,
    * 4 subspaces × 8 codes, 2 Lloyd rounds). Every distance is the same
    * `|u|² − 2·u·c + |c|²` dot-product identity over `list_dot_product`
    * (≙ FloatVectorDot, proven bit-identical); the ADC sum adds its 4
    * subspace terms in FIXED order via max-CASE pivots, mirroring the
    * Spark side's fixed-order reduction (a bare SUM would be
    * order-nondeterministic float addition on both engines). */
  val annPqSql: String =
    s"""WITH $annPqCteBody
       |SELECT query_id, neighbor_id, rnk::INTEGER AS rnk
       |FROM rk WHERE rnk <= 3
       |ORDER BY query_id, rnk""".stripMargin

  /** E2-rerank ≙ Similarity.topKPqRerank (shortlist = 12, k = 3): the PQ
    * chain's ADC ranking supplies the shortlist, then the ORIGINAL vectors
    * are fetched for just those pairs and re-scored with exact cosine
    * (`list_dot_product` ≙ FloatVectorDot) — full-precision math decides
    * the final order, floats ordering-only as everywhere. */
  val annPqRerankSql: String =
    s"""WITH $annPqCteBody,
       |sl AS (
       |  SELECT query_id, neighbor_id FROM rk WHERE rnk <= 12
       |), ex AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    list_dot_product(q.v, n.v)
       |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))) AS cos
       |  FROM sl s
       |  JOIN allv q ON q.vec_id = s.query_id
       |  JOIN allv n ON n.vec_id = s.neighbor_id
       |), rr AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM ex
       |)
       |SELECT query_id, neighbor_id, rnk::INTEGER AS rnk
       |FROM rr WHERE rnk <= 3
       |ORDER BY query_id, rnk""".stripMargin

  /** E2-IVFPQ ≙ Similarity.topKIvfPq (coarse k = 8 via the SAME
    * kmeansCellCtes chain the kmeans/semdedup rows replay, 2 probes;
    * PQ 4 subspaces × 8 codes, 2 Lloyd rounds over RESIDUALS; queries =
    * vec_id % 100 = 0, k = 3). Residual = v − centroid/1000 float-rounded
    * (double subtraction of exact float promotions, rounded to float —
    * bit-identical to Spark's float arithmetic); PQ round CTEs are
    * p-prefixed so they cannot collide with the k-means chain's r/qx/qm
    * names. */
  val annIvfPqSql: String = annIvfPqSqlWith("TRUE")

  /** E2-IVFPQ' ≙ ext_ann_ivfpq_incremental: coarse centroids AND residual
    * codebooks trained on history only (`trainWhere`), the WHOLE corpus
    * encoded at the frozen model — what folding a batch's encodings into
    * the persisted code index produces, since encoding is per-vector at
    * fixed parameters. */
  lazy val annIvfPqIncrementalSql: String = annIvfPqSqlWith("vec_id % 20 <> 3")

  /** ≙ the ext_ann_ivfpq_forget fold: the deployed model (coarse
    * centroids, residual codebooks, full-corpus code index) is unchanged;
    * subject deletion filters the code index rows only — the compressed
    * twin of the IVF-flat forget. */
  lazy val annIvfPqForgetSql: String =
    annIvfPqSqlWith("TRUE", "e.neighbor_id % 50 <> 7")

  /** ≙ ext_ann_ivfpq_refresh — the CODEBOOK-only partial refresh: coarse
    * centroids stay frozen (trained on the full corpus, pre-deletion),
    * the residual codebooks re-fit over the SURVIVORS' raw vectors (PQ
    * codes are lossy — refresh reads the registry/source, never the
    * stored codes), survivors re-encode at old cells + new codebooks.
    * vec_id 7 is a forgotten subject, so the refit has 7 seed codes per
    * subspace — identical on both engines (seeds come from the FILTERED
    * train set). */
  lazy val annIvfPqRefreshSql: String = annIvfPqSqlWith(
    "TRUE", "e.neighbor_id % 50 <> 7", Some("vec_id % 50 <> 7"))

  /** CDC→COMPRESSED-index bridge ≙ ext_cdc_ivfpq_serving_fold[_stream]:
    * the changelog delta names the revised docs, each re-embedded by the
    * reversal stub; the coarse centroids AND the residual codebooks stay
    * the deployed pre-delta model (trained on `allv`), and the POST-delta
    * vector set is coarse-assigned, residualed and code-assigned at that
    * frozen model — exactly what the in-place fold of the
    * ccell-partitioned code layout produces, since encoding is per-vector
    * at fixed parameters. */
  lazy val cdcIvfPqDeltaSql: String = {
    val docsCdc = new CdcOracle(
      graft.cdc.ChangeFeed.docsSpec, Seq("doc_id"), "documents")
    val extra =
      s"""cl2 AS (
         |${docsCdc.changelogSql}
         |), cdelta AS (
         |  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id
         |  FROM cl2 WHERE column_name = 'text' AND new_value IS NOT NULL
         |), postv AS (
         |  SELECT e.vec_id,
         |    CASE WHEN d.doc_id IS NULL THEN e.embedding::DOUBLE[]
         |         ELSE list_reverse(e.embedding)::DOUBLE[] END AS v
         |  FROM embeddings e LEFT JOIN cdelta d ON e.vec_id = d.doc_id
         |), """.stripMargin
    annIvfPqSqlWith("TRUE", "TRUE", None, extraCtes = extra, encSrc = "postv")
  }

  /** @param pqTrainWhere restricts ONLY the residual-codebook training
    *        set (the codebook-refit refresh trains new codebooks at
    *        FROZEN coarse cells); None = same as `trainWhere`.
    * @param extraCtes CTEs prepended after `allv` (the CDC-delta
    *        composition threads the changelog chain through here — the
    *        ivfChainCtes precedent).
    * @param encSrc the vector set ENCODED at the frozen model (and the
    *        query source): "allv" keeps the legacy single-residual chain
    *        byte-identical; a derived post-delta set gets its own coarse
    *        assignment + residual CTEs while TRAINING (coarse k-means and
    *        codebook fit) stays on the pre-delta `allv` — exactly what an
    *        in-place code fold at a frozen deployed model produces. */
  private def annIvfPqSqlWith(trainWhere: String,
      neighborWhere: String = "TRUE",
      pqTrainWhere: Option[String] = None,
      extraCtes: String = "",
      encSrc: String = "allv"): String = {
    val pqw = pqTrainWhere.getOrElse(trainWhere)
    val m = 4; val codes = 8; val pqRounds = 2; val k = 3; val probes = 2
    val dim = graft.ext.Similarity.Dim
    val subDim = dim / m
    def d2(sv: String, cv: String): String =
      s"list_dot_product($sv, $sv) - 2 * list_dot_product($sv, $cv)" +
        s" + list_dot_product($cv, $cv)"
    // one PQ Lloyd round over the corpus RESIDUAL sub-vectors
    def round(t: Int): String =
      s"""pa$t AS (
         |  SELECT s.vec_id, s.m, c.cid, ${d2("s.sv", "c.cv")} AS d2
         |  FROM trsub s JOIN cb$t c ON c.m = s.m
         |), pr$t AS (
         |  SELECT vec_id, m, cid,
         |    row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, cid) AS rn
         |  FROM pa$t
         |), pcell$t AS (
         |  SELECT vec_id, m, cid AS cell FROM pr$t WHERE rn = 1
         |), pqx$t AS (
         |  SELECT c0.m, c0.cell, i AS pos, CAST(floor(s.sv[i+1] * 1000.0) AS BIGINT) AS q
         |  FROM pcell$t c0 JOIN trsub s ON s.vec_id = c0.vec_id AND s.m = c0.m,
         |       range($subDim) pri$t(i)
         |), pqm$t AS (
         |  SELECT m, cell, pos, CAST(CAST(sum(q) AS BIGINT) // count(*) AS BIGINT) AS qm
         |  FROM pqx$t GROUP BY m, cell, pos
         |), cb${t + 1} AS (
         |  SELECT m, cell AS cid,
         |    list_transform(list(qm ORDER BY pos),
         |      x -> CAST(CAST(CAST(x AS DOUBLE) / 1000.0 AS FLOAT) AS DOUBLE)) AS cv
         |  FROM pqm$t GROUP BY m, cell
         |)""".stripMargin
    val adcPivot = (0 until m)
      .map(i => s"max(CASE WHEN dt.m = $i THEN dt.dq END)")
      .mkString(" + ")
    // residual of `v` from the ×1000 integer-mean centroid `cv`, rescaled
    // and float-rounded elementwise
    def residual(v: String, cv: String): String =
      s"list_transform(range($dim), i -> CAST(CAST($v[i+1]" +
        s" - CAST($cv[i+1] / 1000.0 AS FLOAT) AS FLOAT) AS DOUBLE))"
    // the derived-source encode chain: its own coarse assignment at the
    // frozen cent2 plus residual sub-vectors for the encode set; empty in
    // the legacy form where rsub/r2 serve both training and encoding
    val encCtes = if (encSrc == "allv") "" else
      s"""scE AS (
         |  SELECT a.vec_id, c.cid, ${cosineSql("a.v", "c.cv")} AS s FROM $encSrc a, cent2 c
         |), rE AS (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
         |  FROM scE
         |), cellE AS (
         |  SELECT vec_id, cid AS cell FROM rE WHERE rn = 1
         |), resvE AS (
         |  SELECT a.vec_id, c0.cell AS ccell, ${residual("a.v", "ct.cv")} AS rv
         |  FROM $encSrc a JOIN cellE c0 ON c0.vec_id = a.vec_id
         |  JOIN cent2 ct ON ct.cid = c0.cell
         |), rsubE AS (
         |  SELECT vec_id, ccell, m, rv[m * $subDim + 1 : (m + 1) * $subDim] AS sv
         |  FROM resvE, range($m) rmE(m)
         |), """.stripMargin
    val encSub = if (encSrc == "allv") "rsub" else "rsubE"
    val qRank = if (encSrc == "allv") "r2" else "rE"
    s"""WITH allv AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), $extraCtes${kmeansCellCtes(8, trainWhere)},
       |resv AS (
       |  SELECT a.vec_id, c0.cell AS ccell, ${residual("a.v", "ct.cv")} AS rv
       |  FROM allv a JOIN cell2 c0 ON c0.vec_id = a.vec_id
       |  JOIN cent2 ct ON ct.cid = c0.cell
       |), rsub AS (
       |  SELECT vec_id, ccell, m, rv[m * $subDim + 1 : (m + 1) * $subDim] AS sv
       |  FROM resv, range($m) rm(m)
       |), trsub AS (
       |  SELECT * FROM rsub WHERE $pqw
       |), ${encCtes}qresv AS (
       |  SELECT a.vec_id, r.cid AS ccell, ${residual("a.v", "ct.cv")} AS rv
       |  FROM $encSrc a JOIN $qRank r ON r.vec_id = a.vec_id AND r.rn <= $probes
       |  JOIN cent2 ct ON ct.cid = r.cid
       |  WHERE a.vec_id % 100 = 0
       |), qsub AS (
       |  SELECT vec_id, ccell, m, rv[m * $subDim + 1 : (m + 1) * $subDim] AS sv
       |  FROM qresv, range($m) qrm(m)
       |), cb0 AS (
       |  SELECT m, vec_id AS cid, sv AS cv FROM trsub WHERE vec_id < $codes
       |),
       |${(0 until pqRounds).map(round).mkString(",\n")},
       |paf AS (
       |  SELECT s.vec_id, s.ccell, s.m, c.cid, ${d2("s.sv", "c.cv")} AS d2
       |  FROM $encSub s JOIN cb$pqRounds c ON c.m = s.m
       |), prf AS (
       |  SELECT vec_id, ccell, m, cid,
       |    row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, cid) AS rn
       |  FROM paf
       |), enc AS (
       |  SELECT vec_id AS neighbor_id, ccell, m, cid AS cell FROM prf WHERE rn = 1
       |), dt AS (
       |  SELECT s.vec_id AS query_id, s.ccell, s.m, c.cid AS cell,
       |    ${d2("s.sv", "c.cv")} AS dq
       |  FROM qsub s JOIN cb$pqRounds c ON c.m = s.m
       |), pair AS (
       |  SELECT dt.query_id, e.neighbor_id, $adcPivot AS d2s
       |  FROM enc e JOIN dt ON dt.ccell = e.ccell AND dt.m = e.m AND dt.cell = e.cell
       |  WHERE dt.query_id <> e.neighbor_id AND ($neighborWhere)
       |  GROUP BY 1, 2
       |), prk AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY d2s ASC, neighbor_id) AS rnk
       |  FROM pair
       |)
       |SELECT query_id, neighbor_id, rnk::INTEGER AS rnk
       |FROM prk WHERE rnk <= $k
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** ≙ ops.Journeys.sessionPaths (gap 1800 s, top 20, sessions truncated
    * at 12 events with a '>…' marker): sessionize CTEs as in
    * sessionConcurrencySql, per-session ordered string_agg, global
    * (count DESC, path ASC) total order. */
  val sessionPathsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS t_s, event_type FROM events
      |), f AS (
      |  SELECT user_id, event_id, t_s, event_type,
      |    CASE WHEN t_s - lag(t_s) OVER w <= 1800 THEN 0 ELSE 1 END AS newf
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY t_s, event_id)
      |), s AS (
      |  SELECT user_id, event_id, t_s, event_type,
      |    CAST(sum(newf) OVER (PARTITION BY user_id ORDER BY t_s, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM f
      |), rn AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, session_seq
      |                               ORDER BY t_s, event_id) AS rk
      |  FROM s
      |), paths AS (
      |  SELECT user_id, session_seq,
      |    string_agg(event_type, '>' ORDER BY t_s, event_id) FILTER (WHERE rk <= 12)
      |      || CASE WHEN max(rk) > 12 THEN '>…' ELSE '' END AS path
      |  FROM rn GROUP BY user_id, session_seq
      |)
      |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
      |FROM paths GROUP BY path
      |ORDER BY n_sessions DESC, path ASC
      |LIMIT 20""".stripMargin

  /** ≙ ops.Analytics.movingUserActivity (1-hour trailing RANGE frame):
    * identical VALUE-bound frame semantics on both engines (same-second
    * peers aggregate together), money as the same `floor(v*100+0.5)`
    * integer cents, all time math at epoch seconds. */
  val movingAggSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS t_s,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      |  FROM events
      |)
      |SELECT event_id, user_id, t_s,
      |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
      |  CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY t_s
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** ≙ ops.Journeys.eventTransitions: lag pairs per user stream, counts +
    * per-from share in integer basis points. */
  /** ≙ ops.Analytics.gapFillHourly(events, event_type): dense hourly grid
    * with zero-filled counts and LOCF of the carried metric (`last_value
    * IGNORE NULLS` over a unique-hour order matches Spark's `last(...,
    * ignoreNulls)` bit-for-bit). */
  val gapFillSql: String =
    """WITH e AS (
      |  SELECT event_type, (epoch_ns(ts) // 1000000000) // 3600 AS h,
      |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events
      |), a AS MATERIALIZED (
      |  SELECT event_type, h, CAST(count(*) AS BIGINT) AS n, max(cents) AS mx
      |  FROM e GROUP BY 1, 2
      |), b AS (
      |  SELECT min(h) AS lo, max(h) AS hi FROM a
      |), hours AS (
      |  SELECT unnest(range((SELECT lo FROM b), (SELECT hi FROM b) + 1)) AS h
      |), g AS (
      |  SELECT DISTINCT event_type FROM a
      |), grid AS (
      |  SELECT g.event_type, hours.h, a.n, a.mx
      |  FROM g CROSS JOIN hours
      |  LEFT JOIN a ON a.event_type = g.event_type AND a.h = hours.h
      |)
      |SELECT event_type, h AS hour_id,
      |  CAST(coalesce(n, 0) AS BIGINT) AS n_events,
      |  CAST(coalesce(last_value(mx IGNORE NULLS)
      |    OVER (PARTITION BY event_type ORDER BY h), 0) AS BIGINT) AS cents_locf
      |FROM grid
      |ORDER BY event_type, hour_id""".stripMargin

  /** ≙ ops.Analytics.basketRules over order→part baskets: pair-level
    * association rules (support / confidence both ways / lift, integer
    * bp, division order mirrored; lift multiplies before dividing). Same
    * capped projection as the graph family; the support cut prunes the
    * tail before the metric joins. */
  val basketRulesSql: String =
    s"""WITH pm AS MATERIALIZED (
       |  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS g,
       |                  CAST(l_partkey AS BIGINT) AS m
       |  FROM lineitem
       |), ok AS (
       |  SELECT g FROM pm GROUP BY g
       |  HAVING count(*) <= ${graft.ext.Graph.CoPurchaseGroupCap}
       |), ing AS MATERIALIZED (
       |  SELECT pm.g, pm.m FROM pm JOIN ok ON ok.g = pm.g
       |), nb AS (
       |  SELECT CAST(count(DISTINCT g) AS BIGINT) AS n FROM ing
       |), singles AS (
       |  SELECT m, CAST(count(*) AS BIGINT) AS c1 FROM ing GROUP BY m
       |), pairs AS (
       |  SELECT p1.m AS a, p2.m AS b, CAST(count(*) AS BIGINT) AS support_n
       |  FROM ing p1 JOIN ing p2 ON p1.g = p2.g AND p1.m < p2.m
       |  GROUP BY 1, 2
       |  HAVING count(*) >= ${graft.ops.Analytics.BasketMinSupport}
       |)
       |SELECT p.a, p.b, p.support_n,
       |  (p.support_n * 10000) // nb.n AS support_bp,
       |  (p.support_n * 10000) // sa.c1 AS conf_a_to_b_bp,
       |  (p.support_n * 10000) // sb.c1 AS conf_b_to_a_bp,
       |  (p.support_n * nb.n * 10000) // (sa.c1 * sb.c1) AS lift_bp
       |FROM pairs p
       |JOIN singles sa ON sa.m = p.a
       |JOIN singles sb ON sb.m = p.b
       |CROSS JOIN nb
       |ORDER BY p.a, p.b""".stripMargin

  /** ≙ ops.Analytics.hourlyAnomalies: the gap-filled hourly grid (CTEs
    * mirror gapFillSql verbatim) + the trailing-24-dense-hours baseline
    * frame; deviation's division order fixed (`n·hours·10⁴ // sum`),
    * NULL deviation on empty/zero baselines; window sums CAST (HUGEINT). */
  val hourlyAnomaliesSql: String =
    s"""WITH e AS (
       |  SELECT event_type, (epoch_ns(ts) // 1000000000) // 3600 AS h
       |  FROM events
       |), a AS MATERIALIZED (
       |  SELECT event_type, h, CAST(count(*) AS BIGINT) AS n
       |  FROM e GROUP BY 1, 2
       |), b AS (
       |  SELECT min(h) AS lo, max(h) AS hi FROM a
       |), hours AS (
       |  SELECT unnest(range((SELECT lo FROM b), (SELECT hi FROM b) + 1)) AS h
       |), g AS (
       |  SELECT DISTINCT event_type FROM a
       |), filled AS (
       |  SELECT g.event_type, hours.h AS hour_id,
       |    CAST(coalesce(a.n, 0) AS BIGINT) AS n_events
       |  FROM g CROSS JOIN hours
       |  LEFT JOIN a ON a.event_type = g.event_type AND a.h = hours.h
       |), base AS (
       |  SELECT event_type, hour_id, n_events,
       |    CAST(coalesce(sum(n_events) OVER wt, 0) AS BIGINT) AS baseline_sum,
       |    CAST(count(*) OVER wt AS BIGINT) AS baseline_hours
       |  FROM filled
       |  WINDOW wt AS (PARTITION BY event_type ORDER BY hour_id
       |                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
       |)
       |SELECT event_type, hour_id, n_events, baseline_sum, baseline_hours,
       |  CAST(CASE WHEN baseline_sum > 0
       |    THEN (n_events * baseline_hours * 10000) // baseline_sum
       |    END AS BIGINT) AS dev_bp,
       |  CAST(CASE WHEN baseline_sum > 0
       |    AND (n_events * baseline_hours * 10000) // baseline_sum
       |        > ${graft.ops.Analytics.SpikeBp}
       |    THEN 1 ELSE 0 END AS BIGINT) AS is_spike
       |FROM base
       |ORDER BY event_type, hour_id""".stripMargin

  val eventTransitionsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS t_s, event_type FROM events
      |), p AS (
      |  SELECT event_type AS to_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY t_s, event_id) AS from_type
      |  FROM e
      |), c AS (
      |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |  FROM p WHERE from_type IS NOT NULL
      |  GROUP BY from_type, to_type
      |)
      |SELECT from_type, to_type, n,
      |  CAST((n * 10000) // (sum(n) OVER (PARTITION BY from_type)) AS BIGINT) AS share_bp
      |FROM c
      |ORDER BY from_type, to_type""".stripMargin

  /** ≙ ops.Profile.columnStats(lineitem): one UNION ALL branch per
    * profiled column, rendered with the SAME per-kind expressions (cents /
    * epoch-seconds / raw), generated from the same Profile.LineitemCols
    * list so the column set cannot drift. */
  /** Shared per-kind value rendering for the profiling oracles —
    * mirrors ops.Profile.rendered exactly (cents / epoch-seconds / raw). */
  private def profileRender(n: String, k: graft.ops.Profile.Kind): String = {
    import graft.ops.Profile
    k match {
      case Profile.IntCol => s"CAST($n AS BIGINT)"
      case Profile.CentsCol => s"CAST(floor($n * 100) AS BIGINT)"
      case Profile.TsCol => s"epoch_ns($n) // 1000000000"
      case Profile.StrCol => n
    }
  }

  val tableStatsSql: String = {
    import graft.ops.Profile
    Profile.LineitemCols.map { case (n, k) =>
      val r = profileRender(n, k)
      val (mini, maxi, mins, maxs) =
        if (k == Profile.StrCol) ("NULL::BIGINT", "NULL::BIGINT", s"min($r)", s"max($r)")
        else (s"min($r)", s"max($r)", "NULL::VARCHAR", "NULL::VARCHAR")
      s"""SELECT '$n' AS column_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $r) AS BIGINT) AS n_distinct,
         |  $mini AS min_i, $maxi AS max_i, $mins AS min_s, $maxs AS max_s
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  /** ≙ ops.Profile.columnHistograms(lineitem, 16 bins): same per-kind
    * rendering and integer bin math, one UNION ALL branch per numeric
    * column from the shared Profile.LineitemCols list. */
  val columnHistSql: String = {
    import graft.ops.Profile
    val bins = 16
    Profile.LineitemCols.filterNot(_._2 == Profile.StrCol).map { case (n, k) =>
      val r = profileRender(n, k)
      s"""SELECT '$n' AS column_name,
         |  CAST((($r - b.mn) * $bins) // (b.mx - b.mn + 1) AS BIGINT) AS bin,
         |  CAST(count(*) AS BIGINT) AS n_rows
         |FROM lineitem, (SELECT min($r) AS mn, max($r) AS mx FROM lineitem) b
         |WHERE $n IS NOT NULL
         |GROUP BY 1, 2""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name, bin")
  }

  /** Shared BM25 CTE chain (corpus → bigrams → postings/df/dl/stats →
    * scored → `bmr` ranked to `depth`) — consumed by the BM25 query and
    * the hybrid fusion. The bigram CTE fans out to four consumers —
    * materialized. See Retrieval.scala scaladoc for the integer algebra
    * (rational RSJ idf surrogate, k1 = 6/5, b = 3/4 cleared of
    * fractions). `extraCtes` (inserted between the corpus CTEs and the
    * chain) + `src` let the CDC-delta composition index a DERIVED corpus
    * (post-delta text) while reusing the whole chain. */
  /** The BM25 chain AFTER the corpus CTE, parameterized by CTE-name
    * SUFFIX (the r13 composition convention: sfx = "" keeps the
    * historical text byte-identical) so a pre-fold and a post-fold chain
    * can share ONE WITH list ([[bm25ProbeRaceSql]]). */
  private def bm25ChainOver(depth: Int, corpusWhere: String = "TRUE",
      src: String = "corpus", sfx: String = ""): String =
    s"""tk$sfx AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM $src
       |  WHERE $corpusWhere
       |), idx$sfx AS (
       |  SELECT unnest(range((SELECT max(len(toks)) FROM tk$sfx))) AS i
       |), bg$sfx AS MATERIALIZED (
       |  SELECT doc_id, i AS pos, ${ngramConcat("toks", 2)} AS term
       |  FROM tk$sfx, idx$sfx WHERE i <= len(toks) - 2
       |), post$sfx AS MATERIALIZED (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM bg$sfx GROUP BY 1, 2
       |), dl$sfx AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM bg$sfx GROUP BY 1
       |), stats$sfx AS (
       |  SELECT CAST((SELECT count(*) FROM $src WHERE $corpusWhere) AS BIGINT) AS n,
       |         CAST(count(*) // (SELECT count(*) FROM $src WHERE $corpusWhere) AS BIGINT)
       |           AS avgdl
       |  FROM bg$sfx
       |), dfq$sfx AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post$sfx GROUP BY 1
       |), qt$sfx AS (
       |  SELECT DISTINCT doc_id AS query_id, term FROM bg$sfx
       |  WHERE pos < 6 AND doc_id % 100 = 3 AND doc_id < ${graft.ext.DocFeed.ExactDupOffset}
       |), scored$sfx AS (
       |  SELECT qt$sfx.query_id, p.doc_id,
       |    CAST(sum((((s.n * 2 - d.df * 2 + 1) * 1000000 // (d.df * 2 + 1))
       |          * p.tf * 22 * s.avgdl)
       |        // (p.tf * s.avgdl * 10 + s.avgdl * 3 + dl.dl * 9)) AS BIGINT)
       |      AS score_micro
       |  FROM qt$sfx
       |  JOIN post$sfx p USING (term)
       |  JOIN dfq$sfx d USING (term)
       |  JOIN dl$sfx dl ON dl.doc_id = p.doc_id
       |  CROSS JOIN stats$sfx s
       |  WHERE d.df * ${graft.ext.Retrieval.DfCapShareOfN} <= s.n
       |  GROUP BY 1, 2
       |), bmr$sfx AS (
       |  SELECT query_id, doc_id, score_micro, rnk FROM (
       |    SELECT query_id, doc_id, score_micro,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY score_micro DESC, doc_id) AS rnk
       |    FROM scored$sfx) r0
       |  WHERE rnk <= $depth
       |)""".stripMargin

  private def bm25Ctes(depth: Int, corpusWhere: String = "TRUE",
      src: String = "corpus", extraCtes: String = ""): String =
    s"""$corpusSql, $extraCtes${bm25ChainOver(depth, corpusWhere, src)}""".stripMargin

  /** E2-ret ≙ ext.Retrieval.bm25TopK over queryTerms (top-5). */
  val bm25Sql: String =
    s"""WITH ${bm25Ctes(5)}
       |SELECT query_id, rnk, doc_id, score_micro FROM bmr
       |ORDER BY query_id, rnk""".stripMargin

  /** ≙ the ext_bm25_forget fold: subject deletion (doc_id % 9 = 4) filters
    * the persisted postings and the doc registry; df/dl/N/avgdl/idf all
    * re-derive from the survivors, so the folded index must equal this
    * from-scratch index over the surviving corpus (queries derive from
    * survivors too — a forgotten query doc takes its query with it). */
  val bm25ForgetSql: String =
    s"""WITH ${bm25Ctes(5, "doc_id % 9 <> 4")}
       |SELECT query_id, rnk, doc_id, score_micro FROM bmr
       |ORDER BY query_id, rnk""".stripMargin

  /** E2-ret'' ≙ Retrieval.rrfFuse(bm25TopK(k=10), overlapTopK(k=10), k=5):
    * reciprocal-rank fusion of the two lexical systems — each ranked doc
    * contributes `10⁶ // (60 + rank)` per system, fused order is the sum.
    * The overlap system reuses the bm25 chain's tk/idx token CTEs with
    * ${graft.ext.Dedup.ShingleLen}-gram shingles and the same df·2 > N
    * hot-term cut. */
  val hybridRrfSql: String =
    s"""WITH ${bm25Ctes(10)}, shd AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, ${ngramConcat("toks", graft.ext.Dedup.ShingleLen)} AS sh
       |  FROM tk, idx WHERE i <= len(toks) - ${graft.ext.Dedup.ShingleLen}
       |), shdf AS (
       |  SELECT sh, CAST(count(*) AS BIGINT) AS sdf FROM shd GROUP BY 1
       |), qsh AS (
       |  SELECT doc_id AS query_id, sh FROM shd
       |  WHERE doc_id % 100 = 3 AND doc_id < ${graft.ext.DocFeed.ExactDupOffset}
       |), ovs AS (
       |  SELECT q.query_id, d.doc_id, CAST(count(*) AS BIGINT) AS overlap
       |  FROM qsh q
       |  JOIN shd d USING (sh)
       |  JOIN shdf f USING (sh)
       |  CROSS JOIN stats s
       |  WHERE f.sdf * ${graft.ext.Retrieval.DfCapShareOfN} <= s.n
       |  GROUP BY 1, 2
       |), ovr AS (
       |  SELECT query_id, doc_id, rnk FROM (
       |    SELECT query_id, doc_id,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY overlap DESC, doc_id) AS rnk
       |    FROM ovs) o0
       |  WHERE rnk <= 10
       |), fused AS (
       |  SELECT coalesce(a.query_id, b.query_id) AS query_id,
       |         coalesce(a.doc_id, b.doc_id) AS doc_id,
       |         CAST(coalesce(1000000 // (60 + a.rnk), 0)
       |            + coalesce(1000000 // (60 + b.rnk), 0) AS BIGINT) AS rrf_micro
       |  FROM bmr a
       |  FULL JOIN ovr b ON a.query_id = b.query_id AND a.doc_id = b.doc_id
       |)
       |SELECT query_id, rnk, doc_id, rrf_micro FROM (
       |  SELECT query_id, doc_id, rrf_micro,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY rrf_micro DESC, doc_id) AS rnk
       |  FROM fused) f0
       |WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  /** ≙ the LSH TABLE-count tuning curve: recall@3 micro-averaged for
    * 1..4 hash tables (4 bits each) against brute-force truth — more
    * tables, more recall, linearly more index. */
  val lshTableCurveSql: String = {
    val bits = 4
    def bucketListFor(tables: Int): String = (0 until tables).map { t =>
      bucketExprSql("embedding", t * bits until (t + 1) * bits, p => p % bits)
    }.mkString("[\n      ", ",\n      ", "\n    ]::BIGINT[]")
    def block(n: Int): String =
      s"""bk$n AS (
         |  SELECT vec_id, ${bucketListFor(n)} AS bl FROM embeddings
         |), tb$n AS (
         |  SELECT vec_id, generate_subscripts(bl, 1) AS t, unnest(bl) AS bucket FROM bk$n
         |), cd$n AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM tb$n q JOIN tb$n c ON q.t = c.t AND q.bucket = c.bucket
         |  WHERE q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id
         |), sc$n AS (
         |  SELECT cd$n.query_id, cd$n.neighbor_id,
         |         ${cosineSql("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")} AS cos
         |  FROM cd$n
         |  JOIN embeddings a ON a.vec_id = cd$n.query_id
         |  JOIN embeddings b ON b.vec_id = cd$n.neighbor_id
         |), sy$n AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY cos DESC, neighbor_id) AS rnk
         |    FROM sc$n) x$n
         |  WHERE rnk <= 3
         |), ev$n AS (
         |  SELECT CAST($n AS BIGINT) AS n_tables,
         |    CAST(count(*) AS BIGINT) AS n_truth,
         |    CAST(count(s.query_id) AS BIGINT) AS n_hits
         |  FROM truth t
         |  LEFT JOIN sy$n s
         |    ON s.query_id = t.query_id AND s.neighbor_id = t.neighbor_id
         |)""".stripMargin
    s"""WITH ts0 AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         ${cosineSql("q.embedding::DOUBLE[]", "c.embedding::DOUBLE[]")} AS cos
       |  FROM embeddings q, embeddings c
       |  WHERE q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id
       |), truth AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY cos DESC, neighbor_id) AS rnk
       |    FROM ts0) tr
       |  WHERE rnk <= 3
       |),
       |${(1 to 4).map(block).mkString(",\n")}
       |SELECT n_tables, n_truth, n_hits,
       |  CAST(n_hits * 10000 // n_truth AS BIGINT) AS recall_bp
       |FROM (SELECT * FROM ev1 UNION ALL SELECT * FROM ev2
       |      UNION ALL SELECT * FROM ev3 UNION ALL SELECT * FROM ev4) e
       |ORDER BY n_tables""".stripMargin
  }

  /** E2-eval ≙ Similarity.rankEval(topKCosineLshMulti, topKCosine, k=3):
    * recall@3 (bp) and reciprocal rank (micro) of the 4×4-bit multi-table
    * LSH ANN against the brute-force truth, per query. System CTEs are
    * annMultiprobeSql's verbatim; truth is the exhaustive cosine top-3. */
  val rankEvalSql: String = {
    val tables = 4
    val bits = 4
    val bucketList = (0 until tables).map { t =>
      bucketExprSql("embedding", t * bits until (t + 1) * bits, p => p % bits)
    }.mkString("[\n      ", ",\n      ", "\n    ]::BIGINT[]")
    s"""WITH buck AS (
       |  SELECT vec_id, $bucketList AS bl
       |  FROM embeddings
       |), tb AS (
       |  SELECT vec_id, generate_subscripts(bl, 1) AS t, unnest(bl) AS bucket FROM buck
       |), cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM tb q JOIN tb c ON q.t = c.t AND q.bucket = c.bucket
       |  WHERE q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id
       |), s AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |         ${cosineSql("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")} AS cos
       |  FROM cand
       |  JOIN embeddings a ON a.vec_id = cand.query_id
       |  JOIN embeddings b ON b.vec_id = cand.neighbor_id
       |), sys AS (
       |  SELECT query_id, neighbor_id, rnk FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |    FROM s) sr
       |  WHERE rnk <= 3
       |), ts AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         ${cosineSql("q.embedding::DOUBLE[]", "c.embedding::DOUBLE[]")} AS cos
       |  FROM embeddings q, embeddings c
       |  WHERE q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id
       |), truth AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |    FROM ts) tr
       |  WHERE rnk <= 3
       |)
       |SELECT t.query_id,
       |  CAST(count(*) AS BIGINT) AS n_truth,
       |  CAST(count(sys.rnk) AS BIGINT) AS n_hits,
       |  CAST(count(sys.rnk) * 10000 // count(*) AS BIGINT) AS recall_bp,
       |  CAST(coalesce(1000000 // min(sys.rnk), 0) AS BIGINT) AS rr_micro
       |FROM truth t
       |LEFT JOIN sys ON sys.query_id = t.query_id AND sys.neighbor_id = t.neighbor_id
       |GROUP BY t.query_id
       |ORDER BY t.query_id""".stripMargin
  }
}
