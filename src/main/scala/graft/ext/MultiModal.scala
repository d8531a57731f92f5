package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.13 E4): media payloads as opaque
  * `binary` columns with typed metadata, plus deterministic stand-ins for
  * the decode/feature steps.
  *
  * The real decoders (image/audio libs) are not in this container, so the
  * DECODE step is a clearly-marked deterministic fake ([[fakeFeatures]]) —
  * but the Spark-side plumbing is real: schema (binary payload + metadata
  * struct), magic-number sniffing, frame sampling, and feature extraction
  * are all codegen'd column expressions that a production decoder (a
  * vectorized native/Pandas UDF over the same payload column) would slot
  * into without touching the surrounding plan. Everything here is map-only:
  * no shuffle, embarrassingly parallel at any scale.
  */
object MultiModal {

  /** Attach a binary payload + metadata struct derived from a text column
    * (the fixture has no real media; the bytes are the UTF-8 encoding). */
  def withPayload(df: DataFrame, textCol: String = "text"): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    df.withColumn("payload", payload)
      .withColumn("media_meta", struct(
        octet_length(col(textCol)).as("n_bytes"),
        sniffFormat(payload).as("format")))
  }

  /** Container sniff by magic number over the payload's first bytes:
    * JPEG ff d8 ff, PNG 89 50 4e 47, RIFF (wav/avi) 52 49 46 46; anything
    * else is opaque "raw". Pure binary substring + hex compare — codegen'd. */
  def sniffFormat(payload: Column): Column = {
    val head4 = lower(hex(substring(payload, 1, 4)))
    when(head4.startsWith("ffd8ff"), lit("jpeg"))
      .when(head4 === "89504e47", lit("png"))
      .when(head4 === "52494646", lit("riff"))
      .otherwise(lit("raw"))
  }

  /** Frame sampling: every `stride` bytes, a `frameBytes`-byte slice —
    * the video-keyframe access pattern, expressed as array-of-binary. */
  def frameSample(payload: Column, frameBytes: Int, stride: Int): Column =
    transform(
      sequence(lit(0L), greatest(floor((octet_length(payload) - 1) / stride).cast("long"), lit(0L))),
      i => substring(payload, (i * stride + 1).cast("int"), lit(frameBytes)))

  /** DECODE STUB — deterministic fake feature vector (16 dims in [0,1])
    * derived from the payload's md5. A real deployment replaces this one
    * expression with the actual decoder's embedding; the shape (fixed-width
    * `array<double>` per row, computed map-side) is what the downstream
    * similarity/dedup operators consume either way. */
  def fakeFeatures(payload: Column): Column = {
    val h = md5(payload)
    transform(sequence(lit(1), lit(16)),
      i => conv(substring(h, (i - 1) * 2 + 1, lit(2)), 16, 10).cast("double") / lit(255.0d))
  }

  /** The graded metadata projection: id, byte count, first-8-chars hex dump,
    * sniffed format. */
  def metadata(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(textCol)).as("n_bytes"),
      lower(hex(encode(substring(col(textCol), 1, 8), "UTF-8"))).as("head_hex"),
      sniffFormat(encode(col(textCol), "UTF-8")).as("fmt"))

  // -------------------------------------------------------------------
  // E4'' — REAL byte-level container decode: PNG IHDR / JPEG SOF
  // dimension extraction. The fixture has no media files, so payloads
  // are PLANTED: spec-conformant PNG/JPEG headers with dimensions (and a
  // variable run of JPEG COM segments) derived deterministically from
  // doc_id, built as hex and unhex'd to real bytes. The PARSERS know
  // nothing of the planting — they do the actual container arithmetic
  // (magic check, chunk offsets, big-endian fields, JPEG marker-segment
  // walk), all as codegen'd substring/hex/conv expressions; a real-file
  // anchor test feeds them genuine PNG/JPEG bytes.
  // -------------------------------------------------------------------

  val PngMagicHex = "89504e470d0a1a0a"

  /** Planted geometry: deterministic, engine-portable integer math. */
  def plantedWidth(id: Column): Column = (id * 7) % 2000 + 16
  def plantedHeight(id: Column): Column = (id * 13) % 1500 + 16

  /** Big-endian hex rendering of an integral column at `bytes` width. */
  private def beHex(v: Column, bytes: Int): Column =
    lpad(lower(hex(v)), bytes * 2, "0")

  /** Planted payload as a hex string: even doc_ids get a PNG (signature +
    * IHDR with W/H), odd ones a JPEG (SOI + APP0/JFIF + 0–2 COM segments
    * of id-dependent length + SOF0 with H/W + EOI). The COM run forces
    * the JPEG parser to genuinely WALK segments — SOF is at a different
    * offset per document. Body filler comes from md5(text) so payloads
    * differ beyond their headers. */
  def plantedPayloadHex(id: Column, text: Column): Column = {
    val w = plantedWidth(id)
    val h = plantedHeight(id)
    val png = concat(
      lit(PngMagicHex), lit("0000000d49484452"), beHex(w, 4), beHex(h, 4),
      lit("0802000000"), md5(text))
    // one COM segment: marker + length (2 + content bytes) + md5-filler
    val comContent = (id % 5) + 2
    val com = concat(lit("fffe"), beHex(comContent + 2, 2),
      md5(text).substr(lit(1), (comContent * 2).cast("int")))
    val coms = when(id % 3 === 0, lit(""))
      .when(id % 3 === 1, com)
      .otherwise(concat(com, com))
    val sof = concat(lit("ffc00011"), lit("08"), beHex(h, 2), beHex(w, 2),
      lit("03011100021101031101"))
    val jpeg = concat(
      lit("ffd8"), lit("ffe000104a46494600010100000100010000"),
      coms, sof, md5(text), lit("ffd9"))
    when(id % 2 === 0, png).otherwise(jpeg)
  }

  /** PNG IHDR dimensions (PNG spec: 8-byte signature, 4-byte chunk
    * length, "IHDR", then 4-byte big-endian width and height — bytes
    * 17–20 and 21–24). NULL unless the signature and chunk name check
    * out. Returns struct(width, height). */
  def pngDims(payload: Column): Column =
    when(lower(hex(substring(payload, 1, 8))) === PngMagicHex &&
        lower(hex(substring(payload, 13, 4))) === "49484452",
      struct(
        conv(hex(substring(payload, 17, 4)), 16, 10).cast("long").as("width"),
        conv(hex(substring(payload, 21, 4)), 16, 10).cast("long").as("height")))

  private val JpegSofMarkers = Seq("ffc0", "ffc1", "ffc2")

  /** JPEG SOF dimensions: walk the marker segments from the first one
    * after SOI (each = 2-byte marker + 2-byte big-endian length that
    * INCLUDES itself), stopping at a start-of-frame marker (C0 baseline /
    * C1 extended / C2 progressive); height and width are the big-endian
    * byte pairs at offsets +5 and +7 of the SOF segment. The walk is a
    * bounded expression fold (`maxSegs` skip steps — sized to the payload
    * population's worst case, NOT data-dependent). NULL if SOI is absent
    * or SOF isn't reached. Returns struct(width, height). */
  def jpegSofDims(payload: Column, maxSegs: Int = 5): Column = {
    def marker(off: Column) = lower(hex(payload.substr(off.cast("int"), lit(2))))
    def segLen(off: Column) =
      conv(hex(payload.substr((off + 2).cast("int"), lit(2))), 16, 10).cast("long")
    def isSof(m: Column) = m.isin(JpegSofMarkers: _*)
    val off = (1 to maxSegs).foldLeft(lit(3L): Column)((o, _) =>
      when(isSof(marker(o)), o).otherwise(o + 2 + segLen(o)))
    when(lower(hex(substring(payload, 1, 2))) === "ffd8" && isSof(marker(off)),
      struct(
        conv(hex(payload.substr((off + 7).cast("int"), lit(2))), 16, 10)
          .cast("long").as("width"),
        conv(hex(payload.substr((off + 5).cast("int"), lit(2))), 16, 10)
          .cast("long").as("height")))
  }

  /** [[jpegSofDims]] with the marker walk UNROLLED ACROSS PROJECTIONS
    * (the [[wavMetaColumns]] lesson applied to JPEG): one staged offset
    * column per skip step, each referencing the previous offset as an
    * ATTRIBUTE — the single-expression fold re-clones the offset ~5× per
    * step (~5^maxSegs leaves; with three consumers it dominated the
    * graded queries' wall time as driver-side optimizer work). Adds
    * `__jw`/`__jh` columns (NULL when SOI/SOF checks fail). */
  def jpegDimsColumns(df: DataFrame, payloadCol: String, maxSegs: Int = 5): DataFrame = {
    val p = col(payloadCol)
    def marker(off: Column) = lower(hex(p.substr(off.cast("int"), lit(2))))
    def segLen(off: Column) =
      conv(hex(p.substr((off + 2).cast("int"), lit(2))), 16, 10).cast("long")
    def isSof(m: Column) = m.isin(JpegSofMarkers: _*)
    val withOffs = (1 to maxSegs).foldLeft(df.withColumn("__j0", lit(3L))) { (d, k) =>
      d.withColumn(s"__j$k",
        when(isSof(marker(col(s"__j${k - 1}"))), col(s"__j${k - 1}"))
          .otherwise(col(s"__j${k - 1}") + 2 + segLen(col(s"__j${k - 1}"))))
    }
    val off = col(s"__j$maxSegs")
    val ok = lower(hex(substring(p, 1, 2))) === "ffd8" && isSof(marker(off))
    withOffs
      .withColumn("__jw", when(ok,
        conv(hex(p.substr((off + 7).cast("int"), lit(2))), 16, 10).cast("long")))
      .withColumn("__jh", when(ok,
        conv(hex(p.substr((off + 5).cast("int"), lit(2))), 16, 10).cast("long")))
      .drop((0 to maxSegs).map(k => s"__j$k"): _*)
  }

  /** The graded decode: plant a payload per document, then recover format
    * and dimensions FROM THE BYTES with the container parsers. Map-only,
    * no shuffle; output is ints + a format string (hash-safe). */
  def plantedDims(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // TWO projections: the payload lands in a real column first, and the
    // parsers reference that attribute. Handing the construction
    // expression straight to the parsers would clone it into every
    // substring leaf of the marker walk (~3^maxSegs copies — observed as
    // a 60 MB task binary); CollapseProject keeps a multiply-referenced
    // non-cheap alias staged, so this split holds at the optimizer too.
    val staged = df.select(col(idCol),
      unhex(plantedPayloadHex(col(idCol), col(textCol))).as("__payload"))
    val png = pngDims(col("__payload"))
    jpegDimsColumns(staged, "__payload").select(
      col(idCol),
      sniffFormat(col("__payload")).as("fmt"),
      coalesce(png.getField("width"), col("__jw")).as("width"),
      coalesce(png.getField("height"), col("__jh")).as("height"))
  }

  // -------------------------------------------------------------------
  // E4''' — REAL audio-container decode: WAV (RIFF) header parsing.
  // Same contract as the PNG/JPEG dims: payloads are PLANTED
  // spec-conformant RIFF/WAVE files (with 0–2 id-dependent LIST chunks
  // before "fmt " so the parser genuinely WALKS the chunk list, and a
  // deliberate run of RAW non-RIFF payloads as the negative case), and
  // the PARSER knows nothing of the planting — it does the actual RIFF
  // arithmetic: magic checks, LITTLE-endian 2/4-byte fields (the twist
  // vs PNG/JPEG's big-endian), bounded chunk walk, duration from the
  // data chunk's declared size over the fmt chunk's byte rate.
  // -------------------------------------------------------------------

  val RiffMagicHex = "52494646"
  val WaveMagicHex = "57415645"
  val FmtChunkHex = "666d7420" // "fmt "
  val DataChunkHex = "64617461" // "data"

  /** Little-endian integral field: `n` bytes at 1-based byte offset `off`
    * (a Column), assembled by reversing the byte order in hex space. */
  def leField(p: Column, off: Column, n: Int): Column =
    conv(concat(((n - 1) to 0 by -1).map(i =>
      lower(hex(p.substr((off + i).cast("int"), lit(1))))): _*), 16, 10).cast("long")

  /** Little-endian hex rendering of an integral column at `bytes` width
    * (the planting-side inverse of [[leField]]). */
  private def leHex(v: Column, bytes: Int): Column = {
    val be = lpad(lower(hex(v)), bytes * 2, "0")
    concat((bytes to 1 by -1).map(i => be.substr(lit(2 * i - 1), lit(2))): _*)
  }

  /** Planted WAV payload as hex: RIFF size + WAVE + 0–2 LIST chunks of
    * id-dependent length + canonical 16-byte PCM "fmt " + "data" with an
    * id-dependent declared size (md5 filler). Odd-sized LIST chunks carry
    * the RIFF word-alignment PAD byte (declared size excludes it, the walk
    * skips it — lcl ∈ 2..6, so odd sizes genuinely occur and the pad path
    * is exercised). Every doc_id % 11 == 0 gets a RAW payload instead —
    * the parser must yield NULLs, not garbage. */
  def plantedWavHex(id: Column, text: Column): Column = {
    val ch = id % 2 + 1
    val rate = (id % 4 + 1) * 11025
    val blockAlign = ch * 2 // 16-bit samples
    val byteRate = rate * blockAlign
    val dataSize = (id % 9 + 1) * 500 * blockAlign
    val lcl = id % 5 + 2 // LIST content bytes (declared — excludes the pad)
    val list = concat(lit("4c495354"), leHex(lcl, 4),
      md5(text).substr(lit(1), (lcl * 2).cast("int")),
      when(lcl % 2 === 1, lit("00")).otherwise(lit(""))) // word-alignment pad
    val nLists = id % 3
    val lists = when(nLists === 0, lit(""))
      .when(nLists === 1, list)
      .otherwise(concat(list, list))
    val riffSize = lit(4L) + nLists * (lcl + lcl % 2 + 8) + lit(24L) + (dataSize + 8)
    val wav = concat(
      lit(RiffMagicHex), leHex(riffSize, 4), lit(WaveMagicHex),
      lists,
      lit(FmtChunkHex), lit("10000000"), lit("0100"), // PCM, 16-byte fmt
      leHex(ch, 2), leHex(rate, 4), leHex(byteRate, 4),
      leHex(blockAlign, 2), lit("1000"), // 16 bits per sample
      lit(DataChunkHex), leHex(dataSize, 4), md5(text))
    when(id % 11 === 0, md5(text)).otherwise(wav)
  }

  /** WAV metadata from the bytes of `payloadCol`: channels / sample rate
    * / bits per sample out of the "fmt " chunk, duration in integer
    * milliseconds from the "data" chunk's declared size over the byte
    * rate; NULL fields when the RIFF/WAVE container checks fail.
    *
    * The chunk walk (each chunk = 4-byte id + 4-byte LITTLE-endian size +
    * content) is UNROLLED ACROSS PROJECTIONS, one staged `__o<k>` column
    * per step, each referencing the previous offset as an ATTRIBUTE: a
    * single-expression fold re-clones the accumulated offset ~7× per step
    * (~7^k leaves — observed as MINUTES of driver-side optimizer time at
    * maxChunks=4), while the staged form stays linear and CollapseProject
    * keeps multiply-referenced non-cheap aliases staged. Still map-only,
    * still one pass over the bytes per row. */
  def wavMetaColumns(df: DataFrame, payloadCol: String, maxChunks: Int = 4): DataFrame = {
    val p = col(payloadCol)
    def cid(o: Column) = lower(hex(p.substr(o.cast("int"), lit(4))))
    val valid = lower(hex(substring(p, 1, 4))) === RiffMagicHex &&
      lower(hex(substring(p, 9, 4))) === WaveMagicHex
    // chunk advance rounds up to the RIFF word boundary: content size +
    // its pad byte when odd (size stays staged so the %2 reference does
    // not re-clone the little-endian field extraction)
    val withOffs = (1 until maxChunks).foldLeft(
      df.withColumn("__o0", when(valid, lit(13L)))) { (d, k) =>
      d.withColumn(s"__s${k - 1}", leField(p, col(s"__o${k - 1}") + 4, 4))
        .withColumn(s"__o$k",
          col(s"__o${k - 1}") + 8 + col(s"__s${k - 1}") + col(s"__s${k - 1}") % 2)
    }
    val offs = (0 until maxChunks).map(k => col(s"__o$k"))
    def firstChunk(idHex: String): Column =
      coalesce(offs.map(o => when(cid(o) === idHex, o)): _*)
    val f = col("__fmt_off")
    val d = col("__data_off")
    withOffs
      .withColumn("__fmt_off", firstChunk(FmtChunkHex))
      .withColumn("__data_off", firstChunk(DataChunkHex))
      .withColumn("channels", leField(p, f + 10, 2))
      .withColumn("sample_rate", leField(p, f + 12, 4))
      .withColumn("bits", leField(p, f + 22, 2))
      .withColumn("duration_ms",
        TextOps.intDiv(leField(p, d + 4, 4) * 1000L, leField(p, f + 16, 4)))
      .drop((0 until maxChunks).map(k => s"__o$k") ++
        (0 until maxChunks - 1).map(k => s"__s$k") :+ "__fmt_off" :+ "__data_off": _*)
  }

  /** The graded audio decode: plant a payload per document, recover the
    * audio metadata FROM THE BYTES with [[wavMetaColumns]]. Map-only, no
    * shuffle. */
  def plantedWavMeta(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // staged payload column: the parsers reference one attribute, not a
    // re-cloned construction expression (see plantedDims)
    val staged = df.select(col(idCol),
      unhex(plantedWavHex(col(idCol), col(textCol))).as("__payload"))
    wavMetaColumns(staged, "__payload")
      .select(col(idCol), sniffFormat(col("__payload")).as("fmt"),
        col("channels"), col("sample_rate"), col("bits"), col("duration_ms"))
  }

  /** RESIZE step — the byte-level half done for real, the pixel half a
    * documented slot: for a PNG payload, rewrite the IHDR dimensions to
    * `width div 2 × height div 2` (floor, min 1) by hex surgery on the
    * real byte offsets; non-PNG payloads pass through untouched. A real
    * deployment adds pixel resampling in the [[decodeFeatures]]-style
    * batched slot — the header surgery here is what keeps downstream
    * byte-level consumers (dimension parsers, samplers) honest, and the
    * graded query re-PARSES the rewritten bytes with [[pngDims]] so the
    * offset arithmetic is proven by re-parse, not trusted. KNOWN
    * LIMITATION: the 4-byte IHDR CRC is left STALE (and the planted
    * payloads never carry a valid one) — a downstream consumer that
    * validates chunk CRCs would reject the output; recomputing it belongs
    * in the same batched decode slot as the pixel work (no portable crc32
    * exists in the DuckDB oracle dialect to grade it with). Map-only
    * expression work, no shuffle. */
  def resizeHalf(p: Column): Column = {
    val isPng = lower(hex(substring(p, 1, 8))) === PngMagicHex &&
      lower(hex(substring(p, 13, 4))) === "49484452"
    val w2 = greatest(TextOps.intDiv(
      conv(hex(substring(p, 17, 4)), 16, 10).cast("long"), lit(2L)), lit(1L))
    val h2 = greatest(TextOps.intDiv(
      conv(hex(substring(p, 21, 4)), 16, 10).cast("long"), lit(2L)), lit(1L))
    when(isPng,
      concat(substring(p, 1, 16), unhex(concat(beHex(w2, 4), beHex(h2, 4))),
        p.substr(lit(25), octet_length(p) - 24)))
      .otherwise(p)
  }

  /** The graded resize: plant payloads, rewrite PNG headers with
    * [[resizeHalf]], then re-PARSE the rewritten bytes with the same
    * container parsers — even (PNG) ids must come back halved, odd
    * (JPEG) ids untouched. */
  def plantedResizedDims(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val raw = df.select(col(idCol),
      unhex(plantedPayloadHex(col(idCol), col(textCol))).as("__raw"))
    val staged = raw.select(col(idCol), resizeHalf(col("__raw")).as("__payload"))
    val png = pngDims(col("__payload"))
    jpegDimsColumns(staged, "__payload").select(
      col(idCol),
      sniffFormat(col("__payload")).as("fmt"),
      coalesce(png.getField("width"), col("__jw")).as("width"),
      coalesce(png.getField("height"), col("__jh")).as("height"))
  }

  /** Batch decoder signature: a BATCH of payloads in, one fixed-width
    * feature vector per payload out (order-aligned). */
  type BatchDecoder = Seq[Array[Byte]] => Seq[Array[Double]]

  /** Deterministic stub decoder — byte-identical to [[fakeFeatures]]
    * (pinned by ExtOpsSpec): 16 dims from the payload's md5, each hex
    * byte / 255. The `MessageDigest` is allocated once per BATCH — the
    * amortize-expensive-init-per-batch pattern a real codec/model needs. */
  val stubDecoder: BatchDecoder = { payloads =>
    val md = java.security.MessageDigest.getInstance("MD5")
    payloads.map { p =>
      md.reset()
      val h = md.digest(p)
      Array.tabulate(16)(i => (h(i) & 0xff) / 255.0)
    }
  }

  /** The DECODE SLOT — the Scala analogue of a vectorized (Arrow/Pandas)
    * UDF: payload rows stream through `mapPartitions` in fixed-size
    * batches, the decoder sees whole batches (codec/model init amortized
    * per batch, not per row), and emits one `array<double>` per row. This
    * is the repo's single deliberate `mapPartitions` — genuine per-batch
    * imperative work that no Column expression can express; everything
    * around it (payload derivation, downstream aggregation) stays in the
    * declarative plan. Map-only: no shuffle, scales embarrassingly.
    *
    * @param batchSize rows per decoder call (a real decoder picks this to
    *        fit device memory); the last batch of a partition is short
    */
  def decodeFeatures(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      batchSize: Int = 64,
      decoder: BatchDecoder = stubDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), encode(col(textCol), "UTF-8"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val feats = decoder(batch.map(_._2))
          // a zip would SILENTLY drop/misalign rows on a buggy decoder
          require(feats.size == batch.size,
            s"decoder returned ${feats.size} vectors for a batch of ${batch.size}")
          batch.map(_._1).zip(feats)
        }
      }
      .toDF("doc_id", "features")
  }
}
