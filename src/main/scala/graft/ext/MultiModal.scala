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
