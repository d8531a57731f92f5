package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The container parsers must work on REAL container bytes, not just the
  * repo's planted payloads: a matching plant/parse offset bug would pass
  * the graded roundtrip, so these anchors feed the parsers genuine
  * spec-conformant files — a real 1×1 PNG (signature, IHDR, IDAT, IEND,
  * correct CRCs) and a JPEG prefix containing a DQT segment the planter
  * NEVER emits, which the marker walk must skip by its length field. */
class MultiModalDimsSpec extends AnyFunSuite with SparkFixture {

  // the canonical 1×1 red-pixel PNG, CRCs and zlib stream intact
  private val realPng =
    "89504e470d0a1a0a" +                      // signature
      "0000000d49484452" +                    // IHDR chunk: len 13, name
      "0000000100000001" +                    // width 1, height 1
      "0802000000" + "907753de" +             // depth/color/... + real CRC
      "0000000c49444154" +                    // IDAT: len 12, name
      "789c626001000000ffff" + "03000006" +   // zlib-deflated pixel
      "0000000049454e44ae426082"              // IEND + CRC

  // spec-true JPEG prefix: SOI, APP0/JFIF (len 16), DQT (len 67 — a
  // segment type the planter never writes), SOF0 with height 288 width 320
  private val realJpeg =
    "ffd8" +
      "ffe000104a46494600010100000100010000" +
      "ffdb0043" + "00" + "10" * 64 +
      "ffc00011" + "08" + "0120" + "0140" + "03011100021101031101"

  private def dims(hexPayload: String, parser: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column): Option[(Long, Long)] = {
    val s = spark
    import s.implicits._
    val r = Seq(hexPayload).toDF("ph")
      .select(parser(unhex(col("ph"))).as("d"))
      .select(col("d.width"), col("d.height"))
      .collect().head
    if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
  }

  test("pngDims reads a genuine PNG's IHDR") {
    assert(dims(realPng, MultiModal.pngDims) == Some((1L, 1L)))
  }

  test("jpegSofDims walks a genuine JPEG's segments past a DQT it has " +
      "never seen planted") {
    assert(dims(realJpeg, MultiModal.jpegSofDims(_)) == Some((320L, 288L)))
  }

  test("parsers refuse the other container and garbage") {
    assert(dims(realPng, MultiModal.jpegSofDims(_)).isEmpty)
    assert(dims(realJpeg, MultiModal.pngDims).isEmpty)
    assert(dims("deadbeefdeadbeefdeadbeefdeadbeefdeadbeef",
      MultiModal.pngDims).isEmpty)
  }

  // genuine canonical 44-byte-header WAV: PCM mono 8000 Hz 16-bit, 800
  // samples (100 ms) of silence
  private val realWav = {
    val dataBytes = 1600
    "52494646" + leHex(36 + dataBytes, 4) + "57415645" +
      "666d7420" + "10000000" + "0100" + "0100" +
      leHex(8000, 4) + leHex(16000, 4) + "0200" + "1000" +
      "64617461" + leHex(dataBytes, 4) + "00" * dataBytes
  }

  private def leHex(v: Long, bytes: Int): String = {
    val be = ("0" * (bytes * 2) + v.toHexString).takeRight(bytes * 2)
    (bytes to 1 by -1).map(i => be.substring(2 * i - 2, 2 * i)).mkString
  }

  private def wav(hexPayload: String): Option[(Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val r = MultiModal.wavMetaColumns(
        Seq(hexPayload).toDF("ph").select(unhex(col("ph")).as("p")), "p")
      .select(col("channels"), col("sample_rate"), col("bits"), col("duration_ms"))
      .collect().head
    if (r.isNullAt(0)) None
    else Some((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  test("wavMeta reads a genuine canonical WAV header") {
    assert(wav(realWav) == Some((1L, 8000L, 16L, 100L)))
  }

  test("wavMeta walks past a JUNK chunk the planter never emits") {
    // insert a 4-byte JUNK chunk between WAVE and fmt; RIFF size += 12
    val junked = realWav.substring(0, 8) + leHex(36 + 1600 + 12, 4) +
      "57415645" + "4a554e4b" + "04000000" + "deadbeef" +
      realWav.substring(24)
    assert(wav(junked) == Some((1L, 8000L, 16L, 100L)))
  }

  test("wavMeta honors the RIFF word-alignment pad after an ODD-sized chunk") {
    // a 5-byte JUNK chunk (declared size 5, one pad byte) before fmt —
    // per the RIFF spec the next chunk starts at the EVEN boundary; a
    // walk ignoring the pad lands one byte short and misparses everything
    val junked = realWav.substring(0, 8) + leHex(36 + 1600 + 14, 4) +
      "57415645" + "4a554e4b" + "05000000" + "deadbeefaa" + "00" +
      realWav.substring(24)
    assert(wav(junked) == Some((1L, 8000L, 16L, 100L)))
  }

  test("wavMeta refuses PNG, JPEG and garbage payloads") {
    assert(wav(realPng).isEmpty)
    assert(wav(realJpeg).isEmpty)
    assert(wav("deadbeefdeadbeefdeadbeefdeadbeefdeadbeef").isEmpty)
  }

  test("plantedWavMeta roundtrip: parsed bytes reproduce the planted audio " +
      "spec for every id residue (LIST runs 0-2 × raw plants)") {
    val s = spark
    import s.implicits._
    val df = (0L until 24L).map(i => (i, s"doc number $i text")).toDF("doc_id", "text")
    val got = MultiModal.plantedWavMeta(df)
      .collect().map(r => (r.getLong(0), (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5))))
      .toMap
    for (i <- 0L until 24L) {
      if (i % 11 == 0) {
        assert(got(i) == (("raw", -1L, -1L, -1L, -1L)), s"raw plant $i")
      } else {
        val ch = i % 2 + 1
        val rate = (i % 4 + 1) * 11025
        val dataSize = (i % 9 + 1) * 500 * (ch * 2)
        val durMs = dataSize * 1000L / (rate * ch * 2)
        assert(got(i) == (("riff", ch, rate, 16L, durMs)), s"wav plant $i")
      }
    }
  }

  test("resizeHalf: a genuine 1x1 PNG floors at 1x1, JPEG passes through byte-identical") {
    val s = spark
    import s.implicits._
    val r = Seq((realPng, realJpeg)).toDF("png", "jpg")
      .select(
        MultiModal.pngDims(MultiModal.resizeHalf(unhex(col("png")))).as("d"),
        (MultiModal.resizeHalf(unhex(col("jpg"))) === unhex(col("jpg"))).as("same"))
      .select(col("d.width"), col("d.height"), col("same"))
      .collect().head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 1L)), "1x1 input floors at 1x1")
    assert(r.getBoolean(2), "non-PNG payloads must pass through untouched")
  }

  test("plantedDims roundtrip: parsed bytes reproduce the planted geometry " +
      "for every id residue (PNG/JPEG × 0-2 COM segments)") {
    val s = spark
    import s.implicits._
    val df = (0L until 12L).map(i => (i, s"doc number $i text")).toDF("doc_id", "text")
    val got = MultiModal.plantedDims(df)
      .select("doc_id", "fmt", "width", "height")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    val want = df.select(col("doc_id"),
        when(col("doc_id") % 2 === 0, "png").otherwise("jpeg").as("fmt"),
        MultiModal.plantedWidth(col("doc_id")).as("w"),
        MultiModal.plantedHeight(col("doc_id")).as("h"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want)
  }
}
