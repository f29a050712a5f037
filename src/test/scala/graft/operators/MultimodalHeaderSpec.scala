package graft.operators

import graft.SparkSpec
import Multimodal.{parseHeader, MediaHeader}

/** The REAL header parser (round 8): hand-crafted format-correct byte
  * arrays for every supported container, plus the adversarial inputs a
  * 100 TB corpus guarantees — truncation at every prefix length,
  * garbage, empties — which must all yield the unknown header, never a
  * throw or a wrong-but-valid parse. */
class MultimodalHeaderSpec extends SparkSpec {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def png(w: Int, h: Int): Array[Byte] =
    bytes(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 0x0D, 'I', 'H', 'D', 'R',
      w >>> 24, w >>> 16, w >>> 8, w, h >>> 24, h >>> 16, h >>> 8, h,
      8, 6, 0, 0, 0)

  private def gif(w: Int, h: Int): Array[Byte] =
    bytes('G', 'I', 'F', '8', '9', 'a', w, w >>> 8, h, h >>> 8, 0x80)

  private def wav(ch: Int, rate: Int): Array[Byte] =
    bytes('R', 'I', 'F', 'F', 0x24, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 0x10, 0, 0, 0, 1, 0, ch, ch >>> 8,
      rate, rate >>> 8, rate >>> 16, rate >>> 24)

  private def bmp(w: Int, h: Int): Array[Byte] =
    bytes('B', 'M', 0, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, 40, 0, 0, 0,
      w, w >>> 8, w >>> 16, w >>> 24, h, h >>> 8, h >>> 16, h >>> 24, 1, 0)

  /** Minimal JPEG: SOI, APP0 skipped via its length field, then SOF0. */
  private def jpeg(w: Int, h: Int): Array[Byte] =
    bytes(0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x04, 0x4A, 0x46,               // APP0, len 4
      0xFF, 0xC0, 0x00, 0x11, 0x08,                     // SOF0, precision 8
      h >>> 8, h, w >>> 8, w, 0x03)

  test("every container parses its planted fields from the raw bytes") {
    assert(parseHeader(png(640, 480)) == MediaHeader("png", 640, 480, 0, 0, true))
    assert(parseHeader(png(70000, 3)).width == 70000L) // >u16: PNG dims are u32
    assert(parseHeader(gif(1024, 768)) == MediaHeader("gif", 1024, 768, 0, 0, true))
    assert(parseHeader(wav(2, 44100)) == MediaHeader("wav", 0, 0, 2, 44100, true))
    assert(parseHeader(wav(1, 8000)) == MediaHeader("wav", 0, 0, 1, 8000, true))
    assert(parseHeader(bmp(800, 600)) == MediaHeader("bmp", 800, 600, 0, 0, true))
    assert(parseHeader(jpeg(1920, 1080)) ==
      MediaHeader("jpeg", 1920, 1080, 0, 0, true))
  }

  test("truncations, garbage, and empties are unknown — never a throw") {
    val valids = Seq(png(640, 480), gif(9, 9), wav(2, 44100),
      bmp(10, 10), jpeg(33, 44))
    for (v <- valids; n <- 0 until v.length) {
      val truncated = v.take(n)
      val h = parseHeader(truncated)
      // a truncated blob may still be validly parseable if every field
      // it needs survived; what it must NEVER do is throw or invent
      // fields — so any valid result must equal the full blob's parse
      if (h.valid) assert(h == parseHeader(v), s"prefix $n of ${v.length}")
    }
    assert(parseHeader(Array.emptyByteArray) == Multimodal.parseHeader(Array.emptyByteArray))
    assert(!parseHeader(Array.emptyByteArray).valid)
    assert(!parseHeader(bytes(0, 1, 2, 3, 4, 5, 6, 7, 8, 9)).valid)
    assert(!parseHeader(Array.fill(64)(0xFF.toByte)).valid)
    // JPEG with a segment length that walks past the end: unknown, no OOB
    assert(!parseHeader(bytes(0xFF, 0xD8, 0xFF, 0xE0, 0x7F, 0xFF)).valid)
  }

  test("real PNG decode: encode→decode round trip recovers dims and exact channel means") {
    val blob = Multimodal.encodePng(10, 4, baseR = 100, baseG = 40, baseB = 200)
    // the encoder writes a REAL PNG (header parser agrees on dims)
    val h = parseHeader(blob)
    assert(h.format == "png" && h.width == 10 && h.height == 4)
    val f = Multimodal.decodeImage(blob, 8).get
    assert(f(0) == 10f && f(1) == 4f)
    assert(f(2) == 100f + 4.5f) // mean of baseR + x over x in 0..9
    assert(f(3) == 40f && f(4) == 200f)
  }

  test("real WAV decode: PCM16 round trip recovers n/rate/meanAbs/zero-crossings") {
    val samples = Array.tabulate(50)(i => (if (i % 2 == 0) 1200 else -1200).toShort)
    val blob = Multimodal.encodeWavPcm16(samples, 16000f)
    val h = parseHeader(blob)
    assert(h.format == "wav" && h.channels == 1 && h.sampleRate == 16000)
    val f = Multimodal.decodeWav(blob, 8).get
    assert(f(0) == 50f && f(1) == 16000f && f(2) == 1200f && f(3) == 49f)
  }

  test("decodeFeatures dispatch: media decodes for real, garbage falls back to byte stats") {
    val png = Multimodal.encodePng(3, 3, 10, 20, 30)
    val real = Multimodal.decodeFeatures(png, 8)
    assert(real(0) == 3f && real(1) == 3f && real(2) == 11f)
    // garbage blob: byte-stat fallback, never a throw
    val junk = Array[Byte](1, 2, 3, 4)
    assert(Multimodal.decodeFeatures(junk, 8).toSeq ==
      Multimodal.decodeStub(junk, 8).toSeq)
    // text that merely STARTS like a BMP: corrupt dims guard + fallback
    val fakeBmp = ("BM" + "x" * 60).getBytes("UTF-8")
    assert(Multimodal.decodeFeatures(fakeBmp, 8).toSeq ==
      Multimodal.decodeStub(fakeBmp, 8).toSeq)
  }

  test("top-down BMP (negative i32 height) parses as |height|") {
    val h = parseHeader(bmp(800, -600))
    assert(h == MediaHeader("bmp", 800, 600, 0, 0, true),
      "negative BMP height means top-down rows, not corruption")
  }

  test("dims guard is overflow-safe: crafted ~2^32 dims fall back, never reach a codec") {
    // width = height = 0xFFFFFFFF: the product wraps negative in a Long,
    // so a product-only `<= 2^26` check would PASS it (round-10 advice);
    // the per-dimension bound must reject it before any codec allocation
    val crafted = png(-1, -1) // bytes 0xFFFFFFFF in both dim fields
    val ph = parseHeader(crafted)
    assert(ph.width == 0xFFFFFFFFL && ph.height == 0xFFFFFFFFL)
    assert(ph.width * ph.height < 0, "test premise: product wraps negative")
    assert(Multimodal.decodeFeatures(crafted, 8).toSeq ==
      Multimodal.decodeStub(crafted, 8).toSeq)
  }

  test("describeHeaders runs the parser distributed with the declared schema") {
    import spark.implicits._
    val rows = Seq(
      (1L, png(12, 34)), (2L, gif(5, 6)), (3L, wav(1, 16000)),
      (4L, jpeg(7, 8)), (5L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "blob")
    val out = Multimodal.describeHeaders(rows)
      .orderBy("media_id").collect()
    assert(out.map(_.getString(1)).toSeq ==
      Seq("png", "gif", "wav", "jpeg", "unknown"))
    assert(out(0).getLong(2) == 12L && out(0).getLong(3) == 34L)
    assert(out(2).getLong(4) == 1L && out(2).getLong(5) == 16000L)
    assert(!out(4).getBoolean(6))
  }
}
