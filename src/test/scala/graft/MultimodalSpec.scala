package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def media = Seq(
    (1L, "abcdefghij".getBytes("UTF-8")),
    (2L, Array.fill[Byte](250)(7)),
    (3L, Array.emptyByteArray)).toDF("media_id", "payload")

  test("decodeMeta appends a typed meta struct, null/empty-safe") {
    val out = Multimodal.decodeMeta(media, "payload")
    assert(out.schema("meta").dataType.typeName == "struct")
    val r = out.filter($"media_id" === 1L).select("meta.width", "meta.height", "meta.byte_len").head()
    assert(r.getInt(0) >= 0 && r.getInt(0) < 1024)
    assert(r.getLong(2) == 10L)
    assert(out.filter($"media_id" === 3L).select("meta.byte_len").head().getLong(0) == 0L)
  }

  test("decodeMeta is deterministic across runs") {
    val a = Multimodal.decodeMeta(media, "payload").select("media_id", "meta.width").collect()
    val b = Multimodal.decodeMeta(media, "payload").select("media_id", "meta.width").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("resizeStub emits exactly targetW*targetH bytes") {
    val out = Multimodal.resizeStub(media, "payload", 8, 4)
    out.select(length($"thumb")).collect().foreach(r => assert(r.getInt(0) == 32))
  }

  test("frameSample emits floor((len-frame)/stride)+1 frames of frameSize bytes") {
    val out = Multimodal.frameSample(media, "payload", frameSize = 100, stride = 50)
    // id=2: len 250 → (250-100)/50+1 = 4 frames; id=1 (10B) and id=3 (0B): none
    assert(out.filter($"media_id" === 2L).count() == 4)
    assert(out.filter($"media_id" =!= 2L).count() == 0)
    out.filter($"media_id" === 2L).select(length($"frame")).collect()
      .foreach(r => assert(r.getInt(0) == 100))
  }

  test("decodePpm parses a real P6 image: header, comments, pixel plane") {
    val pixels = Array.tabulate(2 * 3 * 3)(i => (i * 11 % 256).toByte)
    val img = ("P6\n# a comment\n2 3\n# another\n255\n".getBytes("US-ASCII")
      ++ pixels)
    val out = Multimodal.decodePpm(img).get
    assert(out.width == 2 && out.height == 3 && out.maxval == 255)
    assert(out.pixels.toSeq == pixels.toSeq)
    // trailing junk after the plane is ignored (netpbm readers do)
    assert(Multimodal.decodePpm(img ++ Array[Byte](1, 2, 3)).isDefined)
  }

  test("decodePpm rejects malformed payloads instead of crashing") {
    val ok = "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    assert(Multimodal.decodePpm(ok).isDefined)
    // wrong magic (P5 = grayscale), truncated plane, maxval out of range,
    // missing dims, empty payload
    assert(Multimodal.decodePpm("P5\n1 1\n255\n".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodePpm("P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](9)).isEmpty)
    assert(Multimodal.decodePpm(("P6\n1 1\n65536\n" + "x" * 3).getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodePpm("P6\n\n".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodePpm(Array.empty[Byte]).isEmpty)
  }

  test("decodePpmStats kernel: real decode per row, null struct on junk") {
    val px = Array.tabulate(1 * 2 * 3)(i => (i + 10).toByte)
    val rows = Seq(
      (1L, "P6\n1 2\n255\n".getBytes("US-ASCII") ++ px),
      (2L, "not an image".getBytes("US-ASCII")))
    val df = rows.toDF("media_id", "payload")
    val out = Multimodal.decodePpmStats(df, "payload")
      .select($"media_id", $"ppm.width", $"ppm.pixel_sum").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getLong(2)))))
      .toMap
    assert(out(1L) == Some((1, px.map(_ & 0xff).sum.toLong)))
    assert(out(2L).isEmpty)
  }

  test("aHash: hand-computed bits over a real PPM; wraps past n_pix; null on junk") {
    // 1x2 image, grays: pixel0 = 10+11+12 = 33, pixel1 = 100+101+102 = 303.
    // total = 336, nPix = 2: bit j set iff gray(j%2)*2 > 336 -> odd j only.
    val px = Array[Byte](10, 11, 12, 100, 101, 102)
    val rows = Seq(
      (1L, "P6\n1 2\n255\n".getBytes("US-ASCII") ++ px),
      (2L, "junk".getBytes("US-ASCII")))
    val out = Multimodal.aHash(rows.toDF("media_id", "payload"), "payload", bits = 6)
      .select($"media_id", $"ahash").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // odd bits of 6: 0b101010 = 42
    assert(out(1L) == Some(42L))
    assert(out(2L).isEmpty)
  }

  test("decodeWav: real RIFF walk — junk chunks skipped, malformed rejected") {
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(k => ((v >> (8 * k)) & 0xff).toByte).toArray
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le(body.length.toLong, 4) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def fmt(code: Int, ch: Int, rate: Int, bits: Int): Array[Byte] =
      le(code.toLong, 2) ++ le(ch.toLong, 2) ++ le(rate.toLong, 4) ++
        le(rate.toLong * ch * bits / 8, 4) ++ le(ch.toLong * bits / 8, 2) ++
        le(bits.toLong, 2)
    def wav(chunks: Array[Byte]*): Array[Byte] = {
      val body = "WAVE".getBytes("US-ASCII") ++ chunks.flatten
      "RIFF".getBytes("US-ASCII") ++ le(body.length.toLong, 4) ++ body
    }
    val samples = Array[Short](100, -200, 32767, -32768, 0)
    val data = samples.flatMap(s => le((s.toInt & 0xffff).toLong, 2))
    // junk chunk with ODD size before data: the walk must pad to even
    val good = wav(chunk("fmt ", fmt(1, 1, 8000, 16)),
      chunk("junk", Array[Byte](1, 2, 3)), chunk("data", data))
    val w = Multimodal.decodeWav(good).get
    assert(w.channels == 1 && w.sampleRate == 8000 && w.bits == 16)
    assert(w.samples.toSeq == samples.toSeq)
    // stereo decodes too
    assert(Multimodal.decodeWav(
      wav(chunk("fmt ", fmt(1, 2, 44100, 16)), chunk("data", data ++ data)))
      .exists(x => x.channels == 2 && x.samples.length == 10))
    // rejected: compressed format code, 8-bit depth, truncated data, bad magic
    assert(Multimodal.decodeWav(
      wav(chunk("fmt ", fmt(85, 1, 8000, 16)), chunk("data", data))).isEmpty)
    assert(Multimodal.decodeWav(
      wav(chunk("fmt ", fmt(1, 1, 8000, 8)), chunk("data", data))).isEmpty)
    assert(Multimodal.decodeWav(good.dropRight(3)).isEmpty)
    assert(Multimodal.decodeWav("RIFX1234WAVE".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodeWav(Array.empty[Byte]).isEmpty)
  }

  test("decodeBmp: offset gap honored, padding stripped, bottom-up flipped") {
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(k => ((v >> (8 * k)) & 0xff).toByte).toArray
    // 2x2, 24bpp: stride = 8 (2 pad bytes of 0xAA), 4-byte gap before
    // pixels. Logical pixels (y,x) -> BGR = (10y+x, 100+10y+x, 200+10y+x);
    // stored bottom-up: file row 0 = logical row 1.
    def px(y: Int, x: Int): Array[Byte] =
      Array((10 * y + x).toByte, (100 + 10 * y + x).toByte,
        (200 + 10 * y + x).toByte)
    val pad = Array(0xAA.toByte, 0xAA.toByte)
    val gap = Array[Byte](0xDE.toByte, 0xAD.toByte, 0xBE.toByte, 0xEF.toByte)
    def header(w: Int, h: Int, off: Int, size: Int): Array[Byte] =
      "BM".getBytes("US-ASCII") ++ le(size.toLong, 4) ++ le(0L, 4) ++
        le(off.toLong, 4) ++ le(40L, 4) ++ le(w.toLong, 4) ++
        le(h.toLong, 4) ++ le(1L, 2) ++ le(24L, 2) ++ le(0L, 4) ++
        le(16L, 4) ++ le(2835L, 4) ++ le(2835L, 4) ++ le(0L, 4) ++ le(0L, 4)
    val rows = (px(1, 0) ++ px(1, 1) ++ pad) ++ (px(0, 0) ++ px(0, 1) ++ pad)
    val good = header(2, 2, 58, 58 + 16) ++ gap ++ rows
    val img = Multimodal.decodeBmp(good).get
    assert(img.width == 2 && img.height == 2)
    // top-down logical order, padding gone
    assert(img.pixels.toSeq ==
      (px(0, 0) ++ px(0, 1) ++ px(1, 0) ++ px(1, 1)).toSeq)
    // negative height = already top-down
    val td = header(2, 2, 58, 58 + 16).clone()
    le(-2L & 0xffffffffL, 4).copyToArray(td, 22)
    val imgTd = Multimodal.decodeBmp(td ++ gap ++
      (px(0, 0) ++ px(0, 1) ++ pad) ++ (px(1, 0) ++ px(1, 1) ++ pad)).get
    assert(imgTd.pixels.toSeq == img.pixels.toSeq)
    // rejected: truncated pixel array, bad magic, 32bpp, compressed
    assert(Multimodal.decodeBmp(good.dropRight(3)).isEmpty)
    assert(Multimodal.decodeBmp("XX".getBytes ++ good.drop(2)).isEmpty)
    // crafted giant width: 3*w overflows Int (stride would go negative
    // and the bounds check would pass) — must quarantine, not throw
    // (ADVICE r6); same for a w*h pixel count past Int.MaxValue
    val wide = good.clone(); le(0x30000000L, 4).copyToArray(wide, 18)
    assert(Multimodal.decodeBmp(wide).isEmpty)
    val big = good.clone()
    le(70000L, 4).copyToArray(big, 18); le(70000L, 4).copyToArray(big, 22)
    assert(Multimodal.decodeBmp(big).isEmpty)
    val bpp32 = good.clone(); bpp32(28) = 32.toByte
    assert(Multimodal.decodeBmp(bpp32).isEmpty)
    val comp = good.clone(); comp(30) = 1.toByte
    assert(Multimodal.decodeBmp(comp).isEmpty)
    assert(Multimodal.decodeBmp(Array.empty[Byte]).isEmpty)
  }

  test("extractEmbedding yields fixed-dim [0,1) floats that feed similarity ops") {
    val out = Multimodal.extractEmbedding(media, "payload", 16)
    out.select($"embedding").collect().foreach { r =>
      val e = r.getSeq[Float](0)
      assert(e.length == 16)
      assert(e.forall(v => v >= 0.0f && v < 1.0f))
    }
    // composes with the ANN path unchanged
    val ann = graft.similarity.Similarity.bruteForceTopK(
      out.select($"media_id", $"embedding"),
      out.select($"media_id", $"embedding").filter($"media_id" === 1L),
      "media_id", "embedding", 2, dim = 16)
    assert(ann.count() == 2)
  }
}
