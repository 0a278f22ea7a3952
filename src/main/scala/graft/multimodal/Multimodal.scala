package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed in per-partition batch kernels (`mapPartitions`
  * — the Scala analog of `mapInPandas` batch UDFs).
  *
  * CODECS: [[Multimodal.decodePpm]] (netpbm P6 — header + raw RGB plane)
  * and [[Multimodal.decodeWav]] (RIFF/WAVE PCM — chunk walk + fmt/data +
  * 16-bit samples) are REAL parsers (pure JVM, no native deps) anchoring
  * the image and audio ends of the codec surface with genuinely decoded
  * bytes. The remaining formats (JPEG/video) have no decoders in this
  * container, so their decode step is a clearly-marked deterministic
  * fake — a mod-prime byte hash standing in for the header parse.
  * Everything around both is real and load-bearing: binary schemas,
  * per-partition batching, frame explosion, fixed-dim embedding output
  * that feeds graft.similarity unchanged. Swapping `fakeDecode` for a
  * JNI/javacv call changes no plan shape — the two real codecs prove it,
  * being exactly such swaps.
  */
object Multimodal {

  val P = 1000000007L

  /** Rolling byte hash (== Dedup.charHashStr on ASCII payloads). */
  def byteHash(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) { acc = (acc * 31L + (bytes(i) & 0xffL)) % P; i += 1 }
    acc
  }

  /** STUB decode: deterministic pseudo-header from the payload hash. A real
    * implementation would parse the container format here (???-equivalent).
    */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Int, Long) = {
    val h = byteHash(payload)
    val width = (h % 1024L).toInt
    val height = ((h / 1024L) % 1024L).toInt
    (width, height, 3, payload.length.toLong)
  }

  /** A decoded netpbm P6 image: dims, declared maxval, and the raw
    * interleaved RGB plane (exactly width·height·3 bytes).
    */
  final case class PpmImage(width: Int, height: Int, maxval: Int,
                            pixels: Array[Byte])

  /** REAL codec (not a stub): binary PPM ("P6") decode — a pure-JVM parse
    * of the netpbm header (magic, whitespace, `#` comment lines, width,
    * height, maxval) followed by the raw interleaved RGB plane. PPM is the
    * one raster format decodable with zero native libraries, which makes
    * it the honest end of the codec surface: [[decodeMeta]]'s documented
    * stand-in covers formats whose decoders aren't in this sandbox, while
    * this path runs genuinely decoded pixel bytes through the same
    * batch-kernel plumbing. Returns None on anything malformed: wrong
    * magic, missing/oversized dims, maxval outside [1, 255] (2-byte-per-
    * sample PPMs are out of scope), or a truncated pixel plane.
    */
  def decodePpm(b: Array[Byte]): Option[PpmImage] = {
    var i = 0
    def skipWs(): Unit = {
      var go = true
      while (go && i < b.length) {
        val c = b(i)
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
        else go = false
      }
    }
    def readInt(): Int = { // -1 = malformed
      skipWs()
      var v = 0L
      var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10L + (b(i) - '0')
        any = true
        i += 1
        if (v > Int.MaxValue) return -1
      }
      if (any) v.toInt else -1
    }
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    i = 2
    val w = readInt()
    val h = readInt()
    val mv = readInt()
    if (w <= 0 || h <= 0 || mv < 1 || mv > 255) return None
    // exactly ONE whitespace byte separates the header from the plane
    // (the netpbm spec; more would be pixel data)
    if (i >= b.length || !(b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r'))
      return None
    i += 1
    val npix = w.toLong * h.toLong * 3L
    if (npix > Int.MaxValue || b.length - i < npix) return None
    Some(PpmImage(w, h, mv, java.util.Arrays.copyOfRange(b, i, i + npix.toInt)))
  }

  /** [[decodePpm]] as a batch kernel: appends a `ppm` struct (width,
    * height, maxval, pixel_sum — the unsigned sum of every channel byte,
    * the cheapest whole-plane statistic that proves the pixels were really
    * read). Rows whose payload fails to parse get a null struct instead of
    * poisoning the partition — the quarantine-not-crash discipline the
    * drift reader uses.
    */
  def decodePpmStats(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("ppm", StructType(Seq(
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("maxval", IntegerType, nullable = false),
        StructField("pixel_sum", LongType, nullable = false)))))
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.empty[Byte])
        val decoded = decodePpm(payload) match {
          case Some(img) =>
            var s = 0L
            var j = 0
            while (j < img.pixels.length) { s += (img.pixels(j) & 0xffL); j += 1 }
            Row(img.width, img.height, img.maxval, s)
          case None => null
        }
        Row.fromSeq(r.toSeq :+ decoded)
      }
    }(enc)
  }

  /** A decoded RIFF/WAVE PCM clip: format fields + the raw 16-bit samples. */
  final case class WavAudio(channels: Int, sampleRate: Int, bits: Int,
                            samples: Array[Short])

  /** REAL codec #2 (like [[decodePpm]], pure JVM): RIFF/WAVE PCM decode —
    * container header ("RIFF" + size + "WAVE"), a proper CHUNK WALK
    * (id + little-endian size + body, odd sizes padded to even, unknown
    * chunks skipped — real encoders emit LIST/INFO/junk chunks before
    * `data`), the `fmt ` chunk (PCM format code 1, mono/stereo channel
    * count, sample rate, bit depth), and the `data` chunk's samples as
    * signed 16-bit little-endian. Returns None on anything malformed:
    * wrong magic, truncated chunk, compressed format codes, non-16-bit
    * depth, or a data chunk not aligned to whole samples.
    */
  def decodeWav(b: Array[Byte]): Option[WavAudio] = {
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (i + 8 <= b.length) {
      val id = tag(i)
      val sz = u32(i + 4)
      if (sz < 0 || i + 8 + sz > b.length) return None
      if (id == "fmt ") {
        if (sz < 16) return None
        if (u16(i + 8) != 1) return None // PCM only; compressed codecs out of scope
        fmt = Some((u16(i + 10), u32(i + 12).toInt, u16(i + 22)))
      } else if (id == "data") data = Some((i + 8, sz.toInt))
      i += 8 + sz.toInt + (sz.toInt & 1) // RIFF chunks pad to even offsets
    }
    (fmt, data) match {
      case (Some((ch, rate, bits)), Some((off, len)))
          if bits == 16 && ch > 0 && rate > 0 && len % 2 == 0 =>
        val samples = new Array[Short](len / 2)
        var j = 0
        while (j < samples.length) {
          samples(j) = ((b(off + 2 * j) & 0xff) |
            (b(off + 2 * j + 1) << 8)).toShort
          j += 1
        }
        Some(WavAudio(ch, rate, 16, samples))
      case _ => None
    }
  }

  /** [[decodeWav]] as a batch kernel: appends a `wav` struct (channels,
    * sample_rate, n_samples, sum_abs — the summed absolute amplitude,
    * the cheapest whole-clip statistic that proves the samples were
    * really decoded). Malformed payloads get a null struct (quarantine,
    * not crash).
    */
  def decodeWavStats(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("wav", StructType(Seq(
        StructField("channels", IntegerType, nullable = false),
        StructField("sample_rate", IntegerType, nullable = false),
        StructField("n_samples", LongType, nullable = false),
        StructField("sum_abs", LongType, nullable = false)))))
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.empty[Byte])
        val decoded = decodeWav(payload) match {
          case Some(w) =>
            var s = 0L
            var j = 0
            while (j < w.samples.length) { s += math.abs(w.samples(j).toInt); j += 1 }
            Row(w.channels, w.sampleRate, w.samples.length.toLong, s)
          case None => null
        }
        Row.fromSeq(r.toSeq :+ decoded)
      }
    }(enc)
  }

  /** Frame-level energy over the REAL WAV decoder: cut each clip's
    * samples into `frame`-sample windows (last window may be short) and
    * emit one row per frame with its exact integer energy Σ s² — the
    * front-end of every silence-removal / voice-activity-detection
    * pass in an audio training pipeline. Runs in the same mapPartitions
    * kernel as the decode (no second pass over payload bytes, no sample
    * array ever leaves the task); malformed payloads contribute zero
    * rows (the decode gate q142 owns quarantine accounting).
    */
  def wavFrameEnergy(df: DataFrame, payloadCol: String,
                     frame: Int): DataFrame = {
    require(frame > 0, "frame size must be positive")
    val idx = df.schema.fieldIndex(payloadCol)
    val carry = df.schema.fields.zipWithIndex.filter(_._2 != idx)
    val schema = StructType(carry.map(_._1) ++ Seq(
      StructField("frame", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("energy", LongType, nullable = false)))
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val payload = Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.empty[Byte])
        decodeWav(payload) match {
          case Some(w) =>
            val base = carry.map { case (_, i) => r.get(i) }.toSeq
            (0 until (w.samples.length + frame - 1) / frame).iterator.map { f =>
              var e = 0L
              var j = f * frame
              val end = math.min(j + frame, w.samples.length)
              val n = end - j
              while (j < end) {
                val s = w.samples(j).toLong
                e += s * s
                j += 1
              }
              // Seq[Any] stops Scala's numeric harmonization from widening
              // the Int fields to Long (schema says INT for frame/n).
              Row.fromSeq(base ++ Seq[Any](f, n, e))
            }
          case None => Iterator.empty
        }
      }
    }(enc)
  }

  /** A decoded BMP: dims and the TOP-DOWN interleaved BGR plane
    * (exactly width·height·3 bytes, row padding stripped).
    */
  final case class BmpImage(width: Int, height: Int, pixels: Array[Byte])

  /** REAL codec #3: uncompressed 24-bit BMP (BITMAPINFOHEADER). Exercises
    * the three container behaviors PPM and WAV don't: an explicit data
    * OFFSET that must be honored (writers leave gaps — palette space,
    * alignment), 4-byte ROW PADDING that must be stripped, and BOTTOM-UP
    * row order (positive height) that must be flipped — a decoder that
    * ignores any of the three returns wrong bytes, not an error, which is
    * why the gate pins a corner pixel and position-dependent channel
    * sums. Negative height = top-down, also handled. None on anything
    * else: wrong magic, header size ≠ 40, planes ≠ 1, bpp ≠ 24,
    * compression ≠ BI_RGB, non-positive width, zero height, or a pixel
    * array that overruns the payload.
    */
  def decodeBmp(b: Array[Byte]): Option[BmpImage] = {
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    def s32(i: Int): Int = u32(i).toInt
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val off = u32(10)
    if (u32(14) != 40L) return None // BITMAPINFOHEADER only
    val w = s32(18)
    val hRaw = s32(22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0) return None
    if (u16(26) != 1 || u16(28) != 24 || u32(30) != 0L) return None
    // Stride and pixel-array size in LONG: a crafted header with
    // w > ~715M overflows 3*w in Int, making stride negative — the
    // bounds check below would pass and the allocation/arraycopy throw,
    // violating the quarantine-not-crash contract (ADVICE r6).
    val stride = (3L * w + 3) & ~3L
    if (w.toLong * h * 3 > Int.MaxValue) return None
    if (off < 54 || off + stride * h > b.length) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (bottomUp) h - 1 - y else y
      System.arraycopy(b, (off + srcRow * stride).toInt, out, y * w * 3, w * 3)
      y += 1
    }
    Some(BmpImage(w, h, out))
  }

  /** [[decodeBmp]] as a batch kernel: appends a `bmp` struct (width,
    * height, the top-left pixel's BGR — the orientation witness — and
    * per-channel sums, which shift if stride or offset are misparsed).
    * Malformed payloads get a null struct (quarantine, not crash).
    */
  def decodeBmpStats(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("bmp", StructType(Seq(
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("tl_b", IntegerType, nullable = false),
        StructField("tl_g", IntegerType, nullable = false),
        StructField("tl_r", IntegerType, nullable = false),
        StructField("sum_b", LongType, nullable = false),
        StructField("sum_g", LongType, nullable = false),
        StructField("sum_r", LongType, nullable = false)))))
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.empty[Byte])
        val decoded = decodeBmp(payload) match {
          case Some(img) =>
            val p = img.pixels
            var (sb, sg, sr) = (0L, 0L, 0L)
            var j = 0
            while (j < p.length) {
              sb += p(j) & 0xff; sg += p(j + 1) & 0xff; sr += p(j + 2) & 0xff
              j += 3
            }
            Row(img.width, img.height,
              p(0) & 0xff, p(1) & 0xff, p(2) & 0xff, sb, sg, sr)
          case None => null
        }
        Row.fromSeq(r.toSeq :+ decoded)
      }
    }(enc)
  }

  /** Decode metadata for a binary column → appends a typed `meta` struct
    * (width, height, channels, byte_len). Batch kernel, one pass.
    */
  def decodeMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("meta", StructType(Seq(
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("channels", IntegerType, nullable = false),
        StructField("byte_len", LongType, nullable = false)))))
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val (w, h, c, len) = fakeDecode(Option(payload).getOrElse(Array.empty))
        Row.fromSeq(r.toSeq :+ Row(w, h, c, len))
      }
    }(enc)
  }

  /** STUB resize: emits a `thumb` binary of exactly targetW×targetH bytes
    * derived deterministically from the payload (real: pixel resample).
    * Demonstrates binary-out batch processing with bounded output size.
    */
  def resizeStub(df: DataFrame, payloadCol: String,
                 targetW: Int, targetH: Int): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("thumb", BinaryType))
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.empty)
        val out = new Array[Byte](targetW * targetH)
        var i = 0
        while (i < out.length) {
          out(i) = if (payload.isEmpty) 0 else payload(i % payload.length)
          i += 1
        }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Perceptual average-hash (aHash) over a decoded PPM: the classic
    * image near-dup fingerprint — bit j is set iff the gray level of
    * pixel (j mod n_pix) exceeds the image's mean gray. All-integer to
    * keep the hash engine-exact: "gray" is the raw r+g+b channel sum and
    * the mean comparison is cross-multiplied (`gray·n_pix > total`), so
    * no division ever rounds. `bits` ≤ 60 keeps the hash a positive
    * long. Malformed payloads quarantine as null like every decoder
    * here.
    *
    * Production-shape notes: a real aHash first resamples to 8×8 — the
    * resample is a per-row kernel exactly like this one and changes
    * nothing about the distribution story. Equal-hash (or banded
    * Hamming, via [[graft.expressions.MinhashExpr]]'s band trick)
    * grouping then finds near-dup images with one narrow exchange of
    * (w, h, hash) — never pixels, never all-pairs.
    */
  def aHash(df: DataFrame, payloadCol: String, bits: Int = 60): DataFrame = {
    require(bits >= 1 && bits <= 60, s"bits must be in [1,60], got $bits")
    val schema = StructType(df.schema.fields :+ StructField("ahash", LongType))
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.empty[Byte])
        val h: Any = decodePpm(payload) match {
          case Some(img) if img.width > 0 && img.height > 0 =>
            val nPix = img.width * img.height
            val gray = new Array[Long](nPix)
            var tot = 0L
            var m = 0
            while (m < nPix) {
              val g = (img.pixels(3 * m) & 0xffL) +
                (img.pixels(3 * m + 1) & 0xffL) +
                (img.pixels(3 * m + 2) & 0xffL)
              gray(m) = g; tot += g; m += 1
            }
            var hash = 0L
            var j = 0
            while (j < bits) {
              if (gray(j % nPix) * nPix > tot) hash |= 1L << j
              j += 1
            }
            hash
          case _ => null
        }
        Row.fromSeq(r.toSeq :+ h)
      }
    }(enc)
  }

  /** Frame sampling: one output row per `frameSize`-byte window every
    * `stride` bytes (video frame / audio chunk sampling shape). Generator
    * semantics via flatMap — the multimodal analog of `explode`.
    */
  def frameSample(df: DataFrame, payloadCol: String,
                  frameSize: Int, stride: Int): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val payload = Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.empty)
        val n = if (payload.length < frameSize) 0 else (payload.length - frameSize) / stride + 1
        (0 until n).iterator.map { f =>
          Row.fromSeq(r.toSeq ++ Seq(f, payload.slice(f * stride, f * stride + frameSize)))
        }
      }
    }(enc)
  }

  /** STUB feature extraction: binary → fixed-dim Array[Float] embedding via
    * seeded mod-prime hashes, normalized to [0,1). Deterministic and
    * portable; output feeds graft.similarity (bucketNorm/ANN) unchanged.
    */
  def extractEmbedding(df: DataFrame, payloadCol: String, dim: Int): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("embedding", ArrayType(FloatType, containsNull = false)))
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.empty)
        val h = byteHash(payload)
        val emb = Array.tabulate(dim) { i =>
          val a = ((i + 1) * 2654435761L) % P
          val b = ((i + 1) * 1013904223L) % P
          (((a * h + b) % P).toDouble / P).toFloat
        }
        Row.fromSeq(r.toSeq :+ emb.toSeq)
      }
    }(enc)
  }
}
