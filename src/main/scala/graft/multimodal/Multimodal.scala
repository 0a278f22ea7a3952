package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed in per-partition batch kernels (`mapPartitions`
  * — the Scala analog of `mapInPandas` batch UDFs).
  *
  * STUBBED CODECS: this container has no image/audio libraries, so the
  * decode step is a clearly-marked deterministic fake — a mod-prime byte
  * hash standing in for a real header parse. Everything around it is real
  * and load-bearing: binary schemas, per-partition batching, frame
  * explosion, fixed-dim embedding output that feeds graft.similarity
  * unchanged. Swapping `fakeDecode` for a JNI/javacv call changes no plan
  * shape.
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
