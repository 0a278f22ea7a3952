package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter building as a partial-aggregable Aggregator — the engine
  * behind per-file bloom skip indexes ([[graft.sources.DataSkipping
  * .buildBloomManifest]]): one bloom per group (file), built map-side and
  * merged by bitwise OR, so the shuffle carries one fixed-size bit array
  * per group instead of the key stream. Spark's own `stat.bloomFilter`
  * collects the filter to the driver; this form leaves it in the frame as
  * a column, which is what a manifest writer needs.
  *
  * The filter rides Spark's `org.apache.spark.util.sketch.BloomFilter`
  * (java-serialized between partial and final — one buffer per group, the
  * CountMinAgg cost model). `finish` emits the portable serialized form
  * (`BloomFilter.writeTo`), readable back with [[BloomAgg.mightContain]].
  *
  * Callers filter nulls out first — a bloom has no null slot.
  */
class BloomSketch(expected: Long, fpp: Double)
    extends Aggregator[Long, BloomFilter, Array[Byte]] {
  require(expected > 0 && fpp > 0 && fpp < 1, "need expected > 0, fpp in (0,1)")

  override def zero: BloomFilter = BloomFilter.create(expected, fpp)
  override def reduce(b: BloomFilter, x: Long): BloomFilter = {
    b.putLong(x); b
  }
  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b); a
  }
  override def finish(b: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }
  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization(classOf[BloomFilter])
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomAgg {
  /** `bloom(expected, fpp)(keyCol)` aggregate column: the serialized
    * bloom filter over the group's long keys.
    */
  def bloom(expected: Long, fpp: Double)(key: Column): Column =
    udaf(new BloomSketch(expected, fpp), ExpressionEncoder[Long]()).apply(key)

  /** Membership probe against a serialized filter: false = provably
    * absent; true = present or a false positive (rate ≤ fpp).
    */
  def mightContain(bytes: Array[Byte], key: Long): Boolean =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes)).mightContainLong(key)
}
