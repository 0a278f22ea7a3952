package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch as a mergeable Spark aggregate — the fixed-size
  * frequency summary for streams/corpora whose key cardinality dwarfs
  * memory (Cormode–Muthukrishnan, "An improved data stream summary: the
  * count-min sketch and its applications", J. Algorithms 2005).
  *
  * depth×width long counters; each update increments one counter per row
  * (pairwise-independent hash per row), a point estimate is the MIN over
  * the depth rows. Estimates never undercount; they overcount by at most
  * ≈ e·N/width with probability 1 − e^(−depth).
  *
  * Scale shape: the buffer is a bounded artifact (depth·width longs, e.g.
  * 32 KiB at 4×1024) independent of N — partial sketches combine on the
  * map side and MERGE IS ELEMENTWISE SUM, so a 100 TB scan shuffles one
  * sketch per (group × map task), never the keys. The same property makes
  * it a streaming state candidate and a cross-day rollup (sketches of
  * daily partitions sum into the monthly sketch without re-scanning).
  *
  * Determinism: hashes are fixed odd multipliers mod a Mersenne prime —
  * same data → same sketch at any partitioning (sums commute).
  *
  * Null keys are SKIPPED (the boxed-Long input encoder carries them
  * through to `reduce`, which ignores them) — the SQL-aggregate
  * convention `count(col)` follows. Callers who need nulls counted
  * should coalesce to a sentinel key before sketching.
  */
class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
  require(depth > 0 && depth <= CountMin.MaxDepth, s"depth in [1, ${CountMin.MaxDepth}]")
  require(width > 1, "width must exceed 1")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], key: java.lang.Long): Array[Long] = {
    if (key == null) return buf
    var d = 0
    while (d < depth) {
      buf(d * width + CountMin.slot(d, key.longValue(), width)) += 1L
      d += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object CountMin {
  val MaxDepth = 8

  /** Fixed per-row hash constants (odd multipliers, arbitrary but frozen —
    * changing them invalidates persisted sketches).
    */
  private val A = Array(0x9e3779b1L, 0x85ebca77L, 0xc2b2ae3dL, 0x27d4eb2fL,
    0x165667b1L, 0xd3a2646dL, 0xfd7046c5L, 0xb55a4f09L)
  private val B = Array(0x5bd1e995L, 0x1b873593L, 0xcc9e2d51L, 0x38b34ae5L,
    0xa1e38b93L, 0x9c0c2e57L, 0x79b9f3abL, 0x6c62272eL)
  private val P = 2147483647L // 2^31 − 1

  /** Row-d counter slot for `key` — shared by the update path and the
    * literal-probe estimate so they can never disagree. The key folds
    * into [0, P) BEFORE the multiply: A(d) < 2^32 and (key mod P) < 2^31,
    * so the product stays inside a signed 64-bit long — no silent wrap
    * for snowflake-scale ids, the (a·k+b) mod p family keeps its
    * pairwise-independence bound.
    */
  def slot(d: Int, key: Long, width: Int): Int = {
    val k = java.lang.Math.floorMod(key, P)
    (((A(d) * k + B(d)) % P) % width).toInt
  }

  /** `count_min(keyCol)` aggregate column: the depth×width sketch as one
    * flat array<bigint> (row-major). Null keys are skipped, not counted
    * (see [[CountMinAgg]]).
    */
  def sketch(depth: Int, width: Int)(key: Column): Column =
    udaf(new CountMinAgg(depth, width), Encoders.LONG).apply(key)

  /** Point estimate of a LITERAL key from a sketch column: min over the
    * depth rows (slots resolve at plan time — pure element_at/least,
    * fully codegen'd).
    */
  def estimate(sk: Column, key: Long, depth: Int, width: Int): Column = {
    val cells = (0 until depth).map(d =>
      element_at(sk, d * width + slot(d, key, width) + 1))
    if (cells.length == 1) cells.head else least(cells: _*)
  }
}
