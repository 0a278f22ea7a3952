package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values / bottom-k theta) distinct-count sketch.
  *
  * Keeps the k smallest DISTINCT hash values seen; the k-th smallest
  * order statistic estimates cardinality as (k-1)·M / h_k over a hash
  * range [0, M). Unlike HLL, two KMV sketches support SET OPERATIONS:
  * union = k smallest of the merged sketches, and intersection via the
  * Jaccard fraction observed inside the merged sketch — the estimator
  * behind "how many users did A and B share" without a key-level join
  * (Beyer et al., SIGMOD'07; the same mathematics as the theta sketch).
  *
  * Scale shape: a bounded sorted buffer rides ObjectHashAggregate with
  * map-side partial merge — the shuffle carries ≤ k longs per group, the
  * input needs NO pre-distinct (duplicate hashes collapse in-buffer).
  * That is the 100 TB form of `COUNT(DISTINCT x)` set algebra: one pass,
  * no exchange of the key universe.
  *
  * Determinism: the buffer is a pure function of the input SET (sorted
  * ascending, duplicates dropped, capped at k smallest) — partitioning
  * and arrival order cannot change it, so a DuckDB oracle replaying the
  * same portable hash + ORDER BY h LIMIT k reproduces it exactly.
  *
  * Input protocol: hashes are non-negative (charHash range is
  * [0, 1e9+7)); a NEGATIVE input is "skip this row", which lets callers
  * feed `coalesce(when(cond, h), lit(-1L))` for filtered sketches
  * without a separate pass.
  */
class KmvSketch(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 1, "k must be > 1 (the estimator divides by the k-th min)")

  override def zero: Seq[Long] = Nil

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = {
    if (h < 0L) buf
    else if (buf.length == k && h >= buf.last) buf // can't enter a full sketch
    else {
      val (lo, hi) = buf.span(_ < h)
      if (hi.nonEmpty && hi.head == h) buf // already present
      else (lo ++ (h +: hi)).take(k)
    }
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    // merge two sorted distinct k-bounded buffers, keep k smallest
    val out = Seq.newBuilder[Long]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.length || j < b.length)) {
      if (j >= b.length) { out += a(i); i += 1; n += 1 }
      else if (i >= a.length) { out += b(j); j += 1; n += 1 }
      else if (a(i) < b(j)) { out += a(i); i += 1; n += 1 }
      else if (a(i) > b(j)) { out += b(j); j += 1; n += 1 }
      else { out += a(i); i += 1; j += 1; n += 1 } // equal: take once
    }
    out.result()
  }

  override def finish(buf: Seq[Long]): Seq[Long] = buf
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object KmvAgg {
  /** Hash modulus shared with [[graft.expressions.CharHash]] / the oracle. */
  val M: Long = 1000000007L

  /** `kmv(k)(hashCol)` aggregate column: sorted array of the k smallest
    * distinct non-negative hashes in the group.
    */
  def kmv(k: Int)(hash: Column): Column =
    udaf(new KmvSketch(k), ExpressionEncoder[Long]()).apply(hash)

  /** Cardinality estimate from a KMV sketch array (exact when the set had
    * fewer than k members, else the k-th-min order statistic). Integer
    * arithmetic end to end so an oracle replays it bit-for-bit.
    */
  def estimate(k: Int, sketch: Column): Column = {
    import org.apache.spark.sql.functions._
    // IntegralDivide, not floor(double/double): (k-1)·M ≈ 2.6e11 is exact
    // in long; the double quotient could round differently than the oracle.
    when(size(sketch) < k, size(sketch).cast("long"))
      .otherwise(call_function("div",
        lit((k - 1).toLong * M), element_at(sketch, k).cast("long")))
  }
}
