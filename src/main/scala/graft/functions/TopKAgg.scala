package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Partial-aggregating per-group top-k — the scale-correct form of
  * "rank() ≤ k per group".
  *
  * The window idiom (`row_number over (partition by g order by v desc)
  * ≤ k`) shuffles EVERY row to its group's reducer and sorts the whole
  * group — at 100 TB that is a full-table exchange plus an O(n log n)
  * sort to keep k rows. This aggregator keeps a bounded sorted buffer of
  * k entries, so the map side combines first: each map task contributes
  * at most k rows per group to the exchange, and the reducer merges
  * k-bounded buffers. Same result, shuffle shrunk by ~|group|/k.
  *
  * Determinism: ordered by (value DESC, id ASC) — ties always resolve to
  * the smaller id, which is what the SQL oracle's ORDER BY mirrors.
  * The buffer is a plain Seq of a flat case class, so it rides Spark's
  * typed-aggregate serialization (ObjectHashAggregate); the codegen loss
  * vs HashAggregate is the price of object buffers and is dwarfed by the
  * shuffle reduction at scale.
  */
case class TopKEntry(v: Long, id: Long)

class TopKByValue(k: Int) extends Aggregator[TopKEntry, Seq[TopKEntry], Seq[TopKEntry]] {
  require(k > 0, "k must be positive")

  private def lt(a: TopKEntry, b: TopKEntry): Boolean =
    a.v > b.v || (a.v == b.v && a.id < b.id)

  override def zero: Seq[TopKEntry] = Nil

  override def reduce(buf: Seq[TopKEntry], x: TopKEntry): Seq[TopKEntry] = {
    // buf is sorted best-first and ≤ k long; skip when x can't enter.
    if (buf.length == k && !lt(x, buf.last)) buf
    else {
      val (before, after) = buf.span(e => lt(e, x))
      (before ++ (x +: after)).take(k)
    }
  }

  override def merge(a: Seq[TopKEntry], b: Seq[TopKEntry]): Seq[TopKEntry] = {
    // merge of two sorted k-bounded buffers
    val out = Seq.newBuilder[TopKEntry]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && lt(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[TopKEntry]): Seq[TopKEntry] = buf
  override def bufferEncoder: Encoder[Seq[TopKEntry]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TopKEntry]] = ExpressionEncoder()
}

object TopKAgg {
  /** `top_k(valueCol, idCol)` aggregate column: array of (v, id) structs,
    * best-first, ≤ k per group. Explode with `posexplode` for ranked rows.
    */
  def topK(k: Int, value: Column, id: Column): Column =
    udaf(new TopKByValue(k), ExpressionEncoder[TopKEntry]()).apply(value, id)
}
