package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, attach the single NEWEST
  * right row whose timestamp is ≤ the left row's, equi-matched on a key —
  * "the engagement count / model score / price as it was known at event
  * time". This is the backfill join every training-data pipeline needs
  * (feature attribution without future leakage) and the time-series form
  * of the reference's refresh join (`reddit/lambda_function_aggregate
  * .py:59-71` re-crawled engagement attached to each post's state at
  * read time).
  *
  * Spark has no native ASOF JOIN. The composable forms are (a) a range
  * join (explodes: every left row × every earlier right row, then argmax
  * — quadratic per key) or (b) THIS: union both sides tagged, ONE hash
  * shuffle on the key, per-key sort by (ts, side), and a running
  * `last(_, ignoreNulls = true)` carry-forward of the right row as ONE
  * struct. Each row is touched once, state is the sort run — the
  * kdb/Flink as-of shape, linear at any key cardinality and robust to
  * hot keys (a key's whole history sorts within one partition but never
  * cross-products).
  *
  * The whole right row travels as a single struct, so the carried match
  * is always ONE physical right row: a genuinely-NULL payload value in
  * the newest right row stays null (it is not papered over by an older
  * row's value), multiple payload columns can never mix rows, and the
  * tolerance check applies to the same row the payload came from —
  * exactly DuckDB's native ASOF JOIN semantics, which gate this operator
  * (q133/q134).
  *
  * Semantics:
  *  - right rows at EXACTLY the left timestamp DO match (≤, not <);
  *  - ties among right rows on (key, ts) resolve to the row greatest in
  *    `rightOrder` (lexicographic); with no `rightOrder` the pick among
  *    exact duplicates is partition-order-dependent — pass a unique
  *    column (an id) when the right side can carry (key, ts) duplicates;
  *  - unmatched left rows keep null right columns (left-outer);
  *  - `toleranceMicros` (q134) voids matches older than the horizon:
  *    too-stale right state reads as absent, exactly how a feature-store
  *    TTL behaves.
  */
object AsofJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side; its non-key, non-ts columns
    *                   are appended to every matched left row
    * @param keys       equi-join key columns (same names both sides)
    * @param leftTs     left event-time column (micros or any orderable)
    * @param rightTs    right event-time column, same unit as `leftTs`
    * @param rightCols  right payload columns to carry (default: all
    *                   non-key, non-ts columns of `right`)
    * @param toleranceMicros match horizon: a right row older than
    *                   `leftTs - tolerance` is treated as absent
    * @param rightOrder tie-break columns among right rows sharing
    *                   (keys, ts): the row greatest in this order wins
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightCols: Seq[String] = Nil,
               toleranceMicros: Option[Long] = None,
               rightOrder: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one equi-key")
    val payload =
      if (rightCols.nonEmpty) rightCols
      else right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTs)
    require(payload.nonEmpty, "right side has no payload columns to carry")
    require(rightOrder.forall(right.columns.contains),
      s"rightOrder must name right-side columns: ${rightOrder.filterNot(right.columns.contains)}")
    val leftCols = left.columns.toSeq
    require(payload.forall(!leftCols.contains(_)),
      s"right payload collides with left columns: ${payload.filter(leftCols.contains)}")
    // The tagged-union plan owns a small reserved namespace; an input
    // column shadowing one would be silently overwritten (or, for the
    // asof_<rightTs> output, silently duplicated in the result schema).
    val reserved = Set("__ts", "__side", "__r", "__c", "__rts")
    val offenders = (leftCols ++ payload)
      .filter(c => reserved(c) || c.startsWith("__o_"))
    require(offenders.isEmpty,
      s"asofJoin reserves __ts/__side/__r/__c/__rts/__o_* internally; " +
        s"rename input columns: ${offenders.distinct}")
    require(!(leftCols ++ payload).contains(s"asof_$rightTs"),
      s"asofJoin appends output column asof_$rightTs; an input column " +
        "with that name would duplicate it — rename one")

    // The matched right row rides as ONE struct (payload + its own ts).
    def rStruct(src: String => Column): Column =
      struct(payload.map(c => src(c).as(c)) :+ src(rightTs).as("__rts"): _*)
    val nullOrd = rightOrder.map(c =>
      lit(null).cast(right.schema(c).dataType).as(s"__o_$c"))
    // Tagged union: right rows sort BEFORE left rows at an equal
    // timestamp (side 0 < 1), which encodes the ≤ match. A right row
    // with a NULL timestamp can match nothing (`ts >= NULL` is never
    // true — DuckDB ASOF agrees) and must be dropped here: ascending
    // sort would otherwise place it FIRST in every key's window and make
    // it the baseline carried state for every left row.
    val rNonNullTs = right.filter(col(rightTs).isNotNull)
    val r = rNonNullTs.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        rStruct(col).as("__r")) ++
        rightOrder.map(c => col(c).as(s"__o_$c")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        lit(null).cast(r.schema("__r").dataType).as("__r")) ++
        nullOrd ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col("__ts") +: col("__side") +:
        rightOrder.map(c => col(s"__o_$c"))): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .select(col("*"), last(col("__r"), ignoreNulls = true).over(w).as("__c"))
    val matched = toleranceMicros match {
      case Some(tol) =>
        col("__c").isNotNull && (col("__ts") - col("__c").getField("__rts") <= tol)
      case None => col("__c").isNotNull
    }
    carried.filter(col("__side") === 1)
      .select((keys.map(col) :+ col("__ts").as(leftTs)) ++
        leftCols.filterNot(c => keys.contains(c) || c == leftTs).map(col) ++
        payload.map(c => when(matched, col("__c").getField(c)).as(c)) :+
        when(matched, col("__c").getField("__rts")).as(s"asof_$rightTs"): _*)
  }
}
