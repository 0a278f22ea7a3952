package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over per-key timelines — the gaps-and-islands family.
  *
  * The reference's pipelines reason about activity in time windows (15-min
  * crawl cadence, session gaps); the natural next operator a warehouse user
  * reaches for is interval COALESCING: merge overlapping/adjacent validity
  * intervals per key into maximal covered spans (the "islands"), then measure
  * coverage. Classic uses in a training-data pipeline: merging rate-limit /
  * outage windows before attributing scrape gaps, collapsing per-shard
  * ingestion leases into effective coverage, and computing per-user active
  * time without double-counting concurrent activity.
  *
  * Scale shape: one `Window.partitionBy(key).orderBy(start, tiebreak)` sort
  * per key — the same single-exchange shape as [[CoreOps.sessionize]]; no
  * self-join, no explode of the timeline. A running `max(end)` over the
  * preceding frame detects island starts (an interval starts a new island
  * iff its start exceeds every previous end), and a running sum of the
  * starts numbers the islands. Parallelism = key cardinality (users), which
  * is the natural distribution axis at 100 TB; a single pathological key
  * degrades to one task but stays linear.
  */
object Intervals {

  /** Assign each interval its island id (1-based per key) and expose the
    * running covered-end. Intervals are `[startSec, endSec]` closed; two
    * intervals belong to one island when they overlap or touch
    * (`next.start <= max(prev.end)`).
    *
    * `tiebreak` makes the sort total so island numbering is deterministic
    * under any partitioning (required for the exact-hash oracle gate).
    */
  def islandIds(df: DataFrame, key: String, startSec: Column, endSec: Column,
                tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(startSec, tiebreak)
    // Running max of end over STRICTLY preceding rows: null on the first row.
    val prevCovered = max(endSec)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val isNew = when(prevCovered.isNull || startSec > prevCovered, lit(1L))
      .otherwise(lit(0L))
    df.withColumn("__start", startSec)
      .withColumn("__end", endSec)
      .withColumn("island_id",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Coalesce per-key intervals into maximal islands: one row per
    * (key, island_id) with the island's span `[island_start, island_end]`
    * and the number of source intervals merged into it.
    */
  def coalesce(df: DataFrame, key: String, startSec: Column, endSec: Column,
               tiebreak: Column): DataFrame =
    islandIds(df, key, startSec, endSec, tiebreak)
      .groupBy(col(key), col("island_id"))
      .agg(min(col("__start")).as("island_start"),
        max(col("__end")).as("island_end"),
        count(lit(1)).as("n_intervals"))

  /** Per-key coverage rollup over the coalesced islands: island count,
    * total covered seconds (no double-counting of overlaps), and the longest
    * single island. The per-island agg is partial-aggregable; the per-key
    * rollup re-keys on `key` alone — both exchanges are narrow (key + 3
    * longs on the wire).
    */
  def coverage(df: DataFrame, key: String, startSec: Column, endSec: Column,
               tiebreak: Column): DataFrame =
    coalesce(df, key, startSec, endSec, tiebreak)
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("island_end") - col("island_start")).as("covered_secs"),
        max(col("island_end") - col("island_start")).as("max_island_secs"),
        sum(col("n_intervals")).as("n_intervals"))

  /** Time-weighted mean of a step function: each observation's value holds
    * until the key's next observation; the last observation of a key holds
    * for zero time and contributes nothing (no extrapolation beyond the
    * observed timeline). Exact under the integer gate: the caller passes an
    * integer-unit `valueUnits` (e.g. cents); the result keeps the weighted
    * sum and the total held seconds as exact longs, leaving the division to
    * the reader — associative, partition-order-free.
    *
    * Scale shape: one `lead` window per key (single exchange), then a plain
    * partial-aggregable sum — the canonical way to integrate a step series
    * without a range self-join.
    */
  def timeWeightedSum(df: DataFrame, key: String, tsSec: Column,
                      valueUnits: Column, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(tsSec, tiebreak)
    val heldSecs = lead(tsSec, 1).over(w) - tsSec
    df.select(col(key), valueUnits.as("__v"), heldSecs.as("__held"))
      .filter(col("__held").isNotNull)
      .groupBy(col(key))
      .agg(sum(col("__v") * col("__held")).as("weighted_sum_units"),
        sum(col("__held")).as("held_secs"))
  }

  /** Time-grid gap-fill with forward-fill — the resampling step every
    * point-in-time reporting pipeline needs (daily balance snapshots,
    * sensor grids): one row per (key, slot) for every slot in
    * [minSlot, maxSlot], carrying the key's last observed value at or
    * before that slot.
    *
    * `df` must hold ≤ 1 row per (key, slot) — collapse multi-event slots
    * first (e.g. latest-wins per slot) so "the value at slot t" is
    * well-defined. Returns (key, slot, observed, filled): `observed` is
    * the slot's own value (null for gap slots), `filled` the
    * forward-filled one (null until the key's first observation).
    * Observations BEFORE `minSlot` seed the fill (the key's latest
    * pre-grid value carries into every grid slot until its first in-grid
    * observation) without appearing as `observed`; observations after
    * `maxSlot` are dropped — the grid is a hard horizon.
    *
    * Scale shape: the dense grid is `explode(sequence(...))` over the
    * DISTINCT key list — generated, never shuffled in from a table — and
    * the fill is ONE `last(ignoreNulls) over (key, slot rows unbounded
    * preceding)` window, i.e. a single keyed exchange + per-key sort of
    * (slots) rows. Slot count is the caller's grid resolution: bound it
    * (slots per key, not corpus size) exactly as a real resampler does.
    */
  def gapFill(df: DataFrame, key: String, slotCol: String, valCol: String,
              minSlot: Long, maxSlot: Long): DataFrame = {
    require(maxSlot >= minSlot, "empty slot range")
    val grid = df.select(col(key)).distinct()
      .select(col(key), explode(expr(s"sequence(${minSlot}L, ${maxSlot}L)")).as("slot"))
    val inGrid = df.filter(col(slotCol).between(minSlot, maxSlot))
      .select(col(key), col(slotCol).as("slot"), col(valCol).as("observed"))
    // Latest pre-grid observation per key seeds the fill (max_by on the
    // original slot) — one partial-aggregable groupBy over only the
    // pre-grid rows, never the corpus.
    val seed = df.filter(col(slotCol) < minSlot && col(valCol).isNotNull)
      .groupBy(col(key))
      .agg(max(struct(col(slotCol).as("s"), col(valCol).as("v")))
        .getField("v").as("__seed"))
    val w = Window.partitionBy(col(key)).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(inGrid, Seq(key, "slot"), "left")
      .join(seed, Seq(key), "left")
      .withColumn("filled",
        org.apache.spark.sql.functions.coalesce(
          last(col("observed"), ignoreNulls = true).over(w), col("__seed")))
      .drop("__seed")
  }
}
