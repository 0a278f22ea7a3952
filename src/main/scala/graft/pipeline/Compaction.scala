package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.CoreOps

/** Latest-wins compaction: rewrite an append-only landing zone into a
  * deduped snapshot table.
  *
  * The reference's 2-day re-crawl re-lands updated engagement objects next
  * to the originals (`reddit/lambda_function_aggregate.py:59-71`), and its
  * readers cope by latest-wins logic at read time. That tax grows with
  * every re-land; the Delta/Iceberg answer is a MERGE, and this is the
  * plain-parquet equivalent: one batch job that reads the landing zone,
  * keeps the newest version of each key (`CoreOps.latestWinsAgg` — a
  * partial-aggregable max_by, one shuffle, no window sort), and rewrites
  * the snapshot with dynamic partition overwrite, so only partitions that
  * actually contain updated keys are replaced.
  *
  * At 100 TB the job is bounded by one scan + one keyed shuffle; the
  * output write is partition-parallel and the dynamic overwrite keeps
  * untouched partitions' files in place.
  */
object Compaction {

  /** Snapshot reconciliation: row-level diff of two table versions on a
    * key — the check a compaction/backfill job runs before swapping a
    * snapshot in ("what did this rewrite actually change?"). One full
    * outer join on the key; change detection compares the named value
    * columns null-safely. Returns (keys..., change ∈ added|removed|changed)
    * — unchanged rows are dropped, so the output is O(delta) not O(table).
    */
  def tableDiff(before: DataFrame, after: DataFrame, keys: Seq[String],
                valueCols: Seq[String]): DataFrame = {
    // Value columns renamed per side: both inputs often share lineage
    // (two versions of one table), where dataframe-qualified refs are
    // ambiguous under Spark's self-join analysis.
    val b = before.select(keys.map(col) ++
      valueCols.map(c => col(c).as(s"__b_$c")) :+ lit(1).as("__b"): _*)
    val a = after.select(keys.map(col) ++
      valueCols.map(c => col(c).as(s"__a_$c")) :+ lit(1).as("__a"): _*)
    val changed = valueCols
      .map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    b.join(a, keys, "full_outer")
      .withColumn("change",
        when(col("__b").isNull, lit("added"))
          .when(col("__a").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .filter(col("change").isNotNull)
      .select((keys.map(col) :+ col("change")): _*)
  }

  /** MERGE a change batch into a base table — the Delta/Iceberg `MERGE
    * INTO` re-expressed over plain DataFrames: change rows replace matched
    * base rows (UPDATE), unmatched change rows are inserted (INSERT), and
    * change rows whose `deleteCol` is true tombstone their key (DELETE).
    * Base rows with no matching change pass through untouched.
    *
    * The reference's 2-day re-crawl (`reddit/lambda_function_aggregate
    * .py:59-71`) is exactly this shape: a small change batch against a big
    * accumulated table. Implementation is one keyed shuffle: both sides
    * union with a precedence rank (changes outrank base), `max_by` keeps
    * the winning row per key (partial-aggregable — map-side combine, no
    * window sort), then tombstones drop out. At 100 TB: scan + one
    * shuffle, no join, no driver-side state.
    *
    * Precondition (same as Delta's MERGE): `changes` has at most one row
    * per key — multiple change rows for one key would be order-ambiguous.
    * Pass `changeOrder` to break such ties deterministically, or
    * `strict = true` to ENFORCE the precondition the way Delta does
    * (raise on duplicate change keys) instead of documenting it: strict
    * mode runs one extra aggregate over the change batch (the small
    * side) before merging.
    */
  def merge(base: DataFrame, changes: DataFrame, keys: Seq[String],
            deleteCol: Option[String] = None,
            changeOrder: Seq[Column] = Nil,
            strict: Boolean = false): DataFrame = {
    if (strict && changeOrder.isEmpty) {
      val dup = changes.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__graft_n"))
        .filter(col("__graft_n") > 1)
        .limit(1).collect()
      if (dup.nonEmpty)
        throw new IllegalArgumentException(
          s"merge: multiple change rows share key ${dup.head.toSeq.init.mkString("(", ", ", ")")} " +
            "and no changeOrder was given — the surviving row would be " +
            "nondeterministic. Deduplicate the batch or pass changeOrder.")
    }
    val dataCols = base.columns.toSeq
    val del = deleteCol.map(c => coalesce(col(c), lit(false)))
      .getOrElse(lit(false))
    val ch = changes
      .withColumn("__graft_del", del)
      .withColumn("__graft_rank", lit(1))
      .select((dataCols ++ Seq("__graft_del", "__graft_rank")).map(col): _*)
    val ba = base
      .withColumn("__graft_del", lit(false))
      .withColumn("__graft_rank", lit(0))
    val merged = CoreOps.latestWinsAgg(ba.unionByName(ch), keys,
      col("__graft_rank") +: changeOrder)
    merged.filter(!col("__graft_del"))
      .select(dataCols.map(col): _*)
  }

  /** Compact `landingDir` (parquet) into `snapshotDir`: newest row per
    * `keys` under `order` (must be a unique composite for determinism),
    * hive-partitioned by `partitionCols`. Returns the snapshot DataFrame
    * read back from disk.
    */
  def compactLatestWins(spark: SparkSession, landingDir: String,
                        snapshotDir: String, keys: Seq[String],
                        order: Seq[Column],
                        partitionCols: Seq[String] = Nil): DataFrame = {
    val landing = spark.read.parquet(landingDir)
    val compacted = CoreOps.latestWinsAgg(landing, keys, order)
    // Per-write option, NOT a session-conf set/restore: Verify runs
    // queries concurrently on one session, and a temporarily mutated conf
    // would leak dynamic-overwrite semantics into unrelated writes.
    val writer = compacted.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(snapshotDir)
    spark.read.parquet(snapshotDir)
  }

  /** [[compactLatestWins]] + data-skipping manifest rebuild in one unit:
    * compaction rewrites the file layout, which INVALIDATES any manifest
    * built over the landing zone — a pruned read against a stale
    * manifest would list files that no longer exist. So the manifest is
    * derived from the files the compaction just wrote and published
    * AFTER the snapshot write completes via
    * [[graft.sources.DataSkipping.publishManifest]]'s versioned-dir +
    * CURRENT-pointer flip: a racing reader resolves either the old
    * manifest (over the old snapshot, if it read that first) or the new
    * pair — never a half-written directory and never a window with no
    * manifest at all.
    *
    * Returns the snapshot read back; the manifest lands at `manifestDir`
    * for [[graft.sources.DataSkipping.readManifest]] →
    * [[graft.sources.DataSkipping.prunedRead]].
    */
  def compactWithManifest(spark: SparkSession, landingDir: String,
                          snapshotDir: String, manifestDir: String,
                          keys: Seq[String], order: Seq[Column],
                          statCol: String,
                          partitionCols: Seq[String] = Nil): DataFrame = {
    val snapshot = compactLatestWins(spark, landingDir, snapshotDir,
      keys, order, partitionCols)
    graft.sources.DataSkipping.publishManifest(spark, snapshotDir,
      manifestDir, statCol)
    snapshot
  }
}
