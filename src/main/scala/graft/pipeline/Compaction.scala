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
}
