package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Data-layout writer: range-cluster rows across files and sort within
  * them, so point/range predicates on the cluster key touch a handful of
  * files instead of all of them.
  *
  * At 100 TB the scan cost of `WHERE user_id = X` over an unclustered
  * landing zone is the whole table: every parquet file's row groups hold
  * an arbitrary slice of the key space, so min/max pruning skips nothing.
  * `repartitionByRange` gives each output file a disjoint key range
  * (range-partitioning exchange with a sampled histogram, no driver
  * bottleneck) and `sortWithinPartitions` makes row groups within a file
  * monotone, so both file-level and row-group-level min/max stats become
  * selective. This is the same layout discipline the hive-partitioned
  * landing sink applies to PARTITION columns (`topic=…/dataload=…`,
  * `reddit/lambda_function_initial.py:45`), extended to high-cardinality
  * keys where a directory per value would be pathological.
  */
object Layout {

  /** Write `df` to `path` as `files` range-clustered, internally-sorted
    * parquet files keyed by `clusterCols` (lexicographic).
    */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[String],
                     files: Int): Unit =
    df.repartitionByRange(files, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Bit-interleave two already-bucketized dimensions (values in
    * [0, 2^bits)) into one Z-value. Pure built-in bit arithmetic — a
    * 2·bits-term expression tree that whole-stage-codegens; no custom
    * expression needed (SURVEY §7.3 preference: compose first).
    */
  def zValue2(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { j =>
      shiftleft(shiftright(a, j).bitwiseAND(lit(1L)), 2 * j)
        .bitwiseOR(shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), 2 * j + 1))
    }.reduce[Column](_ bitwiseOR _)

  /** Z-order (Morton-curve) clustering over TWO numeric dimensions:
    * lexicographic range clustering prunes on the leading column only —
    * a predicate on the second column still touches every file. The
    * Z-curve interleaves the dimensions' bits, so files cover compact
    * rectangles of the (a, b) space and range predicates on EITHER
    * column skip most files. This is the lakehouse OPTIMIZE ZORDER BY
    * discipline on plain parquet.
    *
    * Dimensions are scaled to [0, 2^bits) by their min/max (one scalar
    * aggregate — two driver doubles, not data); ties and skew are handled
    * by the range partitioner's sampling on the z-value.
    */
  def writeZOrdered(df: DataFrame, path: String, aCol: String, bCol: String,
                    bits: Int, files: Int): Unit = {
    require(bits > 0 && 2 * bits <= 62, "bits must be in [1, 31]")
    val r = df.agg(min(col(aCol)).cast("double"), max(col(aCol)).cast("double"),
      min(col(bCol)).cast("double"), max(col(bCol)).cast("double")).head()
    if (r.isNullAt(0) || r.isNullAt(2)) {
      // empty input (or an all-null dimension): nothing to cluster —
      // write the empty/degenerate dataset instead of NPE-ing on the stats
      df.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    def bucket(c: Column, lo: Double, hi: Double): Column = {
      val span = math.max(hi - lo, java.lang.Double.MIN_VALUE)
      least(lit((1L << bits) - 1), greatest(lit(0L),
        floor((c.cast("double") - lit(lo)) / lit(span) * lit((1L << bits) - 1))
          .cast("long")))
    }
    val z = zValue2(bucket(col(aCol), r.getDouble(0), r.getDouble(1)),
      bucket(col(bCol), r.getDouble(2), r.getDouble(3)), bits)
    df.repartitionByRange(files, z).sortWithinPartitions(z)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Small-files compaction: rewrite a directory of many tiny parquet
    * files into ~`targetBytes`-sized ones — the remedy for the
    * 15-minute-cadence landing zone (the reference lands one JSON object
    * per scrape; a year of that is ~35k files per topic whose OPEN cost
    * dominates scans and whose footers bloat the driver's file index).
    *
    * Returns the number of parquet part-files actually written, counted
    * from the output directory after the write — the pre-write estimate
    * ceil(total input bytes / targetBytes) is only a TARGET (`coalesce`
    * cannot raise the partition count, so the result can come out lower
    * when the input has fewer splits than the target). Atomicity: write
    * to `outPath` then swap directories like
    * [[graft.pipeline.Compaction]] — this writer does not overwrite in
    * place, and `outPath == inPath` is rejected outright: the parquet
    * read is lazy, so an in-place Overwrite would delete the input
    * mid-scan and lose the data.
    */
  def compactBySize(spark: org.apache.spark.sql.SparkSession, inPath: String,
                    outPath: String, targetBytes: Long): Int =
    compactScaffold(spark, inPath, outPath, targetBytes, "compactBySize") {
      (df, files) =>
        df.coalesce(files).write.mode(SaveMode.Overwrite).parquet(outPath)
    }

  /** The scaffold both compaction entry points share: in-place-rewrite
    * guard (qualified-path compare — the parquet read is lazy, so an
    * Overwrite onto the input would destroy it mid-scan), file target
    * from filesystem byte totals (no data scan), and the actual
    * post-write part count. The `write` callback is the only thing that
    * differs (narrow coalesce vs Z-order exchange).
    */
  private def compactScaffold(spark: org.apache.spark.sql.SparkSession,
                              inPath: String, outPath: String,
                              targetBytes: Long, what: String)
                             (write: (DataFrame, Int) => Unit): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val hconf = spark.sparkContext.hadoopConfiguration
    val inP = new org.apache.hadoop.fs.Path(inPath)
    val outP = new org.apache.hadoop.fs.Path(outPath)
    val fs = inP.getFileSystem(hconf)
    require(fs.makeQualified(inP) != outP.getFileSystem(hconf).makeQualified(outP),
      s"$what would overwrite its own input mid-scan: $inPath")
    val totalBytes = fs.getContentSummary(inP).getLength
    val files = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    write(spark.read.parquet(inPath), files)
    outP.getFileSystem(hconf).listStatus(outP)
      .count(f => f.getPath.getName.endsWith(".parquet"))
  }

  /** [[compactBySize]] ⊕ [[writeZOrdered]] ⊕ manifest republish — the real
    * table-maintenance unit: since compaction has to rewrite every byte
    * anyway, the rewrite might as well RE-CLUSTER, so the compacted files
    * come out both open-cost-cheap (≈ targetBytes each) and range-prunable
    * on both Z dimensions; and because the file layout changed, the
    * data-skipping manifest over `statCol` is rebuilt from the files just
    * written and swapped in atomically
    * ([[DataSkipping.publishManifest]] — a stale manifest lists dead
    * files). Unlike [[compactBySize]]'s narrow `coalesce`, the Z-order
    * rewrite pays one range-partitioning exchange — that is the price of
    * clustering and it buys every subsequent range scan.
    *
    * Returns the number of parquet part-files actually written. In-place
    * rewrite is rejected for the same lazy-read reason as
    * [[compactBySize]].
    */
  def compactClustered(spark: org.apache.spark.sql.SparkSession,
                       inPath: String, outPath: String, targetBytes: Long,
                       aCol: String, bCol: String, bits: Int,
                       manifestDir: String, statCol: String): Int = {
    val n = compactScaffold(spark, inPath, outPath, targetBytes,
      "compactClustered") { (df, files) =>
      writeZOrdered(df, outPath, aCol, bCol, bits, files)
    }
    DataSkipping.publishManifest(spark, outPath, manifestDir, statCol)
    n
  }
}
