package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping via an explicit min/max stats manifest — the
  * table-format half of what [[Layout.writeClustered]] sets up: clustering
  * makes per-file key ranges disjoint; the manifest makes them *visible to
  * planning* without opening a single parquet footer.
  *
  * This is the Delta/Iceberg "file statistics in the transaction log"
  * pattern over plain directories: one manifest row per data file holding
  * `min(col)`/`max(col)`. A range query consults the manifest first and
  * hands Spark only the overlapping files — at 100 TB with a clustered
  * layout, a point/range query plans in manifest-scan time (one row per
  * file, thousands of rows) and reads a handful of files instead of
  * listing and footer-probing the whole table. The manifest path collects
  * the surviving file list on the driver, which is exactly what Spark's
  * own `InMemoryFileIndex` does with EVERY file path — this one is
  * strictly smaller (post-pruning survivors only).
  *
  * Exactness: pruning uses the closed interval `[min, max]` per file, so
  * a file is skipped only when it provably holds no matching row; the
  * exact predicate is re-applied to the surviving rows, making the result
  * identical to the unpruned scan for any predicate.
  */
object DataSkipping {

  /** Build the stats manifest for the parquet files under `dir`: one row
    * per file with min/max of `statCol`. One distributed scan of the
    * stat column only (column-pruned), one partial-aggregable min/max per
    * file — rerun after layout changes (compaction owns this in a real
    * pipeline).
    */
  def buildManifest(spark: SparkSession, dir: String, statCol: String): DataFrame =
    spark.read.parquet(dir)
      .select(input_file_name().as("file"), col(statCol))
      .groupBy(col("file"))
      .agg(min(col(statCol)).as("min_v"), max(col(statCol)).as("max_v"))

  /** Read only the files whose `[min_v, max_v]` interval intersects
    * `[lo, hi]`, then re-apply the exact range predicate. `manifest` is
    * typically the persisted output of [[buildManifest]] read back — the
    * collect here is the pruned file list (≤ one string per surviving
    * file). Returns an empty, correctly-typed frame when nothing
    * survives.
    */
  def prunedRead(spark: SparkSession, dir: String, manifest: DataFrame,
                 statCol: String, lo: Long, hi: Long): DataFrame = {
    val files = manifest
      .filter(col("max_v") >= lo && col("min_v") <= hi)
      .select(col("file")).collect().map(r => globSafe(r.getString(0)))
    val base =
      if (files.isEmpty)
        spark.read.parquet(dir).limit(0)
      else spark.read.parquet(files.toIndexedSeq: _*)
    base.filter(col(statCol) >= lo && col(statCol) <= hi)
  }

  /** Build the manifest for `dataDir` and publish it at `manifestDir`
    * ATOMICALLY: stage to a side dir, retire any old manifest, rename the
    * staging dir in. A reader that races the swap sees either the old
    * manifest or the new one, never a half-written directory. (On object
    * stores the rename models a metastore pointer flip.) Every writer
    * that rewrites a file layout must republish through here — a stale
    * manifest lists dead files.
    */
  def publishManifest(spark: SparkSession, dataDir: String,
                      manifestDir: String, statCol: String): Unit = {
    val staging = manifestDir + ".staging-" +
      java.util.UUID.randomUUID().toString.take(8)
    buildManifest(spark, dataDir, statCol)
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val fs = new java.io.File(manifestDir)
    if (fs.exists()) {
      val old = new java.io.File(manifestDir + ".old-" +
        java.util.UUID.randomUUID().toString.take(8))
      if (!fs.renameTo(old))
        throw new java.io.IOException(s"could not retire old manifest $manifestDir")
      deleteRecursive(old)
    }
    if (!new java.io.File(staging).renameTo(fs))
      throw new java.io.IOException(s"could not publish manifest $manifestDir")
  }

  private def deleteRecursive(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursive))
    f.delete(): Unit
  }

  /** `input_file_name()` yields percent-ENCODED URIs, while
    * `spark.read.parquet(paths)` treats each string as a GLOB pattern —
    * a file named `a b[1].parquet` would round-trip as `a%20b[1].parquet`
    * and then match nothing (or the wrong file). Decode the URI, then
    * backslash-escape Hadoop's glob metacharacters so the re-read matches
    * the surviving files literally.
    */
  private[graft] def globSafe(fileUri: String): String = {
    val decoded =
      try {
        val u = new java.net.URI(fileUri)
        if (u.getScheme == null) fileUri
        else u.getScheme + "://" + Option(u.getAuthority).getOrElse("") + u.getPath
      } catch { case _: java.net.URISyntaxException => fileUri }
    decoded.replaceAll("""([\[\]{}*?\\])""", """\\$1""")
  }
}
