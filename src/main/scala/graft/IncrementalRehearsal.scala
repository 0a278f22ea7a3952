package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Rehearsal of the OPERATIONAL corpus-build mode (VERDICT r12 item 7):
  * tonight's batch is deduplicated and decontaminated against PERSISTED
  * state only — the standing corpus's fingerprints, band table, shingle
  * sets, and the benchmark's shingle hashes — never against history text.
  * This is the 100 TB nightly: history is petabytes, the state is ~1% of
  * it, and the batch is the only text scanned.
  *
  * Prep (excluded from accounting) writes the state exactly as the
  * nightly job maintains it (Dedup.writeNearDupState / fingerprints /
  * bench shingle hashes). The measured phase composes q109's exact
  * dedup-against-history, q140's near-dup-from-state, q242's quality
  * gate, and q88/q157's shingle decontamination into one funnel. Two
  * proofs are emitted:
  *  - an `inputFiles` audit over every measured frame: no scanned file
  *    may live under the history documents path;
  *  - stage-level exchange accounting: total input ≈ batch + state bytes.
  * Writes CORPUSINCR_r13.md in cwd. Not part of the driver contract.
  */
object IncrementalRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(id: Int, tasks: Int, durMs: Long, inMB: Double,
                  swMB: Double, srMB: Double, swRec: Long)
    val stages = scala.collection.mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += St(si.stageId, si.numTasks,
            (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L),
            m.inputMetrics.bytesRead / 1048576.0,
            m.shuffleWriteMetrics.bytesWritten / 1048576.0,
            m.shuffleReadMetrics.totalBytesRead / 1048576.0,
            m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })

    // ---- prep (excluded): standing corpus, tonight's batch, state ----
    val work = java.nio.file.Files.createTempDirectory("incr_rehearsal").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val historyDir = s"$work/history_text"     // exists; must never be read
    val batchDir = s"$work/batch"
    val stateDir = s"$work/state"
    val history = docs.filter(col("doc_id") % 97 =!= 0 && col("doc_id") % 10 =!= 0)
    history.repartition(64).write.parquet(historyDir)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    // Tonight's landing: fresh docs + exact re-crawls of history (new ids,
    // identical text) + drifted re-releases (near-dups of history).
    val fresh = docs.filter(col("doc_id") % 97 =!= 0 && col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("lang"), col("text"))
    val recrawl = history.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("lang"), col("text"))
    val drift = history.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 3000000L).as("doc_id"), col("lang"),
        concat(col("text"), lit(" re release v2")).as("text"))
    fresh.unionByName(recrawl).unionByName(drift)
      .repartition(64).write.parquet(batchDir)
    // Persisted state, as the nightly job maintains it.
    val historyOnDisk = spark.read.parquet(historyDir)
    Dedup.fingerprints(historyOnDisk, "text")
      .write.parquet(s"$stateDir/fp")
    Dedup.writeNearDupState(historyOnDisk, "doc_id", "text", s"$stateDir/neardup",
      shingleK = 3, numHashes = 16, bands = 4)
    Dedup.shingleHashSets(bench, "doc_id", "text", 3)
      .select(explode(col("sh")).as("h")).distinct()
      .write.parquet(s"$stateDir/bench_shingles")
    val nHistory = historyOnDisk.count()

    // ---- measured phase: batch + state ONLY ----
    stages.synchronized { stages.clear() }
    val sb = new StringBuilder
    sb ++= s"# CORPUSINCR_r13 — incremental corpus build vs persisted state at $dir\n\n"
    val load1 = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    sb ++= f"load1 at start: $load1%.2f\n\n"
    val t0 = System.nanoTime()

    val batch = spark.read.parquet(batchDir)
    val fpState = spark.read.parquet(s"$stateDir/fp")
    val benchH = spark.read.parquet(s"$stateDir/bench_shingles")

    // 1. exact dedup against history fingerprints (Bloom-gated anti-join)
    val exactNew = Dedup.dedupAgainstHistory(batch, fpState, "text",
      expectedHistory = nHistory).localCheckpoint()
    // 2. near-dups vs the persisted band/set state; matched batch ids drop
    val ndPairs = Dedup.incrementalNearDupsFromState(exactNew,
      s"$stateDir/neardup", "doc_id", "text",
      shingleK = 3, numHashes = 16, bands = 4, threshold = 0.5)
    val afterNd = exactNew.join(
      ndPairs.select(col("id_new").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti").localCheckpoint()
    // 3. quality gate (q242's threshold)
    val qual = afterNd.filter(graft.ops.CoreOps.cents(
      graft.text.TextOps.qualityScore(col("text"),
        graft.queries.TextQueries.stopwords), 6) >= 700000L)
      .localCheckpoint()
    // 4. shingle decontamination against the persisted benchmark hashes
    val withOv = Dedup.shingleHashSets(qual, "doc_id", "text", 3)
      .select(col("id"), explode(col("sh")).as("h"))
      .join(benchH, "h")
      .groupBy(col("id")).agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= 2)
    val fin = qual.join(withOv.select(col("id").as("doc_id")),
      Seq("doc_id"), "left_anti").localCheckpoint()

    val nBatch = batch.count()
    val nExact = exactNew.count()
    val nNd = afterNd.count()
    val nQual = qual.count()
    val finAgg = fin.agg(count(lit(1)),
      sum(size(split(col("text"), " ")).cast("long"))).first()
    val (nFin, toksFin) = (finAgg.getLong(0), finAgg.getLong(1))
    val wall = (System.nanoTime() - t0) / 1e9

    // inputFiles audit: nothing in the measured plans may scan history text
    val frames: Seq[(String, DataFrame)] = Seq(
      "batch" -> batch, "exactNew" -> exactNew, "ndPairs" -> ndPairs,
      "afterNd" -> afterNd, "qual" -> qual, "final" -> fin)
    val violations = frames.flatMap { case (n, f) =>
      f.inputFiles.filter(_.contains("history_text")).map(p => s"$n: $p")
    }
    require(violations.isEmpty,
      s"history text scanned in the measured phase:\n${violations.mkString("\n")}")

    sb ++= "## Funnel: batch -> exact-new -> neardup-new -> quality -> decontam\n\n"
    sb ++= "| n_history (state only) | n_batch | n_exact_new | n_nd_new | n_quality | n_final | toks_final |\n"
    sb ++= "|---|---|---|---|---|---|---|\n"
    sb ++= s"| $nHistory | $nBatch | $nExact | $nNd | $nQual | $nFin | $toksFin |\n\n"
    require(nBatch >= nExact && nExact >= nNd && nNd >= nQual && nQual >= nFin,
      s"funnel not monotone: $nBatch -> $nExact -> $nNd -> $nQual -> $nFin")
    sb ++= f"Wall (measured phase, cold): $wall%.1f s.\n\n"
    sb ++= "**History-scan audit: PASS** — `inputFiles` over every measured " +
      "frame contains no path under the standing corpus's text directory; " +
      "the only file scans are tonight's batch and the four state tables " +
      "(fingerprints, bands, shingle sets, benchmark shingles).\n\n"

    val snap = stages.synchronized { stages.toVector }
    sb ++= f"## Exchange volumes (measured phase)\n\nTotal: input " +
      f"${snap.map(_.inMB).sum}%.1f MB, shuffle write ${snap.map(_.swMB).sum}%.1f MB, " +
      f"shuffle read ${snap.map(_.srMB).sum}%.1f MB across ${snap.size} stages.\n\n"
    sb ++= "Top 10 stages by shuffle write:\n\n"
    sb ++= "| stage | tasks | dur ms | input MB | shuf write MB | shuf read MB | write rec |\n"
    sb ++= "|---|---|---|---|---|---|---|\n"
    snap.sortBy(-_.swMB).take(10).foreach { s =>
      sb ++= f"| ${s.id} | ${s.tasks} | ${s.durMs} | ${s.inMB}%.1f | " +
        f"${s.swMB}%.1f | ${s.srMB}%.1f | ${s.swRec} |\n"
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("CORPUSINCR_r13.md"),
      sb.toString.getBytes("UTF-8"))
    println(sb.toString)
    spark.stop()
  }
}
