package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** r17 optimization-round profiler: per-query breakdown of where the wall
  * goes — Catalyst phase times (analysis/optimization/planning), job /
  * stage / task counts, and summed task time — so a slow bench entry can
  * be attributed to DRIVER work (planning, many actions) vs EXECUTOR work
  * (stages, shuffles) before touching the query. Not part of the driver
  * contract; mirrors Bench's session setup (same master/conf family).
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.OptProfile /root/testdata/sf0.1 q98_stream_join ..."
  */
object OptProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q01_pricing_rollup")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.sql.artifact.isolation.enabled", "false")
      // generated-class cache sized to the 307-query workload (r18,
      // see Bench.scala): the default 100 entries thrashes across passes
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val stageMs = new AtomicLong(0L)
    val stageDetail = sys.env.contains("OPTPROF_STAGES")
    val stageTaskMs = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(): Unit }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val si = sc.stageInfo
        for (s <- si.submissionTime; c <- si.completionTime) stageMs.addAndGet(c - s): Unit
        if (stageDetail) {
          val tt = Option(stageTaskMs.get(si.stageId)).map(_.get).getOrElse(0L)
          if (tt > 200)
            println(f"OPTSTAGE id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
              f"taskTime=${tt / 1000.0}%7.2f s  ${si.name.takeWhile(_ != '\n').take(120)}")
        }
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (te.taskInfo != null) {
          taskMs.addAndGet(te.taskInfo.duration)
          stageTaskMs.computeIfAbsent(te.stageId, _ => new AtomicLong(0L))
            .addAndGet(te.taskInfo.duration): Unit
        }
      }
    })

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                label: String): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L); stageMs.set(0L)
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val tBuilt = System.nanoTime()
      df.count()
      val t1 = System.nanoTime()
      // phase times of the FINAL action's query execution (count); the
      // build step above may itself have run jobs (localCheckpoint,
      // head(), streams) — those show in the build wall and job counts.
      val phases = df.queryExecution.tracker.phases
        .map { case (k, v) => f"$k=${(v.endTimeMs - v.startTimeMs)}%dms" }
        .mkString(" ")
      // allow listener events to drain
      Thread.sleep(150)
      println(f"OPTPROF $name%-28s $label build=${(tBuilt - t0) / 1e9}%6.3f s " +
        f"action=${(t1 - tBuilt) / 1e9}%6.3f s total=${(t1 - t0) / 1e9}%6.3f s " +
        f"jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d " +
        f"taskTime=${taskMs.get / 1000.0}%7.2f s stageTime=${stageMs.get / 1000.0}%7.2f s " +
        s"phases[$phases]")
    }

    val resolved: Seq[String] =
      if (names == Seq("ALL")) SparkEntry.queries.keys.toSeq.sorted
      else names
    for (name <- resolved) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      runOnce(name, fn, "warm")
      runOnce(name, fn, "rep1")
      if (names != Seq("ALL")) runOnce(name, fn, "rep2")
    }
    spark.stop()
  }
}
