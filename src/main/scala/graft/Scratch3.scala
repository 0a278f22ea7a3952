package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: decompose q143 ivfRecallCurve cost at sf0.1. */
object Scratch3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
    val b2 = sys.env.get("SCR3_LOCALDIR").map(d => b.config("spark.local.dir", d)).getOrElse(b)
    val b3 = sys.env.get("SCR3_BYPASS").map(v => b2.config("spark.shuffle.sort.bypassMergeThreshold", v)).getOrElse(b2)
    val spark = b3
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskMs = new AtomicLong(0)
    val runMs = new AtomicLong(0)
    val deserMs = new AtomicLong(0)
    val gcMs = new AtomicLong(0)
    val resSerMs = new AtomicLong(0)
    val nTasks = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null) {
          nTasks.incrementAndGet()
          taskMs.addAndGet(te.taskInfo.duration)
          val m = te.taskMetrics
          if (m != null) {
            runMs.addAndGet(m.executorRunTime)
            deserMs.addAndGet(m.executorDeserializeTime)
            gcMs.addAndGet(m.jvmGCTime)
            resSerMs.addAndGet(m.resultSerializationTime): Unit
          }
        }
    })
    def time(label: String)(f: => Any): Unit = {
      taskMs.set(0); runMs.set(0); deserMs.set(0); gcMs.set(0); resSerMs.set(0); nTasks.set(0)
      val t0 = System.nanoTime()
      val r = f
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100)
      println(f"SCR3 $label%-28s wall=$w%7.3f s n=${nTasks.get}%4d taskTime=${taskMs.get / 1000.0}%8.2f s " +
        f"run=${runMs.get / 1000.0}%7.2f deser=${deserMs.get / 1000.0}%6.2f gc=${gcMs.get / 1000.0}%6.2f " +
        f"resSer=${resSerMs.get / 1000.0}%6.2f res=$r")
    }

    import graft.similarity.Similarity
    val e = Tables.load(spark, dir, "embeddings")
    time("warm-count")(e.count())
    val base = Similarity.bucketNorm(e, "vec_id", "embedding", 4, 64)
    time("bucketNorm-count")(base.count())
    time("bucketNorm-count2")(base.count())
    // centroidArray equivalent: groupBy bucket with 64 sums
    val sumCols = (0 until 64).map(i =>
      sum(round(element_at(col("v"), i + 1).cast("double") * lit(1e6), 0).cast("long")).as(s"s$i"))
    time("centroid-agg")(base.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"), sumCols: _*).collect().length)
    time("centroid-agg2")(base.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"), sumCols: _*).collect().length)
    val qs = e.filter(col("vec_id") < 20)
    // isolate: rows vs dims vs round
    val sub = base.filter(col("id") % 10 === 0) // ~200 rows, same partitioning
    time("centroid-agg-200rows")(sub.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"), sumCols: _*).collect().length)
    val sum16 = (0 until 16).map(i =>
      sum(round(element_at(col("v"), i + 1).cast("double") * lit(1e6), 0).cast("long")).as(s"s$i"))
    time("centroid-agg-16dims")(base.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"), sum16: _*).collect().length)
    val sumNoRound = (0 until 64).map(i =>
      sum(element_at(col("v"), i + 1).cast("double")).as(s"s$i"))
    time("centroid-agg-noround")(base.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"), sumNoRound: _*).collect().length)
    time("centroid-agg-noround2")(base.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"), sumNoRound: _*).collect().length)
    val baseCk = base.localCheckpoint()
    time("centroid-agg-on-ckpt")(baseCk.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"), sumCols: _*).collect().length)
    time("centroid-agg-on-ckpt2")(baseCk.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"), sumCols: _*).collect().length)
    val baseCk4 = base.repartition(4).localCheckpoint()
    for (i <- 1 to 3)
      time(s"agg-ckpt4-$i")(baseCk4.groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"), sumCols: _*).collect().length)
    val e4 = e.repartition(4)
    val base4 = Similarity.bucketNorm(e4, "vec_id", "embedding", 4, 64)
    for (i <- 1 to 3)
      time(s"curve-width32-$i")(Similarity.ivfRecallCurve(e, qs, "vec_id", "embedding",
        k = 5, nProbes = Seq(1, 2, 4), nCells = 16).count())
    if (sys.env.contains("SCR3_LOOP")) {
      for (i <- 1 to 60)
        time(s"loop-centroid-$i")(baseCk.groupBy(col("bucket"))
          .agg(count(lit(1)).as("cnt"), sumCols: _*).collect().length)
    }
    time("bruteForce-count")(
      Similarity.bruteForceTopK(e, qs, "vec_id", "embedding", 5).count())
    time("bruteForce-count2")(
      Similarity.bruteForceTopK(e, qs, "vec_id", "embedding", 5).count())
    time("full-curve")(
      Similarity.ivfRecallCurve(e, qs, "vec_id", "embedding",
        k = 5, nProbes = Seq(1, 2, 4), nCells = 16).count())
    spark.stop()
  }
}
