package graft
import org.apache.spark.sql.SparkSession

/** Throwaway: stage-level timing for one query at one SF. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/repo/testdata_sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for { s <- si.submissionTime; c <- si.completionTime } yield c - s
        if (dur.exists(_ > 200) ||
            (sys.env.contains("SC2_ALL_SHUFFLE") &&
              si.taskMetrics.shuffleWriteMetrics.recordsWritten > 0))
          println(s"SC2STAGE id=${si.stageId} tasks=${si.numTasks} " +
            s"dur=${dur.getOrElse(-1L)}ms in=${si.taskMetrics.inputMetrics.bytesRead/1024/1024}MB " +
            s"sw=${si.taskMetrics.shuffleWriteMetrics.bytesWritten/1024/1024}MB " +
            s"sr=${si.taskMetrics.shuffleReadMetrics.totalBytesRead/1024/1024}MB " +
            s"rec=${si.taskMetrics.shuffleWriteMetrics.recordsWritten} " +
            s"name=${si.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    for (r <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"SC2 $name rep$r rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
