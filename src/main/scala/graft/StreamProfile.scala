package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev harness: break a stream query's wall time into start / batch /
  * stop phases using the progress log (durationMs per micro-batch). */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val b0 = SparkSession.builder().master("local[*]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.ui.enabled", "false")
    val spark = (if (sys.env.contains("SP_NOISO"))
      b0.config("spark.sql.artifact.isolation.enabled", "false") else b0)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm
    SparkEntry.queries("q66_stream_tumbling")(spark, dir).count()
    // Batch-mode twin of the profiled agg: sizes the pure computation so
    // the streaming numbers read as (real work + streaming tax).
    locally {
      val batchSrc = java.nio.file.Files.createTempDirectory("sp_bland_").toString
      graft.Tables.load(spark, dir, "events").select(col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type"),
          round(col("value") * 100, 0).cast("long").as("value_cents"))
        .repartition(2, col("event_id")).write.mode("overwrite").parquet(batchSrc)
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        ss.read.parquet(batchSrc)
          .withColumn("ts", timestamp_micros(col("ts_us")))
          .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n")).collect()
        println(f"PROFILE batch-twin rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    // Stage-level trace: where does batch 0's extra ~600ms go?
    if (sys.env.contains("SP_STAGES")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val dur = for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s
          println(s"SPSTAGE id=${si.stageId} tasks=${si.numTasks} " +
            s"dur=${dur.getOrElse(-1L)}ms name=${si.name.takeWhile(_ != '\n').take(90)}")
        }
      })
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null && te.taskInfo.duration > 50)
            println(s"SPTASK stage=${te.stageId} dur=${te.taskInfo.duration} " +
              s"run=${m.executorRunTime} deser=${m.executorDeserializeTime} " +
              s"gc=${m.jvmGCTime} serRes=${m.resultSerializationTime} " +
              s"launch-submit=${te.taskInfo.launchTime}")
        }
      })
    }
    val parts = sys.env.getOrElse("SP_PARTS", "4")
    // One shared landing for all reps (page cache + file listing constant
    // across reps — isolates per-query-start costs).
    val sharedSrc = java.nio.file.Files.createTempDirectory("sp_land_").toString
    graft.Tables.load(spark, dir, "events").select(col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"),
        round(col("value") * 100, 0).cast("long").as("value_cents"))
      .repartition(2, col("event_id")).write.mode("overwrite").parquet(sharedSrc)
    val sharedSession =
      if (sys.env.contains("SP_ONE_SESSION")) Some(spark.newSession()) else None
    for (rep <- 1 to 3) {
      val ss = sharedSession.getOrElse(spark.newSession())
      ss.conf.set("spark.sql.shuffle.partitions", parts)
      sys.env.get("SP_CONF").foreach(_.split(";").filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); ss.conf.set(k, v)
      })
      val src = sharedSrc
      val schema = StructType(Seq(StructField("event_id", LongType),
        StructField("ts_us", LongType), StructField("event_type", StringType),
        StructField("value_cents", LongType)))
      if (sys.env.contains("SP_CGDUMP"))
        org.apache.logging.log4j.core.config.Configurator.setLevel(
          "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
          org.apache.logging.log4j.Level.DEBUG)
      val t0 = System.nanoTime()
      val stream = graft.streaming.SocialStream
        .readParquetStream(ss, src, schema, maxFilesPerTrigger = 1)
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .withWatermark("ts", "36500 days")
        .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      // tmpfs when the host has it (the Linux bench box), else the JVM
      // temp dir — the profiler must run anywhere, not just this host.
      val ckptRoot = {
        val shm = java.nio.file.Paths.get("/dev/shm")
        if (java.nio.file.Files.isDirectory(shm) &&
          java.nio.file.Files.isWritable(shm)) shm
        else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
      }
      val ckpt = java.nio.file.Files
        .createTempDirectory(ckptRoot, "sp_ckpt_").toString
      val q = stream.writeStream.format("memory").queryName(s"sp_$rep")
        .option("checkpointLocation", ckpt)
        .outputMode("complete").start()
      val t1 = System.nanoTime()
      q.processAllAvailable()
      val t2 = System.nanoTime()
      q.stop()
      val t3 = System.nanoTime()
      println(f"PROFILE rep$rep start=${(t1-t0)/1e9}%.2f process=${(t2-t1)/1e9}%.2f stop=${(t3-t2)/1e9}%.2f " +
        s"codegenCompiles=${org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount}")
      q.recentProgress.foreach { p =>
        println(s"PROFILE   batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
      }
    }
    spark.stop()
  }
}
