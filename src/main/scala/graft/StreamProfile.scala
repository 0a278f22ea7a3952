package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev harness: break a stream query's wall time into start / batch /
  * stop phases using the progress log (durationMs per micro-batch). */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[*]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm
    SparkEntry.queries("q66_stream_tumbling")(spark, dir).count()
    for (rep <- 1 to 2) {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val src = java.nio.file.Files.createTempDirectory("sp_land_").toString
      graft.Tables.load(spark, dir, "events").select(col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type"),
          round(col("value") * 100, 0).cast("long").as("value_cents"))
        .repartition(2, col("event_id")).write.mode("overwrite").parquet(src)
      val schema = StructType(Seq(StructField("event_id", LongType),
        StructField("ts_us", LongType), StructField("event_type", StringType),
        StructField("value_cents", LongType)))
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
      println(f"PROFILE rep$rep start=${(t1-t0)/1e9}%.2f process=${(t2-t1)/1e9}%.2f stop=${(t3-t2)/1e9}%.2f")
      q.recentProgress.foreach { p =>
        println(s"PROFILE   batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
      }
    }
    spark.stop()
  }
}
