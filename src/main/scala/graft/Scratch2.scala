package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dissection of the stream-family batch-twin cost. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = java.nio.file.Files.createTempDirectory("sc2_").toString
    Tables.load(spark, dir, "events").select(col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"),
        round(col("value") * 100, 0).cast("long").as("value_cents"))
      .repartition(2, col("event_id")).write.mode("overwrite").parquet(src)
    def time(label: String)(f: => Unit): Unit = {
      for (r <- 1 to 4) {
        val t0 = System.nanoTime()
        f
        println(f"SC2 $label rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val base = ss.read.parquet(src)
    time("count-only") { base.count(): Unit }
    time("groupBy-type") {
      base.groupBy(col("event_type")).count().collect(): Unit
    }
    time("window-agg-4p") {
      base.withColumn("ts", timestamp_micros(col("ts_us")))
        .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n")).collect(): Unit
    }
    time("window-agg-noAQE") {
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      base.withColumn("ts", timestamp_micros(col("ts_us")))
        .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n")).collect(): Unit
    }
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    time("floor-div-agg") {
      base.groupBy((col("ts_us") - (col("ts_us") % 900000000L)).as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n")).collect(): Unit
    }
    spark.stop()
  }
}
