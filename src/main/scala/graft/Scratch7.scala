package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: pure job/exchange latency floor in local mode. */
object Scratch7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def loop(label: String, n: Int)(f: => Unit): Unit = {
      f; f
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { f; i += 1 }
      println(f"SCR7 $label%-28s ${(System.nanoTime() - t0) / n / 1e6}%8.2f ms/iter")
    }
    val df = spark.range(0, 1000, 1, 1)
    loop("range-count (0 exch)", 50)(df.count(): Unit)
    loop("groupBy-count (1 exch)", 50)(
      df.groupBy((col("id") % 7).as("k")).count().count(): Unit)
    loop("2-exch", 30)(
      df.groupBy((col("id") % 7).as("k")).agg(sum("id").as("s"))
        .groupBy((col("k") % 3).as("j")).agg(sum("s")).count(): Unit)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    loop("groupBy-count AQE-off", 50)(
      df.groupBy((col("id") % 7).as("k")).count().count(): Unit)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val rdd = spark.sparkContext.parallelize(1 to 10, 1)
    loop("raw-rdd-count", 100)(rdd.count(): Unit)
    val cached = df.groupBy((col("id") % 7).as("k")).count()
    loop("same-df-recount", 50)(cached.count(): Unit)
    // how much is planning? pre-built plan, execute toRdd directly
    val qe = df.groupBy((col("id") % 7).as("k")).count().queryExecution
    val planRdd = qe.toRdd
    loop("prebuilt-toRdd-count", 50)(planRdd.count(): Unit)
    spark.stop()
  }
}
