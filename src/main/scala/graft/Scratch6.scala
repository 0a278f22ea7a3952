package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: cost of Tables.load relation creation per call. */
object Scratch6 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm
    Tables.load(spark, dir, "events").count()
    Tables.load(spark, dir, "lineitem").count()
    for (t <- Seq("events", "lineitem", "orders", "customer", "documents")) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 20) { Tables.load(spark, dir, t); i += 1 }
      val build = (System.nanoTime() - t0) / 20e6
      val t1 = System.nanoTime()
      i = 0
      while (i < 20) { Tables.load(spark, dir, t).count(); i += 1 }
      val cnt = (System.nanoTime() - t1) / 20e6
      println(f"SCR6 $t%-10s load=${build}%7.2f ms  load+count=${cnt}%7.2f ms")
    }
    spark.stop()
  }
}
