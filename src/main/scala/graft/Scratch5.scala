package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: AQE on/off wall comparison for job-count-bound queries. */
object Scratch5 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val names = Seq("q156_cdf", "q162_hybrid_rrf", "q73_bloom_join",
      "q214_cusum", "q06_region_revenue", "q306_kneser_ney")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(label: String, aqe: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      for (name <- names) {
        val fn = SparkEntry.queries(name)
        fn(spark, dir).count() // warm
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        fn(spark, dir).count()
        val w = (System.nanoTime() - t0) / 2e9
        println(f"SCR5 $label $name%-22s ${w}%6.3f s")
      }
    }
    run("aqe-on ", aqe = true)
    run("aqe-off", aqe = false)
    run("aqe-on2", aqe = true)
    spark.stop()
  }
}
