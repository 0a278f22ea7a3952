package graft

import org.apache.spark.sql.SparkSession

/** Explain: print the executed plan of named SparkEntry queries —
  * `runMain graft.Explain <sfDir> <qname>...` (plan-audit tooling).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      // Session artifact isolation (Spark 4 default) keys the codegen
      // cache on a per-session/query classloader, so every STREAMING
      // query start recompiled all its generated classes (~14 Janino
      // compiles, ~0.4-0.6 s per invocation). No runtime artifacts are
      // ever added here; disable it so the cache hits across queries.
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      println(s"===== $name")
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect() // materialize so AQE settles on the final plan
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
