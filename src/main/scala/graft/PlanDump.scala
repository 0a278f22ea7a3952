package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of named SparkEntry queries to files —
  * the r17 optimization round's plan evidence generator:
  *
  *   runMain graft.PlanDump <sfDir> <outDir> <suffix> <qname>...
  *
  * writes `<outDir>/<qname>_<suffix>.txt` per query. The query is
  * executed first (collect) so AQE-final plans are also captured below
  * the formatted (initial) plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    Files.createDirectories(Paths.get(outDir))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect() // settle AQE
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val executed = df.queryExecution.executedPlan.toString
      val body = s"===== $name ($suffix) =====\n\n" +
        "--- explain(formatted), initial plan ---\n" + formatted +
        "\n--- executed plan (AQE final) ---\n" + executed + "\n"
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        body.getBytes("UTF-8"))
      println(s"PLANDUMP wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
