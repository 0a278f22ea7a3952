package graft

import org.apache.spark.sql.SparkSession

/** Prints executed-plan summaries for the plan-sensitive queries: verifies
  * pushdown reached the scans, dims are broadcast, and self-join exchanges
  * are reused. Run: sbt "runMain graft.PlanAudit /root/testdata/sf0.1"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // see Bench.scala: codegen cache is classloader-keyed; isolation off
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val interesting = Seq(
      "q01_pricing_rollup", "q02_filter_revenue", "q05_segment_revenue",
      "q06_region_revenue", "q07_no_orders", "q12_latest_per_type",
      "q32_minhash_neardups", "q36_embedding_neardups", "q43_ann_lsh")
    for (name <- interesting) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.count() // materialize so AQE finalizes the plan
      val plan = df.queryExecution.executedPlan.toString
      def count(marker: String) = plan.linesIterator.count(_.contains(marker))
      println(s"AUDIT $name " +
        s"broadcastJoins=${count("BroadcastHashJoin")} " +
        s"smj=${count("SortMergeJoin")} shj=${count("ShuffledHashJoin")} " +
        s"exchanges=${count("Exchange")} reused=${count("ReusedExchange")} " +
        s"pushedNonEmpty=${plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []")} " +
        s"partialAgg=${count("HashAggregate")}")
    }
    spark.stop()
  }
}
