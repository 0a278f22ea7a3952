package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver-generated star schema (TESTDATA.md).
  *
  * All queries in [[SparkEntry]] read through here so schema fixups live in
  * exactly one place. Mirrors the reference's catalog-scan entry points
  * (`glue/reddit_glue.py:204-213`, `glue/twitter_glue.py:154-158`) — a scan is
  * `spark.read.parquet` and Catalyst owns pushdown/pruning from there.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from `dir` (e.g. /root/testdata/sf0.01).
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects by default; we read it as a long via
    * `nanosAsLong` and rebuild a microsecond TimestampType column with
    * integer division (a double round-trip would lose precision above 2^53).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
