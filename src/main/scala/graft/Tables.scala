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
    * `events.ts` has shipped under two physical parquet types across driver
    * generations: TIMESTAMP(NANOS) (Spark's vectorized reader rejects it by
    * default; read as long via `nanosAsLong`, rebuild micros with integer
    * division — a double round-trip would lose precision above 2^53) and
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (arrives as
    * TIMESTAMP_NTZ). Both normalize to the same session-TZ=UTC
    * TimestampType column, so every downstream query and oracle sees one
    * schema regardless of which generator wrote the files.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      raw.schema("ts").dataType match {
        case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType    => raw
        case other => throw new IllegalStateException(
          s"events.ts: unsupported physical type $other (expected nanos-as-long, NTZ micros, or timestamp)")
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
