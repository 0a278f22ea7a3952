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
  /** Inferred-schema cache per (dir, table) — METADATA only, the entry a
    * catalog/metastore would hold (r17): every `spark.read.parquet` call
    * re-resolves the DataSource, re-listing the path and re-reading a
    * parquet footer for schema inference — measured 50-85 ms per call,
    * paid once or twice by every one of the 307 queries per bench pass.
    * With the schema supplied explicitly the resolution skips inference;
    * the scan itself still reads the parquet inputs every invocation
    * (nothing about DATA or results is cached). Testdata dirs are
    * immutable (TESTDATA.md: read-only), so a cached schema can never go
    * stale; the key includes the dir so multi-SF runs in one JVM stay
    * correct.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // nanos-as-long must be set before BOTH inference and every read (the
    // per-file footer conversion consults it at scan time).
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent((dir, name),
      new java.util.function.Function[(String, String),
          org.apache.spark.sql.types.StructType] {
        override def apply(k: (String, String)) =
          spark.read.parquet(path).schema
      })
    val raw = spark.read.schema(schema).parquet(path)
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      raw.schema("ts").dataType match {
        case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType    => raw
        case other => throw new IllegalStateException(
          s"events.ts: unsupported physical type $other (expected nanos-as-long, NTZ micros, or timestamp)")
      }
    } else raw
  }
}
