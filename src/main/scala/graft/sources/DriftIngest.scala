package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-drift-tolerant ingestion for a landing zone whose upstream
  * changes shape under you — the first thing a real scrape pipeline hits
  * when the API adds a field or an object arrives truncated.
  *
  * The reference absorbs drift in two layers: its crawler re-infers the
  * schema per partition (`terraform/main.tf:301-319`, `$[*]` classifier)
  * and Glue's DynamicFrame tolerates per-record variation
  * (`glue/twitter_glue.py:154-161`). The Spark-first equivalents:
  *
  *  - PERMISSIVE JSON parsing against the WIDEST known schema, with
  *    malformed records quarantined into `_corrupt_record` instead of
  *    failing the job (or being silently dropped, as DROPMALFORMED
  *    would). Records written before a column existed simply parse with
  *    that column null — old files never block a widened reader.
  *  - `mergeSchema` parquet reads for the curated zone: files written
  *    across schema versions union into the widest schema, with absent
  *    columns null — no rewrite of historical files.
  *
  * Both are scan-time behaviors: no shuffle is added, pushdown and
  * pruning still apply to the columns that exist, and the quarantine
  * split is one pass (the corrupt flag is just another column).
  */
object DriftIngest {

  /** Marker bucket emitted by [[quarantineSummary]] for malformed rows. */
  val QuarantinedBucket = "__quarantined__"

  /** Read a JSON landing dir against `schema` (the widest version),
    * PERMISSIVE-parsing each line: well-formed records surface typed
    * (with nulls for fields their writer predates), malformed ones keep
    * `_corrupt_record` = the raw line and nulls elsewhere. The schema
    * passed in must NOT already contain `_corrupt_record`; it is added
    * here.
    */
  def readQuarantined(spark: SparkSession, dir: String,
                      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "readQuarantined adds _corrupt_record itself")
    spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
  }

  /** One-pass ingest health summary over a [[readQuarantined]] frame:
    * row counts per `bucketCol` value for clean rows plus a
    * [[QuarantinedBucket]] row for malformed ones. Single scan, single
    * aggregate — the corrupt flag is an ordinary column, so this is the
    * shape a 100 TB landing sweep wants (no anti-join, no second read).
    *
    * Note Spark refuses plans that reference ONLY `_corrupt_record`
    * (the parser can't know a row is corrupt without parsing the other
    * fields); grouping on a real column alongside it keeps the plan
    * legal without caching.
    */
  def quarantineSummary(parsed: DataFrame, bucketCol: String): DataFrame =
    parsed
      .groupBy(
        when(col("_corrupt_record").isNotNull, lit(QuarantinedBucket))
          .otherwise(coalesce(col(bucketCol).cast("string"), lit("__null__")))
          .as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Curated-zone read across schema versions: parquet `mergeSchema`
    * unions per-file schemas into the widest one; rows from files that
    * predate a column carry null there. Standard landing-zone evolution —
    * old files are never rewritten when the upstream adds a field.
    */
  def readEvolved(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** Streaming twin of [[readQuarantined]]: a live scraper drops JSON
    * lines that can go malformed mid-stream (truncated uploads, schema
    * drift); PERMISSIVE parsing keeps the pipeline running and the
    * quarantine column flowing into the same [[quarantineSummary]]
    * aggregation (complete mode) or a quarantine sink. Same scan-time
    * semantics as batch — no extra shuffle, no job failure on bad input.
    */
  def readQuarantinedStream(spark: SparkSession, dir: String,
                            schema: StructType,
                            maxFilesPerTrigger: Int = 1): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "readQuarantinedStream adds _corrupt_record itself")
    spark.readStream
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .json(dir)
  }
}
