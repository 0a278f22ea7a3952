package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.sources.DriftIngest

/** Schema-drift ingestion under the hard gate — the reference's
  * crawler re-infers schemas per partition (`terraform/main.tf:301-319`)
  * and its DynamicFrames tolerate per-record drift
  * (`glue/twitter_glue.py:154-161`); these queries drive the Spark-first
  * equivalents over a drifted landing fixture derived deterministically
  * from `documents`, so a plain-SQL oracle can recompute the expected
  * answer from the source table.
  *
  * Drift fixture (three deterministic thirds of `documents`):
  *   doc_id % 3 == 0 → old-schema JSON line (no `lang` field)
  *   doc_id % 3 == 1 → new-schema JSON line (with `lang`)
  *   doc_id % 3 == 2 → truncated line (malformed JSON — a partial write)
  */
object DriftQueries {

  /** Widest landing schema (what the reader knows TODAY). */
  private val landingSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("lang", StringType)))

  /** JSON landing dir with old-schema, new-schema and corrupt lines
    * interleaved. Built once per sf dir; text-mode write so the corrupt
    * lines stay byte-exact.
    */
  private def driftedLanding(s: SparkSession, dir: String): String =
    FixtureCache.dir("drift_landing", dir) { d =>
      val docs = Tables.load(s, dir, "documents")
      val lines = docs.select(
        when(col("doc_id") % 3 === 0,
            to_json(struct(col("doc_id"), col("source"))))
          .when(col("doc_id") % 3 === 1,
            to_json(struct(col("doc_id"), col("source"), col("lang"))))
          .otherwise(concat(lit("{\"doc_id\": "), col("doc_id"),
            lit(", \"source\": \"")))
          .as("value"))
      lines.repartition(4).write.mode("overwrite").text(d)
    }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PERMISSIVE ingest of the drifted landing zone: malformed lines
    // quarantined (counted, never dropped), old-schema rows parse with
    // lang = null, new-schema rows surface lang — one scan, one
    // aggregate.
    "q100_drift_quarantine" -> ((s, dir) => {
      val src = driftedLanding(s, dir)
      val parsed = DriftIngest.readQuarantined(s, src, landingSchema)
      DriftIngest.quarantineSummary(parsed, "lang")
        .orderBy(col("bucket"))
    }),

    // Curated-zone evolution: a parquet table written across two schema
    // versions (v1 lacks `lang`) read back with mergeSchema — v1 rows
    // carry lang null, no historical rewrite. Aggregate proves values
    // AND nulls land in the right rows.
    "q101_schema_evolution" -> ((s, dir) => {
      val curated = FixtureCache.dir("evolved_parquet", dir) { d =>
        val docs = Tables.load(s, dir, "documents")
        docs.filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), col("source"))
          .write.mode("overwrite").parquet(d)
        docs.filter(col("doc_id") % 3 === 1)
          .select(col("doc_id"), col("source"), col("lang"))
          .write.mode("append").parquet(d)
      }
      DriftIngest.readEvolved(s, curated)
        .groupBy(coalesce(col("lang"), lit("__pre_evolution__")).as("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_id"))
        .orderBy(col("lang"))
    }))

  val oracles: Map[String, String] = Map(
    "q100_drift_quarantine" ->
      """SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT CASE
        |    WHEN doc_id % 3 = 2 THEN '__quarantined__'
        |    WHEN doc_id % 3 = 0 THEN '__null__'
        |    ELSE lang END AS bucket
        |  FROM documents)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q101_schema_evolution" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN '__pre_evolution__'
        |       ELSE lang END AS lang,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_id
        |FROM documents WHERE doc_id % 3 IN (0, 1)
        |GROUP BY 1 ORDER BY lang""".stripMargin)
}
