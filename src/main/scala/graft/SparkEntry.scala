package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every operator family's query map; each key has a matching
  * DuckDB oracle in [[oracleSql]] (same column names, same ORDER BY) unless
  * the operator is not SQL-expressible (driver then does a rows-only check).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.all("q01_pricing_rollup")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.all ++ TextQueries.all ++ DedupQueries.all ++ MediaQueries.all ++
      ExtraQueries.all ++ GraphQueries.all ++ StreamQueries.all ++ LifecycleQueries.all ++
      SourceQueries.all ++ DriftQueries.all ++ ResolutionQueries.all ++
      CurationQueries.all ++ AnalyticsQueries.all ++ GovernanceQueries.all ++
      EvalQueries.all ++ NetworkQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ TextQueries.oracles ++ DedupQueries.oracles ++ MediaQueries.oracles ++
      ExtraQueries.oracles ++ GraphQueries.oracles ++ StreamQueries.oracles ++ LifecycleQueries.oracles ++
      SourceQueries.oracles ++ DriftQueries.oracles ++ ResolutionQueries.oracles ++
      CurationQueries.oracles ++ AnalyticsQueries.oracles ++
      GovernanceQueries.oracles ++ EvalQueries.oracles ++ NetworkQueries.oracles
}
