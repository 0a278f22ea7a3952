package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table utilities (SURVEY.md §4 "repartition()/bucketing for
  * co-located joins"). Writing both sides of a hot join bucketed (and
  * sorted) by the join key makes the join shuffle-free forever after: the
  * scan itself satisfies the join's required distribution, so at 100 TB the
  * recurring cost of the fact-to-fact join drops from a full exchange of
  * both sides per query to zero.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed parquet table. Bucket count
    * should be sized so a bucket of the larger table fits an executor
    * (rows/buckets × row width ≲ executor memory share).
    */
  def writeBucketed(df: DataFrame, table: String,
                    bucketCol: String, numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Equi-join two co-bucketed tables on their bucket key — planned
    * without any Exchange when both sides were written with the same
    * bucket count on the join key.
    */
  def coLocatedJoin(left: DataFrame, right: DataFrame, key: String): DataFrame =
    left.join(right, Seq(key))
}
