package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Data-layout writer: range-cluster rows across files and sort within
  * them, so point/range predicates on the cluster key touch a handful of
  * files instead of all of them.
  *
  * At 100 TB the scan cost of `WHERE user_id = X` over an unclustered
  * landing zone is the whole table: every parquet file's row groups hold
  * an arbitrary slice of the key space, so min/max pruning skips nothing.
  * `repartitionByRange` gives each output file a disjoint key range
  * (range-partitioning exchange with a sampled histogram, no driver
  * bottleneck) and `sortWithinPartitions` makes row groups within a file
  * monotone, so both file-level and row-group-level min/max stats become
  * selective. This is the same layout discipline the hive-partitioned
  * landing sink applies to PARTITION columns (`topic=…/dataload=…`,
  * `reddit/lambda_function_initial.py:45`), extended to high-cardinality
  * keys where a directory per value would be pathological.
  */
object Layout {

  /** Write `df` to `path` as `files` range-clustered, internally-sorted
    * parquet files keyed by `clusterCols` (lexicographic).
    */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[String],
                     files: Int): Unit =
    df.repartitionByRange(files, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
