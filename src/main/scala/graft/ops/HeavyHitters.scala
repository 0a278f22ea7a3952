package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact frequent-items ("heavy hitters") at scan scale: every key whose
  * count strictly exceeds n/k, found WITHOUT a full-cardinality aggregate.
  *
  * Two phases:
  *  1. A per-partition Misra-Gries summary with k counters (mapPartitions
  *     kernel, O(k) memory per task). MG retains every key whose local
  *     count exceeds n_p/(k+1); summing the bound across partitions, any
  *     key with GLOBAL count > n/k must survive in at least one partition
  *     — the union of summaries is a guaranteed superset of the answer.
  *  2. An exact recount of only the candidates (a broadcast semi-join —
  *     at most k keys per partition survive phase 1 — then one hash
  *     aggregate over the matching rows) and the exact threshold filter
  *     `count * k > n`.
  *
  * Versus a plain groupBy-count-filter, the full-cardinality shuffle
  * (every distinct key) is replaced by a shuffle of ≤ k·partitions
  * candidate keys plus a broadcast — the difference between shuffling a
  * 100 TB key space and shuffling kilobytes. The result is EXACT (phase 2
  * recount), unlike count-min/Misra-Gries used alone; approximation only
  * prunes, never decides.
  */
object HeavyHitters {

  /** Keys of `keyCol` (any type; compared via its string form) with count
    * strictly greater than n/k, with exact counts. Null keys are excluded
    * (a null can't carry equi-join/group identity). Output: (key, cnt).
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull)
    val candidates = keys.as[String].mapPartitions { it =>
      val counters = mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        if (counters.contains(x)) counters(x) += 1
        else if (counters.size < k) counters(x) = 1
        else {
          // Decrement-all step: O(k), amortized over >= k arrivals.
          val dead = mutable.ArrayBuffer.empty[String]
          counters.keysIterator.foreach { key =>
            val v = counters(key) - 1
            if (v == 0) dead += key else counters(key) = v
          }
          dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("key").distinct()
    val n = keys.agg(count(lit(1)).as("n_total"))
    keys.join(broadcast(candidates), Seq("key"), "left_semi")
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n))
      .filter(col("cnt") * k > col("n_total"))
      .select(col("key"), col("cnt"))
  }
}
