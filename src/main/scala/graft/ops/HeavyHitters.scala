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
    *
    * Exactly TWO scans of the input: the MG pass also emits one
    * per-partition row-count row (key = null sentinel; real null keys are
    * filtered before the kernel), so the global total rides out of the
    * same pass instead of a third scan. The summary is bounded —
    * ≤ (k+1)·partitions rows — so collecting it is the same scale class
    * as the candidate broadcast phase 2 needs anyway; the driver never
    * holds more than the summaries.
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull)
    // Scan 1: per-partition Misra-Gries summaries + the partition row count.
    val summaries: Array[(String, Long)] = keys.as[String].mapPartitions { it =>
      var nPart = 0L
      val counters = mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        nPart += 1
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
      Iterator.single((null: String, nPart)) ++
        counters.keysIterator.map(c => (c, 0L))
    }.collect()
    val nTotal = summaries.iterator.filter(_._1 == null).map(_._2).sum
    val candidates = summaries.iterator.collect {
      case (c, _) if c != null => c
    }.toSeq.distinct.toDF("key")
    // Scan 2: exact recount of the candidate superset, exact threshold.
    keys.join(broadcast(candidates), Seq("key"), "left_semi")
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > lit(nTotal))
      .select(col("key"), col("cnt"))
  }
}
