package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity resolution — edit-distance record matching that
  * never goes all-pairs.
  *
  * The reference pipeline dedups records by exact id (Cypher MERGE, DynamoDB
  * keys); the operation users reach for next is FUZZY matching: "these two
  * records are the same entity up to typos". Naive fuzzy join is O(n²)
  * levenshtein — a non-starter at 100 TB. The standard scalable shape
  * (Papadakis et al., "Blocking and Filtering Techniques for Entity
  * Resolution", CSUR 2020) is:
  *
  *   1. BLOCK: records sharing a cheap discriminative key (here: language +
  *      first token + length bucket) are candidates; the candidate join is a
  *      plain equi-join Spark shuffles on the block key.
  *   2. PURGE: blocks bigger than `blockCap` are dropped entirely — an
  *      oversized block means the key is non-discriminative there (stop-word
  *      first token), and its pairs are near-certain non-matches. Purging
  *      bounds the worst block at cap², making the whole operator's work
  *      O(#blocks · cap²) regardless of skew — the census is a
  *      partial-aggregated count, not a window over the sorted table.
  *   3. VERIFY: the surviving pairs run bounded-prefix `levenshtein` with
  *      Spark's threshold form (early-exits the DP once the budget is blown,
  *      Apache Spark `StringUtils.getLevenshteinDistance(s, t, threshold)`
  *      semantics) — cost per pair is O(prefixLen · maxDist), not
  *      O(len²).
  *
  * Both engines (Spark plan and DuckDB oracle) see identical semantics:
  * candidates = equal block key in a retained block, match = prefix edit
  * distance ≤ maxDist; the hash gate is exact.
  */
object EntityResolution {

  /** The blocking key: (extra blocking columns…, first whitespace token,
    * length bucket). Length bucketing folds the cheap length filter into the
    * block key itself: two strings whose lengths differ by more than the
    * bucket width can't share a bucket, and edit distance ≥ length
    * difference prunes them for free.
    */
  def blockKey(text: Column, lenBucket: Int): Column =
    struct(split(text, " ").getItem(0).as("tok"),
      (length(text) / lenBucket).cast("int").as("lb"))

  /** All within-block pairs (id_a < id_b) whose `prefixLen`-bounded edit
    * distance is ≤ `maxDist`, from blocks of size ≤ `blockCap`.
    *
    * Returns `(id_a, id_b, dist)` plus the left row's `carryCols`.
    */
  def blockedFuzzyPairs(df: DataFrame, idCol: String, textCol: String,
                        extraBlockCols: Seq[String], lenBucket: Int,
                        blockCap: Int, prefixLen: Int, maxDist: Int,
                        carryCols: Seq[String] = Nil): DataFrame = {
    val blockCols = extraBlockCols.map(col) :+ blockKey(col(textCol), lenBucket).as("__bk")
    val recs = df.select(
      (Seq(col(idCol), substring(col(textCol), 1, prefixLen).as("__pre")) ++
        carryCols.map(col) ++ blockCols): _*)

    // Block census: partial-aggregated count per block key — one narrow
    // exchange over (blockCols), map-side combined. Purge oversized blocks
    // BEFORE the pair join so no task ever materializes a hot block's pairs.
    val keyNames = extraBlockCols :+ "__bk"
    val kept = recs.join(
      recs.groupBy(keyNames.map(col): _*).agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= blockCap)
        .select(keyNames.map(col): _*),
      keyNames, "left_semi")

    val a = kept.select(
      (Seq(col(idCol).as("id_a"), col("__pre").as("__pre_a")) ++
        carryCols.map(c => col(c)) ++ keyNames.map(col)): _*)
    val b = kept.select(
      (Seq(col(idCol).as("id_b"), col("__pre").as("__pre_b")) ++
        keyNames.map(col)): _*)

    // Threshold-form levenshtein: -1 once the DP exceeds maxDist, so the
    // verify kernel is O(prefixLen·maxDist) per pair and the filter is a
    // single non-negative check.
    val dist = levenshtein(col("__pre_a"), col("__pre_b"), maxDist)
    a.join(b, keyNames)
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", dist)
      .filter(col("dist") >= 0)
      .drop("__pre_a", "__pre_b", "__bk")
  }
}
