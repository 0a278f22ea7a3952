package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup. Every variant is a
  * shuffle-on-candidate-key plan — never an all-pairs cross join — so the
  * cost at 100 TB is O(n) map work plus one hash exchange per banding pass.
  */
object Dedup {

  /** Exact dedup: keep the minimum-id row per identical key column (hash
    * groupBy — partial aggregation map-side, one shuffle).
    */
  def exactDedup(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(min(col(idCol)).as(idCol))

  /** Word k-shingles of a text column (distinct, as array). */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(text, " ")
    val n = size(toks)
    array_distinct(
      transform(sequence(lit(0), greatest(n - k, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Deterministic 64-bit hash of a string expression with seed mixing —
    * pure column arithmetic (Rabin-style polynomial over chars, then an
    * xorshift-ish avalanche), reproducible across engines/runs.
    */
  private def polyHash(s: Column, seed: Long): Column = {
    val base = aggregate(split(s, ""), lit(seed),
      (acc, ch) => acc * lit(1000003L) + coalesce(ascii(ch).cast(LongType), lit(0L)))
    // avalanche: spread low-entropy highs into the low bits
    val x1 = base.bitwiseXOR(shiftright(base, 33))
    val x2 = x1 * lit(-49064778989728563L) // 0xFF51AFD7ED558CCDL as signed
    x2.bitwiseXOR(shiftright(x2, 33))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum over the doc's shingles. Returns ArrayType(Long) of length
    * `numHashes`. All expression-level — no UDF, no collect.
    */
  def minhashSignature(text: Column, shingleK: Int, numHashes: Int): Column = {
    val sh = shingles(text, shingleK)
    array((0 until numHashes).map { i =>
      array_min(transform(sh, s => polyHash(s, 0x9E3779B9L * (i + 1))))
    }: _*)
  }

  /** MinHash + LSH banded near-dup candidate pairs.
    *
    * Signature rows are exploded into `bands` band-hash keys; docs sharing a
    * band bucket become candidate pairs (self-join on the band key — a hash
    * shuffle on band values, never n²). Pairs are then verified with exact
    * shingle-set Jaccard and filtered by `threshold`.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, distinct.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", minhashSignature(col("text"), shingleK, numHashes))
    val banded = sig.select(col("id"), col("text"), posexplode(
      array((0 until bands).map(b =>
        slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)): _*)).as(Seq("band", "bandsig")))
    val a = banded.select(col("band"), col("bandsig"),
      col("id").as("id_a"), col("text").as("text_a"))
    val b = banded.select(col("band"), col("bandsig"),
      col("id").as("id_b"), col("text").as("text_b"))
    val cand = a.join(b, Seq("band", "bandsig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "text_a", "text_b").distinct()
    cand
      .withColumn("jaccard", jaccard(
        shingles(col("text_a"), shingleK), shingles(col("text_b"), shingleK)))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact Jaccard similarity of two (already distinct) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** SimHash: 64-bit signature where bit j is the sign of the sum over
    * tokens of (tokenHash bit j ? +1 : -1). Near-dups = small Hamming
    * distance between signatures. Expression-only.
    */
  def simhash(text: Column): Column = {
    val toks = array_distinct(split(text, " "))
    val hashes = transform(toks, t => polyHash(t, 0x85EBCA6BL))
    (0 until 64).map { j =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      when(votes > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce[Column]((x, y) => x.bitwiseOR(y))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** n-gram (word) Jaccard near-dup pairs over blocking keys: candidates are
    * pairs agreeing on `blockCols` (cheap blocking join), verified by exact
    * token-set Jaccard ≥ threshold. For corpora where a natural blocking key
    * exists (source, length bucket); the general path is minhashNearDups.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[String], threshold: Double): DataFrame = {
    val base = df.select((idCol +: textCol +: blockCols).map(col): _*)
    val a = base.select(
      (Seq(col(idCol).as("id_a"), col(textCol).as("text_a")) ++ blockCols.map(col)): _*)
    val b = base.select(
      (Seq(col(idCol).as("id_b"), col(textCol).as("text_b")) ++ blockCols.map(col)): _*)
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(
        array_distinct(split(col("text_a"), " ")), array_distinct(split(col("text_b"), " "))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding-cosine near-dup pairs via sign-LSH bucketing: docs whose
    * embeddings agree on the sign pattern across `planes` pseudo-random
    * hyperplanes land in one bucket; verify with exact cosine ≥ threshold.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, planes: Int = 8): DataFrame = {
    import graft.similarity.Similarity.{cosine, signBucket}
    val withB = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", signBucket(col("v"), planes))
    val a = withB.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = withB.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine").distinct()
  }
}
