package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup. Every variant is a
  * shuffle-on-candidate-key plan — never an all-pairs cross join — so the
  * cost at 100 TB is O(n) map work plus one hash exchange per banding pass.
  *
  * All hashes are mod-prime polynomial folds kept under 2^61 at every step:
  * deterministic, seedable, and expressible in any ANSI engine (no int64
  * wraparound, which engines like DuckDB reject), so every operator here is
  * oracle-checkable end to end.
  */
object Dedup {

  /** Modulus for all rolling hashes (fits squared-ish intermediates in i64). */
  val P = 1000000007L
  /** Affine rehash constants for the i-th hash function. */
  def hashA(i: Int): Long = ((i + 1) * 2654435761L) % P
  def hashB(i: Int): Long = ((i + 1) * 1013904223L) % P

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

  /** Portable 30-bit rolling hash of a string: fold (acc*31 + code) mod P
    * over the character stream. Pure column arithmetic, reproducible across
    * engines and runs.
    */
  def charHash(s: Column): Column =
    aggregate(split(s, ""), lit(0L),
      (acc, ch) => (acc * lit(31L) + coalesce(ascii(ch).cast(LongType), lit(0L))) % lit(P))

  /** i-th seeded hash: affine rehash (A_i * h + B_i) mod P. */
  def seeded(h: Column, i: Int): Column = (lit(hashA(i)) * h + lit(hashB(i))) % lit(P)

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum over the doc's shingles. Returns ArrayType(Long) of length
    * `numHashes`. All expression-level — no UDF, no collect.
    */
  def minhashSignature(text: Column, shingleK: Int, numHashes: Int): Column = {
    val hs = transform(shingles(text, shingleK), s => charHash(s))
    array((0 until numHashes).map { i =>
      array_min(transform(hs, h => seeded(h, i)))
    }: _*)
  }

  /** Fold a band's signature slice to one long key (fixed-width shuffle key
    * instead of an array join key).
    */
  def bandHash(sig: Column, from: Int, len: Int): Column =
    aggregate(slice(sig, lit(from + 1), lit(len)), lit(0L),
      (acc, v) => (acc * lit(1000003L) + v) % lit(P))

  /** MinHash + LSH banded near-dup candidate pairs.
    *
    * Signature rows are exploded into `bands` (band, bandHash) keys; docs
    * sharing a band bucket become candidate pairs (self-join on the long
    * band key — a hash shuffle on band values, never n²). Pairs are then
    * verified with exact shingle-set Jaccard and filtered by `threshold`.
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
        bandHash(col("sig"), b * rowsPerBand, rowsPerBand)): _*)).as(Seq("band", "bh")))
    val a = banded.select(col("band"), col("bh"),
      col("id").as("id_a"), col("text").as("text_a"))
    val b = banded.select(col("band"), col("bh"),
      col("id").as("id_b"), col("text").as("text_b"))
    val cand = a.join(b, Seq("band", "bh"))
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

  /** SimHash: 30-bit signature where bit j is set when more than half of the
    * (distinct) token hashes have bit j set. Near-dups = small Hamming
    * distance between signatures. Expression-only, engine-portable.
    */
  def simhash(text: Column, bits: Int = 30): Column = {
    val hs = transform(array_distinct(split(text, " ")), t => seeded(charHash(t), 0))
    val ntok = size(hs)
    (0 until bits).map { j =>
      val ones = size(filter(hs, h => shiftright(h, j).bitwiseAND(lit(1L)) === lit(1L)))
      when(ones * 2 > ntok, lit(1L << j)).otherwise(lit(0L))
    }.reduce[Column]((x, y) => x.bitwiseOR(y))
  }

  /** Hamming distance between two bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: candidates agree on one of `bands` contiguous
    * bit-bands of the signature (hash-join blocking, no n²), verified by
    * Hamming distance ≤ maxHamming.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      bits: Int = 30, bands: Int = 3, maxHamming: Int = 6): DataFrame = {
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1
    val sig = df.select(col(idCol).as("id"), simhash(col(textCol), bits).as("sig"))
    val banded = sig.select(col("id"), col("sig"), posexplode(
      array((0 until bands).map(b =>
        shiftright(col("sig"), b * bandBits).bitwiseAND(lit(mask))): _*)).as(Seq("band", "bh")))
    val a = banded.select(col("band"), col("bh"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bh"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sig_a"), col("sig_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

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
