package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup

class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("charHashStr (kernel) matches charHash (expression) exactly") {
    val inputs = Seq("hello", "", "a b c", "The quick brown fox!", "x" * 100)
    val exprVals = inputs.toDF("s").select(Dedup.charHash(col("s"))).collect().map(_.getLong(0))
    val kernelVals = inputs.map(Dedup.charHashStr)
    assert(exprVals.toSeq == kernelVals)
  }

  test("exactDedup keeps min id per key") {
    val df = Seq(("dup", 5L), ("dup", 2L), ("uniq", 9L)).toDF("text", "id")
    val out = Dedup.exactDedup(df, "text", "id").orderBy("id")
    assert(out.collect().map(_.getLong(1)).toSeq == Seq(2L, 9L))
  }

  test("shingles produces distinct k-grams incl. short-text edge") {
    val df = Seq("a b c d", "a b").toDF("t").select(Dedup.shingles($"t", 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0).toSet == Set("a b c", "b c d"))
    assert(rows(1).toSet == Set("a b")) // n < k: one truncated shingle
  }

  test("minhash kernel bands match the expression-form signature") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    // expression form
    val exprSig = docs
      .withColumn("sh", Dedup.shingleHashes($"text", 3))
      .withColumn("sig", Dedup.minhashSignature($"sh", 16))
    val exprBands = exprSig.select($"doc_id", posexplode(
        array((0 until 4).map(b => Dedup.bandHash($"sig", b * 4, 4)): _*)).as(Seq("band", "bh")))
      .select("doc_id", "band", "bh").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // kernel form
    val kernelBands = Dedup.minhashBands(docs, "doc_id", "text", 3, 16, 4)
      .select("id", "band", "bh").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(exprBands == kernelBands)
  }

  test("minhashNearDups finds a planted near-duplicate, not the distinct doc") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val near = base.replace("mu", "nu") // one token differs
    val far = "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("simhash kernel matches expression form; identical docs have distance 0") {
    val docs = Seq((1L, "spark scala data pipeline"), (2L, "spark scala data pipeline"),
      (3L, "completely different words here")).toDF("doc_id", "text")
    val exprSigs = docs.select($"doc_id", Dedup.simhash($"text").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kernelSigs = Dedup.simhashBands(docs, "doc_id", "text", 30, 3)
      .select("id", "sig").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exprSigs == kernelSigs)
    assert(exprSigs(1L) == exprSigs(2L))
    assert(java.lang.Long.bitCount(exprSigs(1L) ^ exprSigs(3L)) > 0)
  }

  test("jaccard of arrays: identical=1, disjoint=0, empty-union=0") {
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a"), Seq("b")),
      (Seq.empty[String], Seq.empty[String])).toDF("x", "y")
      .select(Dedup.jaccard($"x", $"y").as("j"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(1.0, 0.0, 0.0))
  }

  test("ngramJaccardPairs respects blocking: cross-block dups are not candidates") {
    val df = Seq(
      (1L, "same text here", "b1"), (2L, "same text here", "b1"),
      (3L, "same text here", "b2")).toDF("doc_id", "text", "blk")
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", Seq("blk"), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("embeddingNearDups finds the planted duplicate vector") {
    val v = (0 until 64).map(i => math.sin(i + 1).toFloat)
    val v2 = v.updated(0, v(0) + 0.001f)
    val other = (0 until 64).map(i => math.cos(3 * i + 2).toFloat)
    val df = Seq((1L, v), (2L, v2), (3L, other)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(df, "vec_id", "embedding", threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }
}
