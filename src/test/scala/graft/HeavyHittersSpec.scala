package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HeavyHitters
import graft.pipeline.Incremental
import graft.text.TextOps

/** Round-3 operator specs: exact heavy hitters, incremental aggregate
  * maintenance, TF-IDF ranking.
  */
class HeavyHittersSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("heavy hitters: exactly the keys above n/k, with exact counts") {
    // 100 rows: 'a'×40, 'b'×25, 'c'×20, d0..d14 ×1. k=6 → threshold 16.66.
    val rows = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(20)("c") ++
      (0 until 15).map(i => s"d$i")
    val df = rows.toDF("k").repartition(7) // force multi-partition summaries
    val out = HeavyHitters.heavyHitters(df, "k", 6)
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 40L, "b" -> 25L, "c" -> 20L))
  }

  test("heavy hitters: boundary count exactly n/k is NOT a hitter; nulls dropped") {
    // 20 non-null rows, k=4 → threshold 5: 'x'×5 is exactly n/k, excluded.
    val rows = Seq.fill(5)(Some("x")) ++ Seq.fill(8)(Some("y")) ++
      (0 until 7).map(i => Some(s"z$i")) ++ Seq.fill(3)(None: Option[String])
    val out = HeavyHitters.heavyHitters(rows.toDF("k"), "k", 4)
      .as[(String, Long)].collect().toMap
    assert(out == Map("y" -> 8L))
  }

  test("heavy hitters: k larger than cardinality degrades to plain having") {
    val out = HeavyHitters.heavyHitters(
        Seq("a", "a", "b").toDF("k"), "k", 100)
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 1L)) // both > 3/100
  }

  test("mergeAggregate: folding batches equals the full recompute; new keys appear") {
    val base = Seq(("a", 10L, 1L), ("b", 20L, 1L)).toDF("k", "v", "n")
      .groupBy("k").agg(sum($"v").as("v"), sum($"n").as("n"))
    val batch = Seq(("b", 5L, 1L), ("c", 7L, 1L), ("c", 3L, 1L)).toDF("k", "v", "n")
    val out = Incremental.mergeAggregate(base, batch, Seq("k"), Seq("v", "n"))
      .as[(String, Long, Long)].collect()
      .map { case (k, v, n) => k -> ((v, n)) }.toMap
    assert(out == Map("a" -> ((10L, 1L)), "b" -> ((25L, 2L)), "c" -> ((10L, 2L))))
  }

  test("tfidf: corpus-wide terms rank below distinctive ones; ties break by token") {
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the dog ran"),
      (3L, "the the the")).toDF("id", "text")
    val out = TextOps.tfidfTopTerms(docs, "id", "text", k = 2)
      .select($"doc_id", $"rank", $"token")
      .as[(Long, Long, String)].collect().toSet
    // doc 1: cat/sat df=1 (score 3e6) beat 'the' df=3; alphabetical tie.
    assert(out.contains((1L, 1L, "cat")) && out.contains((1L, 2L, "sat")))
    assert(out.contains((2L, 1L, "dog")) && out.contains((2L, 2L, "ran")))
    // doc 3: only 'the' → one row, tf=3: score (3*1e6*3)/3 = 3e6.
    assert(out.count(_._1 == 3L) == 1 && out.contains((3L, 1L, "the")))
  }
}
