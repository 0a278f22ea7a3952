package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{EntityResolution, Intervals, Skyline}

/** Wave-7 operators: interval coalescing, time-weighted integration, blocked
  * fuzzy ER, and the 2-D skyline — hand-computed fixtures covering the edge
  * semantics the oracle can't isolate (touching intervals, purge boundary,
  * duplicate skyline points, threshold early-exit).
  */
class IntervalOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("coalesce merges overlapping and TOUCHING intervals, splits true gaps") {
    // user 1: [0,10], [10,20] touch -> one island [0,20]; [25,30] separate.
    // user 2: [5,50] swallows [10,20] entirely; next start 21 <= 50 joins too.
    val iv = Seq(
      (1L, 0L, 10L, 1L), (1L, 10L, 20L, 2L), (1L, 25L, 30L, 3L),
      (2L, 5L, 50L, 4L), (2L, 10L, 20L, 5L), (2L, 21L, 22L, 6L)
    ).toDF("k", "s", "e", "id")
    val out = Intervals.coalesce(iv, "k", col("s"), col("e"), col("id"))
      .orderBy("k", "island_id")
      .select("k", "island_id", "island_start", "island_end", "n_intervals")
      .as[(Long, Long, Long, Long, Long)].collect.toSeq
    assert(out == Seq(
      (1L, 1L, 0L, 20L, 2L), (1L, 2L, 25L, 30L, 1L),
      (2L, 1L, 5L, 50L, 3L)))
  }

  test("coverage never double-counts overlap; max island is the longest span") {
    val iv = Seq((7L, 0L, 100L, 1L), (7L, 50L, 60L, 2L), (7L, 200L, 201L, 3L))
      .toDF("k", "s", "e", "id")
    val row = Intervals.coverage(iv, "k", col("s"), col("e"), col("id"))
      .select("n_islands", "covered_secs", "max_island_secs", "n_intervals")
      .as[(Long, Long, Long, Long)].head()
    assert(row == ((2L, 101L, 100L, 3L)))
  }

  test("timeWeightedSum integrates the step function; last point holds zero") {
    // k=1: v=100 held 10s, v=300 held 5s, final v=999 contributes nothing.
    val ev = Seq((1L, 0L, 100L, 1L), (1L, 10L, 300L, 2L), (1L, 15L, 999L, 3L))
      .toDF("k", "ts", "v", "id")
    val row = Intervals.timeWeightedSum(ev, "k", col("ts"), col("v"), col("id"))
      .select("weighted_sum_units", "held_secs")
      .as[(Long, Long)].head()
    assert(row == ((100L * 10 + 300L * 5, 15L)))
  }

  test("blockedFuzzyPairs: matches within block, purges hot blocks, -1 beyond threshold") {
    // Block key = (first token, len//20). "alpha..." strings share a block;
    // the "hot" family exceeds blockCap=3 and must be purged entirely.
    val docs = (Seq(
      (1L, "alpha bravo charlie"),   // pairs with 2 (dist 1) and 3 (dist <=10)
      (2L, "alpha bravo charlee"),
      (3L, "alpha bravo xxxxxxx"),
      (4L, "alpha " + "z" * 40)      // different length bucket -> no pair
    ) ++ (10L to 14L).map(i => (i, s"hot same same same"))).toDF("doc_id", "text")

    val pairs = EntityResolution.blockedFuzzyPairs(docs, "doc_id", "text",
        extraBlockCols = Nil, lenBucket = 20, blockCap = 3,
        prefixLen = 40, maxDist = 10)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect.toSeq.sorted
    // hot block (5 rows > cap 3) contributes nothing; id 4 is in another bucket.
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs.head._3 == 1) // charlie -> charlee is one substitution
    // Raise the cap: the hot block's identical strings all pair at dist 0.
    val hot = EntityResolution.blockedFuzzyPairs(docs, "doc_id", "text",
        Nil, 20, 100, 40, 10)
      .filter(col("id_a") >= 10).select("dist").as[Int].collect.toSeq
    assert(hot.size == 10 && hot.forall(_ == 0))
  }

  test("frontier2D keeps exactly the non-dominated points, ties collapsed") {
    val pts = Seq(
      ("g", 10L, 1L), ("g", 10L, 1L), // duplicate point: one frontier row, n=2
      ("g", 5L, 5L), ("g", 5L, 4L),   // (5,4) dominated by (5,5)
      ("g", 1L, 9L),
      ("g", 4L, 4L),                  // dominated by (5,5)
      ("h", 2L, 2L)
    ).toDF("grp", "x", "y")
    val out = Skyline.frontier2D(pts, Seq("grp"), col("x"), col("y"))
      .orderBy("grp", "x")
      .select("grp", "x", "y", "n_points")
      .as[(String, Long, Long, Long)].collect.toSeq
    assert(out == Seq(("g", 1L, 9L, 1L), ("g", 5L, 5L, 1L), ("g", 10L, 1L, 2L),
      ("h", 2L, 2L, 1L)))
  }
}
