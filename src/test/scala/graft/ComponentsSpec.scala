package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Components

class ComponentsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("two chains and an isolated pair resolve to min-id components") {
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L)).toDF("src", "dst")
    val out = Components.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("a long path needs multiple passes and still settles") {
    val n = 40L
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val out = Components.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect()
    assert(out.length == n)
    assert(out.forall(_._2 == 1L))
  }

  test("edge direction is irrelevant (undirected semantics)") {
    val out = Components.connectedComponents(
        Seq((5L, 1L), (1L, 9L)).toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 5L -> 1L, 9L -> 1L))
  }

  test("null endpoints are dropped, not propagated") {
    val edges = Seq((Some(1L), Some(2L)), (Some(3L), None), (None, Some(4L)))
      .toDF("src", "dst")
    val out = Components.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }

  test("maxIters guard fails loudly rather than returning unsettled labels") {
    val edges = (1L until 20L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      Components.connectedComponents(edges, "src", "dst", maxIters = 2).collect()
    }
    assert(e.getMessage.contains("not settled"))
  }

  test("logN variant matches hash-min on a mixed graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L), (30L, 30L)).toDF("src", "dst")
    val a = Components.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    val b = Components.connectedComponentsLogN(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("logN settles a 300-node path in logarithmic rounds") {
    val n = 300L
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    // hash-min would need ~n passes; 15 rounds ≈ 2·log2(300) is plenty
    val out = Components.connectedComponentsLogN(edges, "src", "dst", maxIters = 15)
      .as[(Long, Long)].collect()
    assert(out.length == n)
    assert(out.forall(_._2 == 1L))
  }

  test("logN handles a hot star hub without materializing its neighborhood") {
    val edges = (2L to 2000L).map(i => (1L, i)).toDF("src", "dst")
    val out = Components.connectedComponentsLogN(edges, "src", "dst")
      .as[(Long, Long)].collect()
    assert(out.length == 2000)
    assert(out.forall(_._2 == 1L))
  }

  test("64-bit-scale ids do not overflow the convergence check (both variants)") {
    val big = Long.MaxValue
    val edges = Seq((big, big - 1), (big - 1, big - 2), (5L, 4L))
      .toDF("src", "dst")
    val a = Components.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(a == Map(big -> (big - 2), (big - 1) -> (big - 2),
      (big - 2) -> (big - 2), 5L -> 4L, 4L -> 4L))
    val b = Components.connectedComponentsLogN(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("string node ids work (no numeric-sum convergence assumption)") {
    val edges = Seq(("t3_b", "t3_a"), ("t3_b", "t3_c"), ("t1_x", "t1_y"))
      .toDF("src", "dst")
    val out = Components.connectedComponents(edges, "src", "dst")
      .as[(String, String)].collect().toMap
    assert(out == Map("t3_a" -> "t3_a", "t3_b" -> "t3_a", "t3_c" -> "t3_a",
      "t1_x" -> "t1_x", "t1_y" -> "t1_x"))
  }
}
