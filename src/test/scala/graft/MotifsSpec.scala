package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Motifs

class MotifsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------ two-hop

  test("twoHopCounts: distinct 2-hop reach, a != c, unbounded") {
    // 1→2, 2→3, 2→4, 1→3, 3→5: a=1 reaches {3,4,5}; a=2 reaches {5}.
    val e = Seq((1L, 2L), (2L, 3L), (2L, 4L), (1L, 3L), (3L, 5L))
      .toDF("src", "dst")
    val out = Motifs.twoHopCounts(e, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 1L))
  }

  test("twoHopCounts: duplicate and self-loop edges do not change counts") {
    val e = Seq((1L, 2L), (1L, 2L), (2L, 3L), (2L, 2L), (3L, 1L))
      .toDF("src", "dst")
    // a=1: {3}; a=2: via 3 → {1}; a=3: via 1 → {2}.
    val out = Motifs.twoHopCounts(e, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("twoHopCounts: midpoint degree cap prunes the hub, keeps quiet paths") {
    // Hub 100: 1→100 plus 100→2..8 (deg 8). Quiet path 1→2→3 (deg(2)=3).
    val e = ((2L to 8L).map(i => (100L, i)) ++ Seq((1L, 100L), (1L, 2L), (2L, 3L)))
      .toDF("src", "dst")
    val capped = Motifs.twoHopCounts(e, "src", "dst", maxMidDegree = Some(3))
      .as[(Long, Long)].collect().toMap
    // The cap removes 100 as a MIDPOINT (1→100→i gone) but not as a
    // source: 100→2→3 still counts, as does 1→2→3.
    assert(capped == Map(1L -> 1L, 100L -> 1L))
    val exact = Motifs.twoHopCounts(e, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(exact(1L) == 7L) // via 100: {2..8}; via 2: {3} — distinct = 7
  }

  // ------------------------------------------------------ co-occurrence

  test("coOccurrence: shared-item counts per canonical user pair") {
    val e = Seq(("A", 1L), ("B", 1L), ("C", 1L),
      ("A", 2L), ("B", 2L), ("A", 3L), ("B", 3L)).toDF("u", "item")
    val out = Motifs.coOccurrence(e, "u", "item")
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => ((a, b), n) }.toMap
    assert(out == Map(("A", "B") -> 3L, ("A", "C") -> 1L, ("B", "C") -> 1L))
  }

  test("coOccurrence: minShared filters, duplicates collapse first") {
    val e = Seq(("A", 1L), ("A", 1L), ("B", 1L), ("A", 2L), ("B", 2L))
      .toDF("u", "item")
    val out = Motifs.coOccurrence(e, "u", "item", minShared = 2L)
      .as[(String, String, Long)].collect()
    assert(out.toSeq == Seq(("A", "B", 2L)))
  }

  test("coOccurrence: item degree cap drops the viral item before the pair join") {
    // Item 99 touched by everyone; items 1,2 shared only by A,B.
    val users = Seq("A", "B", "C", "D", "E")
    val e = (users.map(u => (u, 99L)) ++
      Seq(("A", 1L), ("B", 1L), ("A", 2L), ("B", 2L))).toDF("u", "item")
    val out = Motifs.coOccurrence(e, "u", "item", maxItemDegree = Some(4))
      .as[(String, String, Long)].collect()
    assert(out.toSeq == Seq(("A", "B", 2L))) // 99 pruned: no C/D/E pairs at all
  }
}
