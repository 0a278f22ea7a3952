package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EntityResolution
import graft.text.TextOps

/** Wave-8 curation operators: prefix-filter similarity join exactness
  * (vs a brute-force all-pairs replay), boilerplate chunk removal and
  * reconstruction, and DSIR importance-score semantics.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sets(rows: Seq[(Long, Seq[String])]) =
    rows.toDF("id", "ts")

  test("prefixFilterPairs matches brute-force all-pairs exactly") {
    // 40 synthetic element-sets with a controlled near-dup structure:
    // pairs (2i, 2i+1) share most elements when i % 3 == 0; everything
    // else overlaps only through a handful of common elements.
    val rows = (0L until 40L).map { i =>
      val base = (0 until 12).map(j => s"e${(i / 2) * 17 + j}")
      val noise =
        if (i % 2 == 0) Seq(s"n$i") else Seq(s"n$i", s"m$i", "common")
      (i, ((if (i / 2 % 3 == 0) base else base.map(e => s"$e-${i % 2}")) ++
        noise).distinct)
    }
    val df = sets(rows)
    val got = EntityResolution
      .prefixFilterPairs(df, "id", col("ts"), 6, 10)
      .select("id_a", "id_b", "inter", "sz_a", "sz_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    val byId = rows.toMap
    val want = (for {
      a <- rows.map(_._1); b <- rows.map(_._1) if a < b
      sa = byId(a).toSet; sb = byId(b).toSet
      inter = (sa & sb).size
      if inter * 10 >= 6 * (sa.size + sb.size - inter)
    } yield (a, b, inter.toLong, sa.size.toLong, sb.size.toLong)).toSet
    assert(want.nonEmpty, "fixture must contain qualifying pairs")
    assert(got == want)
  }

  test("prefixFilterPairs at threshold 1.0 finds exactly the identical sets") {
    val df = sets(Seq(
      1L -> Seq("a", "b", "c"), 2L -> Seq("c", "b", "a"),
      3L -> Seq("a", "b"), 4L -> Seq("a", "b", "c", "d")))
    val got = EntityResolution.prefixFilterPairs(df, "id", col("ts"), 1, 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("containmentPairs matches brute-force asymmetric containment") {
    val rows = Seq(
      1L -> Seq("a", "b", "c"),                     // fully inside 2 and 4
      2L -> Seq("a", "b", "c", "d", "e"),
      3L -> Seq("x", "y", "z"),                     // unrelated
      4L -> Seq("a", "b", "c", "q"),
      5L -> Seq("a", "b", "x", "p", "r"),           // only 2/3 of 1 — below t
      6L -> Seq("c", "b", "a"))                     // equal set to 1
    val got = EntityResolution
      .containmentPairs(rows.toDF("id", "ts"), "id", col("ts"), 8, 10)
      .select("id_a", "id_b", "inter").as[(Long, Long, Long)].collect().toSet
    val byId = rows.toMap
    val want = (for {
      a <- rows.map(_._1); b <- rows.map(_._1) if a != b
      sa = byId(a).toSet; sb = byId(b).toSet
      if sa.size < sb.size || (sa.size == sb.size && a < b)
      inter = (sa & sb).size if inter * 10 >= 8 * sa.size
    } yield (a, b, inter.toLong)).toSet
    assert(want == Set((1L, 2L, 3L), (1L, 4L, 3L), (1L, 6L, 3L),
      (6L, 2L, 3L), (6L, 4L, 3L)))
    assert(got == want)
  }

  test("prefixFilterPairs matches brute force on seeded random corpora") {
    // Same randomized replay as containmentPairs below: the prefix-length
    // arithmetic and the integer cross-multiplied Jaccard must agree with
    // the O(n²) oracle on tiny/equal/threshold-edge sets.
    val rng = new scala.util.Random(20260815L)
    for (trial <- 1 to 3; (tn, td) <- Seq((6, 10), (1, 1))) {
      val rows = (1L to 40L).map { id =>
        val n = 1 + rng.nextInt(12)
        id -> Seq.fill(n)("e" + rng.nextInt(30)).distinct
      }
      val got = EntityResolution
        .prefixFilterPairs(rows.toDF("id", "ts"), "id", col("ts"), tn, td)
        .select("id_a", "id_b", "inter").as[(Long, Long, Long)]
        .collect().toSet
      val byId = rows.toMap
      val want = (for {
        a <- rows.map(_._1); b <- rows.map(_._1) if a < b
        sa = byId(a).toSet; sb = byId(b).toSet
        inter = (sa & sb).size
        if inter * td >= tn * (sa.size + sb.size - inter)
      } yield (a, b, inter.toLong)).toSet
      assert(got == want,
        s"trial $trial t=$tn/$td: got ${got.size} pairs, want ${want.size}")
    }
  }

  test("containmentPairs matches brute force on seeded random corpora") {
    // The r15 candidate prunes (positional bound, extended-prefix k-match)
    // are exact only if their pigeonhole arguments hold on every shape:
    // tiny sets, equal sets, t = 1, docs shorter than the probe prefix.
    // One fixed fixture can't cover that — replay 3 seeded random corpora
    // at two thresholds against the O(n²) oracle.
    val rng = new scala.util.Random(20260816L)
    for (trial <- 1 to 3; (tn, td) <- Seq((8, 10), (1, 1))) {
      val rows = (1L to 40L).map { id =>
        val n = 1 + rng.nextInt(12)
        id -> Seq.fill(n)("e" + rng.nextInt(30)).distinct
      }
      val got = EntityResolution
        .containmentPairs(rows.toDF("id", "ts"), "id", col("ts"), tn, td)
        .select("id_a", "id_b", "inter").as[(Long, Long, Long)]
        .collect().toSet
      val byId = rows.toMap
      val want = (for {
        a <- rows.map(_._1); b <- rows.map(_._1) if a != b
        sa = byId(a).toSet; sb = byId(b).toSet
        if sa.size < sb.size || (sa.size == sb.size && a < b)
        inter = (sa & sb).size if inter * td >= tn * sa.size
      } yield (a, b, inter.toLong)).toSet
      assert(got == want,
        s"trial $trial t=$tn/$td: got ${got.size} pairs, want ${want.size}")
    }
  }

  test("ER pair joins treat null elements as absent (compact semantics)") {
    // ADVICE r15: the candidate-side size (token table: explode+equi-join,
    // drops nulls) and the verify-side size(__ts) (counted nulls) could
    // disagree on arrays containing null. Both kernels now array_compact
    // up front; null-bearing inputs must match the oracle on the
    // null-stripped sets exactly.
    val rows: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("a", null, "b", "c"),        // compacts to {a,b,c}
      2L -> Seq("a", "b", "c", null, "d", "e"),
      3L -> Seq(null, "c", "b", "a"),        // equal to 1 after compaction
      4L -> Seq("x", null, null, "y"),
      5L -> Seq("a", "b"))
    val byId = rows.map { case (id, ts) =>
      id -> ts.filter(_ != null).toSet
    }.toMap
    val gotC = EntityResolution
      .containmentPairs(rows.toDF("id", "ts"), "id", col("ts"), 8, 10)
      .select("id_a", "id_b", "inter", "sz_a", "sz_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val wantC = (for {
      a <- rows.map(_._1); b <- rows.map(_._1) if a != b
      sa = byId(a); sb = byId(b)
      if sa.size < sb.size || (sa.size == sb.size && a < b)
      inter = (sa & sb).size if inter * 10 >= 8 * sa.size
    } yield (a, b, inter.toLong, sa.size.toLong, sb.size.toLong)).toSet
    assert(wantC.nonEmpty && gotC == wantC)
    val gotP = EntityResolution
      .prefixFilterPairs(rows.toDF("id", "ts"), "id", col("ts"), 6, 10)
      .select("id_a", "id_b", "inter", "sz_a", "sz_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val wantP = (for {
      a <- rows.map(_._1); b <- rows.map(_._1) if a < b
      sa = byId(a); sb = byId(b)
      inter = (sa & sb).size
      if inter * 10 >= 6 * (sa.size + sb.size - inter)
    } yield (a, b, inter.toLong, sa.size.toLong, sb.size.toLong)).toSet
    assert(wantP.nonEmpty && gotP == wantP)
  }

  test("removeBoilerplateChunks drops cross-doc chunks and rebuilds in order") {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ") // one exact chunk
    val docs = Seq(
      (1L, s"$boiler u1 u2 u3"), // boiler + short unique tail
      (2L, s"$boiler v1 v2"),
      (3L, s"$boiler w1"),
      (4L, "x1 x2 x3"), // untouched: no boilerplate
      (5L, boiler) // fully emptied
    ).toDF("doc_id", "text")
    val out = TextOps
      .removeBoilerplateChunks(docs, "doc_id", "text", w = 10, minDocs = 3L)
      .select("doc_id", "n_chunks", "n_dropped", "new_text")
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(out(1L) == ((2L, 1L, "u1 u2 u3")))
    assert(out(2L) == ((2L, 1L, "v1 v2")))
    assert(out(3L) == ((2L, 1L, "w1")))
    assert(out(4L) == ((1L, 0L, "x1 x2 x3")))
    assert(out(5L) == ((1L, 1L, "")))
  }

  test("removeBoilerplateChunks keeps multi-chunk order and partial tails") {
    val c1 = (1 to 10).map(i => s"a$i").mkString(" ")
    val c2 = (1 to 10).map(i => s"z$i").mkString(" ")
    val docs = Seq(
      (1L, s"$c1 mid1 mid2 mid3 mid4 mid5 mid6 mid7 mid8 mid9 mid10 $c2 tail"),
      (2L, c1), (3L, c1), // make c1 cross-doc boilerplate (3 docs)
      (4L, c2), (5L, c2)  // c2 only in 3 docs too
    ).toDF("doc_id", "text")
    val out = TextOps
      .removeBoilerplateChunks(docs, "doc_id", "text", w = 10, minDocs = 3L)
      .filter(col("doc_id") === 1L)
      .select("n_chunks", "n_dropped", "new_text")
      .as[(Long, Long, String)].head()
    // doc 1 = [c1][mid×10][c2][tail]; c1 and c2 dropped, order kept.
    assert(out == ((4L, 2L,
      (1 to 10).map(i => s"mid$i").mkString(" ") + " tail")))
  }

  test("mmrRerank diversifies: near-duplicate of pick 1 loses to a diverse pick") {
    import graft.similarity.Similarity
    // Query along e0; candidates at +1° (a), +2° (b, near-dup of a) and
    // −5° (c, diverse). Pure relevance ranks b second (cos 2° > cos 5°),
    // but at λ = 0.5: score_b = cos2° − cos1° < 0 < cos5° − cos6° =
    // score_c, so MMR must pick c second.
    def ang(d: Double) = Seq(math.cos(math.toRadians(d)).toFloat,
      math.sin(math.toRadians(d)).toFloat)
    val corpus = Seq(
      (10L, ang(1)), (11L, ang(2)), (12L, ang(-5)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(corpus, Array(1f, 0f),
        "vec_id", "embedding", topN = 3, k = 3, relW = 1L, divW = 1L)
      .select("step", "id").as[(Int, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(10L, 12L, 11L))
  }

  test("mmrRerank step 1 is pure relevance with id tie-break") {
    import graft.similarity.Similarity
    val corpus = Seq(
      (5L, Seq(1f, 0f)), (3L, Seq(1f, 0f)), (4L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(corpus, Array(1f, 0f),
        "vec_id", "embedding", topN = 3, k = 1, relW = 7L, divW = 3L)
      .select("id").as[Long].collect()
    assert(out.toSeq == Seq(3L)) // equal rel → smaller id wins
  }

  test("gapFill carries the last observation forward, null before first") {
    import graft.ops.Intervals
    val obs = Seq(
      (1L, 2L, 100L), (1L, 5L, 200L), // key 1: observed at slots 2 and 5
      (2L, 4L, 999L)                  // key 2: first observation at slot 4
    ).toDF("k", "slot", "v")
    val out = Intervals.gapFill(obs, "k", "slot", "v", 1L, 6L)
      .select("k", "slot", "observed", "filled")
      .as[(Long, Long, Option[Long], Option[Long])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out.size == 12) // 2 keys × 6 slots
    assert(out((1L, 1L)) == ((None, None)))       // before first obs
    assert(out((1L, 2L)) == ((Some(100L), Some(100L))))
    assert(out((1L, 3L)) == ((None, Some(100L)))) // carried
    assert(out((1L, 5L)) == ((Some(200L), Some(200L))))
    assert(out((1L, 6L)) == ((None, Some(200L))))
    assert(out((2L, 3L)) == ((None, None)))
    assert(out((2L, 6L)) == ((None, Some(999L))))
  }

  test("gapFill: pre-grid observations seed the fill; post-grid are dropped") {
    import graft.ops.Intervals
    val obs = Seq(
      (1L, -3L, 50L), (1L, -1L, 70L), (1L, 4L, 200L), // two pre-grid, latest (70) seeds
      (2L, 9L, 999L),                                 // post-grid only: ignored
      (3L, 2L, 5L)                                    // plain in-grid key
    ).toDF("k", "slot", "v")
    val out = Intervals.gapFill(obs, "k", "slot", "v", 1L, 6L)
      .select("k", "slot", "observed", "filled")
      .as[(Long, Long, Option[Long], Option[Long])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out.size == 18) // 3 keys × 6 slots — post-grid row still grids its key
    assert(out((1L, 1L)) == ((None, Some(70L))))      // seeded by latest pre-grid
    assert(out((1L, 3L)) == ((None, Some(70L))))
    assert(out((1L, 4L)) == ((Some(200L), Some(200L)))) // in-grid takes over
    assert(out((1L, 6L)) == ((None, Some(200L))))
    assert(out((2L, 1L)) == ((None, None)))           // post-grid obs never leaks in
    assert(out((2L, 6L)) == ((None, None)))
    assert(out((3L, 2L)) == ((Some(5L), Some(5L))))
  }

  test("wavFrameEnergy frames real decoded samples with exact integer energy") {
    import graft.multimodal.Multimodal
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(k => ((v >> (8 * k)) & 0xff).toByte).toArray
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le(body.length.toLong, 4) ++ body
    val samples = Array[Short](3, -4, 5)
    val data = samples.flatMap(s => le((s.toInt & 0xffff).toLong, 2))
    val fmtBody = le(1L, 2) ++ le(1L, 2) ++ le(8000L, 4) ++
      le(16000L, 4) ++ le(2L, 2) ++ le(16L, 2)
    val body = "WAVE".getBytes("US-ASCII") ++
      chunk("fmt ", fmtBody) ++ chunk("data", data)
    val wav = "RIFF".getBytes("US-ASCII") ++ le(body.length.toLong, 4) ++ body
    val df = Seq((1L, wav), (2L, Array[Byte](1, 2, 3))) // row 2 malformed
      .toDF("id", "payload")
    val out = Multimodal.wavFrameEnergy(df, "payload", frame = 2)
      .select("id", "frame", "n_samples", "energy")
      .as[(Long, Int, Int, Long)].collect().sortBy(r => (r._1, r._2))
    // frames: [3, -4] -> 9+16 = 25; [5] (partial tail) -> 25
    assert(out.toSeq == Seq((1L, 0, 2, 25L), (1L, 1, 1, 25L)))
  }

  test("kCenterGreedy picks farthest-first with smaller-id ties") {
    import graft.similarity.Similarity
    // 1-dim line: positions 0, 1, 10, 11. Seed = min id (pos 0); next the
    // far end (pos 11); then positions 1 and 10 tie at distance 1e12 to
    // the chosen set -> smaller id (pos 1) wins step 3.
    val corpus = Seq(
      (1L, Seq(0f)), (2L, Seq(1f)), (3L, Seq(10f)), (4L, Seq(11f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kCenterGreedy(corpus, "vec_id", "embedding",
        k = 4, dim = 1)
      .select("step", "id", "dmin").as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(1L, 4L, 2L, 3L))
    assert(out(1)._3 == 11L * 1000000 * 11L * 1000000)
    assert(out(2)._3 == 1000000L * 1000000L)
  }

  test("importanceScores weighs target-distribution tokens up, integer-exactly") {
    val docs = Seq(
      (1L, "aa bb", true), (2L, "aa cc", true), // target slice
      (3L, "aa bb", false), (4L, "dd dd dd", false)
    ).toDF("doc_id", "text", "tgt")
    val out = TextOps
      .importanceScores(docs, "doc_id", "text", col("tgt"), scale = 1000L)
      .select("doc_id", "n_tok", "score")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // dfs: aa raw 3 / tgt 2; bb raw 2 / tgt 1; cc raw 1 / tgt 1; dd raw 1 / tgt 0
    // weights(scale 1000): aa (2000 div 3)=666, bb 500, cc 1000, dd 0
    assert(out(1L) == ((2L, (666L + 500L) / 2)))
    assert(out(2L) == ((2L, (666L + 1000L) / 2)))
    assert(out(3L) == ((2L, (666L + 500L) / 2)))
    assert(out(4L) == ((1L, 0L)))
  }
}
