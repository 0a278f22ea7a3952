package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** A/B instrument for the WIDE simhash mode (VERDICT r15 item 7): the
  * 30-bit/3-band contract (q34/q135's pinned recall floor) vs a 60-bit/
  * 4-band two-seed signature whose 15-bit bands collide ~2⁵ less often by
  * accident. Measures, per variant: banded-candidate count (the verify
  * join's input — the quantity the narrow mode's 10-bit bands inflate),
  * verified pair count, wall, and cross-variant pair overlap. On the
  * `zipf` corpus (q135's fixture) it also scores BOTH variants against
  * the PLANTED ground truth — families at doc_id ≡ 47/48/49 (mod 50):
  * (47,48) exact, (47,49)/(48,49) one-token near dups — the only
  * principled recall number, since the two signatures' Hamming spaces are
  * not comparable pair-for-pair.
  *
  * Args: sfDir [wideHamming] [docs|zipf]
  */
object SimhashWideAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_sf10")
    val wideH = args.lift(1).map(_.toInt).getOrElse(6)
    val corpus = args.lift(2).getOrElse("docs")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = (if (corpus == "zipf") DedupQueries.zipfCorpus(spark, dir)
                else Tables.load(spark, dir, "documents"))
      .localCheckpoint()
    println(s"SIMHASH_AB corpus=$corpus docs=${docs.count()} dir=$dir")

    // The dense `documents` fixture yields 10⁷–10⁸ verified pairs at
    // sf10 — pair SETS are collected only on the zipf corpus (small,
    // planted-truth-scorable); the docs corpus reports distributed counts.
    val collectSets = corpus == "zipf"
    def leg(tag: String, bits: Int, bands: Int, maxHamming: Int)
        : Set[(Long, Long)] = {
      val t0 = System.nanoTime()
      val cands = Dedup.bucketedPairs(
        Dedup.simhashBands(docs, "doc_id", "text", bits, bands),
        Seq("band", "bh"), "id", 4096).count()
      val tCand = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val pairsDf = Dedup.simhashNearDups(docs, "doc_id", "text",
          bits = bits, bands = bands, maxHamming = maxHamming)
        .select(col("id_a").cast("long"), col("id_b").cast("long"))
      val (pairs, nPairs) =
        if (collectSets) {
          val p = pairsDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          (p, p.size.toLong)
        } else (Set.empty[(Long, Long)], pairsDf.count())
      val tAll = (System.nanoTime() - t1) / 1e9
      println(f"SIMHASH_AB $tag bits=$bits bands=$bands h<=$maxHamming " +
        f"candidates=$cands%,d pairs=$nPairs%,d " +
        f"cand_wall=$tCand%.1f s full_wall=$tAll%.1f s")
      pairs
    }

    val narrow = leg("contract", 30, 3, 3)
    val wide = leg("wide", 60, 4, wideH)
    if (collectSets) {
      val overlap =
        if (narrow.isEmpty) 1.0
        else narrow.count(wide.contains).toDouble / narrow.size
      println(f"SIMHASH_AB contract_pairs_also_in_wide=$overlap%.4f " +
        f"(wide-only pairs: ${wide.count(!narrow.contains(_))}%,d)")
    }

    if (corpus == "zipf") {
      // planted families: (a, a+1) exact, (a, a+2) and (a+1, a+2) near,
      // for every anchor a ≡ 47 (mod 50) whose family fits in the id range
      val ids = docs.select(col("doc_id").cast("long"))
        .collect().map(_.getLong(0)).toSet
      val truthExact = ids.filter(a => a % 50 == 47 && ids(a + 1))
        .map(a => (a, a + 1))
      val truthNear = ids.filter(a => a % 50 == 47 && ids(a + 2))
        .flatMap(a => Seq((a, a + 2), (a + 1, a + 2)))
      def score(tag: String, got: Set[(Long, Long)]): Unit = {
        val re = truthExact.count(got.contains).toDouble / math.max(1, truthExact.size)
        val rn = truthNear.count(got.contains).toDouble / math.max(1, truthNear.size)
        val extra = got.count(p => !truthExact(p) && !truthNear(p))
        println(f"SIMHASH_AB truth[$tag] exact_recall=$re%.4f " +
          f"near_recall=$rn%.4f non_planted_pairs=$extra%,d " +
          f"(truth: ${truthExact.size}%,d exact + ${truthNear.size}%,d near)")
      }
      score("contract", narrow)
      score("wide", wide)
    }
    spark.stop()
  }
}
