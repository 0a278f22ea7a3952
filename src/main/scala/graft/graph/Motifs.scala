package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-hop graph pattern ("motif") queries — the interactive asks the
  * reference serves from its Neo4j layer: mentions-of-mentions over the
  * MENTIONS fan-out (`neo4j_insert/neo4j_twitter_insert.py:60-82`) and
  * co-commenters over COMMENTED_ON (`glue/reddit_glue.py:92-99`).
  * Re-expressed as composable edge joins with the skew controls an
  * unbounded hub graph needs at 100 TB.
  */
object Motifs {

  /** Directed 2-hop reach: for each `a`, the count of DISTINCT `c` with
    * a → b → c (a ≠ c). "Users mentioned by the users X mentions."
    *
    * Shape: one self-join keyed on the midpoint b, then a distinct +
    * count keyed on a. The scale hazard is the midpoint hub — a b with
    * in-degree i and out-degree o emits i·o pair rows. `maxMidDegree`
    * bounds that fan-out by dropping midpoints whose TOTAL degree
    * exceeds the cap (the production norm for interactive motif queries
    * — a celebrity account is noise for "friends-of-friends" anyway;
    * same degree-bounding idea as the (deg, id) edge orientation in
    * [[GraphAlgos.triangleCounts]]). With the cap on, pair fan-out per
    * midpoint is ≤ cap², independent of the hottest hub. Pass None for
    * the exact unbounded answer.
    */
  def twoHopCounts(edges: DataFrame, srcCol: String, dstCol: String,
                   maxMidDegree: Option[Long] = None): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
    // Midpoint degree (in + out) over the deduped edge set; pruning the
    // first hop's dst is enough — a pruned midpoint then never keys the
    // join, so the second hop never fans out from it.
    val first = maxMidDegree match {
      case None => e
      case Some(cap) =>
        val ok = e.select(col("src").as("node"))
          .unionAll(e.select(col("dst").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") <= cap)
          .select(col("node").as("dst"))
        e.join(ok, Seq("dst"), "left_semi")
    }
    val x = first.select(col("src").as("a"), col("dst").as("b"))
    val y = e.select(col("src").as("b"), col("dst").as("c"))
    x.join(y, Seq("b"))
      .filter(col("a") =!= col("c"))
      .select(col("a"), col("c")).distinct()
      .groupBy(col("a")).agg(count(lit(1)).as("n_two_hop"))
  }

  /** Co-occurrence pairs over a bipartite edge list (user → item):
    * for each unordered user pair sharing ≥ `minShared` items, the count
    * of shared items. "Users who commented on the same posts."
    *
    * Shape: self-join keyed on the item, canonicalized u1 < u2, one
    * count aggregate. Hot items (a viral post with d commenters) emit
    * d² pairs — `maxItemDegree` drops items above the cap before the
    * join (same rationale as [[twoHopCounts]]: for co-engagement
    * similarity, ultra-hot items carry no signal and all the cost).
    */
  def coOccurrence(edges: DataFrame, userCol: String, itemCol: String,
                   minShared: Long = 1L,
                   maxItemDegree: Option[Long] = None): DataFrame = {
    val e = edges.select(col(userCol).as("u"), col(itemCol).as("item"))
      .filter(col("u").isNotNull && col("item").isNotNull)
      .distinct()
    val bounded = maxItemDegree match {
      case None => e
      case Some(cap) =>
        val ok = e.groupBy(col("item")).agg(count(lit(1)).as("d"))
          .filter(col("d") <= cap).select(col("item"))
        e.join(ok, Seq("item"), "left_semi")
    }
    val l = bounded.select(col("item"), col("u").as("u1"))
    val r = bounded.select(col("item"), col("u").as("u2"))
    l.join(r, Seq("item"))
      .filter(col("u1") < col("u2"))
      .groupBy(col("u1"), col("u2")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
