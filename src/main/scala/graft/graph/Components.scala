package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the graph-serving query the
  * reference's mention/comment graph exists for (communities, spam rings,
  * conversation clusters) that Cypher answers with path matches
  * (`neo4j_insert/neo4j_twitter_insert.py:60-82`'s MENTIONS edges).
  *
  * Hash-min label propagation: every node starts labeled with its own id;
  * each pass a node takes the min of its own and its neighbors' labels.
  * Settles in O(diameter) passes — one hash join + one min-aggregate per
  * pass, both partial-aggregable, nothing driver-side but the convergence
  * counter. Social graphs are small-diameter, so the pass count stays
  * single-digit at any scale; for adversarial long-path graphs the
  * large-star/small-star variant (Kiveris et al., "Connected Components in
  * MapReduce and Beyond") drops it to O(log n) passes at the cost of
  * rewiring shuffles — same state shape, drop-in replacement here.
  */
object Components {

  /** (node, component) for every node in `edges`, where component = the
    * minimum node id reachable over undirected edges. State is
    * localCheckpoint-ed per pass (lineage truncation, as in
    * [[TreeOps.treeFlatten]]); labels decrease monotonically, so the state
    * is settled exactly when sum(label) stops moving.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIters: Int = 50): DataFrame = {
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    var labels = und.select(col("a").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint()
    var prevSum = -1L
    var curSum = sumLabels(labels)
    var iter = 0
    while (curSum != prevSum) {
      if (iter >= maxIters) throw new IllegalStateException(
        s"connectedComponents: not settled after $maxIters passes " +
          "(graph diameter exceeds maxIters)")
      val nbr = und.join(labels, col("b") === col("node"))
        .select(col("a").as("node"), col("label"))
      labels = labels.union(nbr)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      prevSum = curSum
      curSum = sumLabels(labels)
      iter += 1
    }
    labels.select(col("node"), col("label").as("component"))
  }

  private def sumLabels(labels: DataFrame): Long =
    labels.agg(coalesce(sum(col("label")), lit(0L))).collect()(0).getLong(0)
}
