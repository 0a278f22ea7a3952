package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{CoreOps, EntityResolution, Intervals}
import graft.similarity.Similarity
import graft.text.TextOps

/** Graph-analytics queries over the interaction graph: sketched
  * neighborhood sizes (HyperBall/KMV), harmonic centrality, clustering
  * coefficient, reciprocity. Split out of CurationQueries along the
  * family seam (VERDICT r7 item 6).
  */
object NetworkQueries {

  import CoreOps.cents

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Neighborhood function (distance distribution) via KMV sketch
    // propagation — the HyperANF shape with an exactly-replayable
    // bottom-k sketch. Graph: the saturated event_id residue domain
    // gives a fixed 97-node out-degree-2 graph at every SF; 4 hops span
    // the exact regime (ball < k) and the estimator regime (ball ≥ k).
    "q196_neighborhood_kmv" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select((col("event_id") % 97).as("src"),
          ((col("event_id") * 31 + 7) % 97).as("dst"))
        .union(Tables.load(s, dir, "events")
          .select((col("event_id") % 97).as("src"),
            ((col("event_id") * 17 + 3) % 97).as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
      graft.graph.GraphAlgos.neighborhoodKmv(e, "src", "dst",
          k = 12, maxHops = 4)
        .orderBy(col("hop"), col("node"))
    }),


    // Harmonic centrality from the KMV ball sizes (HyperBall, Boldi &
    // Vigna 2013): H(n) = Σ_h (|ball_h| − |ball_{h−1}|)/h — how many
    // nodes n reaches, discounted by distance — in integer micros from
    // q196's sketch propagation (|ball_0| = 1). The whole centrality
    // costs one lag window over the (node, hop) estimates.
    "q199_harmonic_centrality" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select((col("event_id") % 97).as("src"),
          ((col("event_id") * 31 + 7) % 97).as("dst"))
        .union(Tables.load(s, dir, "events")
          .select((col("event_id") % 97).as("src"),
            ((col("event_id") * 17 + 3) % 97).as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
      val nf = graft.graph.GraphAlgos.neighborhoodKmv(e, "src", "dst",
        k = 12, maxHops = 4)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("node")).orderBy(col("hop"))
      nf.withColumn("prev", coalesce(lag(col("est"), 1).over(w), lit(1L)))
        .withColumn("gain", greatest(col("est") - col("prev"), lit(0L)))
        .groupBy(col("node"))
        .agg(sum(expr("(gain * 1000000) div hop")).as("h_micros"))
        .orderBy(col("h_micros").desc, col("node"))
        .limit(20)
    }),


    // Local clustering coefficient per node (how close a node's
    // neighborhood is to a clique): 2·triangles·10⁴ div deg·(deg−1) in
    // basis points, composing the degree-ordered triangle counter (q92's
    // wedge bound) with one distinct-neighbor degree agg.
    "q203_clustering_coeff" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events").select(
        (col("user_id") % 60).cast("long").as("x"),
        ((col("user_id") % 60 + 1 + col("event_id") % 5) % 60).cast("long").as("y"))
      val und = raw.filter(col("x") =!= col("y"))
        .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
        .distinct()
      val deg = und.select(col("a").as("node")).union(und.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val tri = graft.graph.GraphAlgos.triangleCounts(raw, "x", "y")
      deg.join(tri, Seq("node"), "left")
        .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
        .withColumn("coeff_bp", when(col("deg") >= 2,
          expr("(2 * n_tri * 10000) div (deg * (deg - 1))")).otherwise(lit(0L)))
        .orderBy(col("node"))
    }),


    // Directed-graph reciprocity: the fraction of edges whose reverse
    // edge also exists (mutual follows/replies), in basis points — one
    // distinct edge set + one self-semi-join on the swapped key.
    "q222_reciprocity" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events").select(
          (col("user_id") % 50).cast("long").as("src"),
          (((col("user_id") % 50) * 7 + col("event_id") % 11) % 50)
            .cast("long").as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      val recip = e.join(
        e.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")
      e.agg(count(lit(1)).as("n_edges")).crossJoin(
          recip.agg(count(lit(1)).as("n_reciprocal")))
        .select(col("n_edges"), col("n_reciprocal"),
          expr("(n_reciprocal * 10000) div n_edges").as("reciprocity_bp"))
    }),

  )

  val oracles: Map[String, String] = Map(

    // Exact ball sets from 4 unrolled frontier expansions, then the same
    // portable hash → bottom-k → (k−1)·M div h_k estimate per (node, hop).
    "q196_neighborhood_kmv" -> {
      val ballCtes = (1 to 4).map { h =>
        s"""b$h AS MATERIALIZED (
           |  SELECT DISTINCT node, m FROM (
           |    SELECT node, m FROM b${h - 1}
           |    UNION ALL
           |    SELECT ed.src AS node, b.m FROM ed JOIN b${h - 1} b ON b.node = ed.dst))""".stripMargin
      }.mkString(",\n")
      val hashUnion = (1 to 4).map { h =>
        s"SELECT $h AS hop, node, (${graft.dedup.Dedup.hashA(0)} * m + ${graft.dedup.Dedup.hashB(0)}) % 1000000007 AS mh FROM b$h"
      }.mkString(" UNION ALL ")
      s"""WITH ed AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT event_id % 97 AS src, (event_id * 31 + 7) % 97 AS dst FROM events
         |    UNION ALL
         |    SELECT event_id % 97, (event_id * 17 + 3) % 97 FROM events)
         |  WHERE src <> dst),
         |n0 AS (SELECT DISTINCT src AS node FROM ed
         |       UNION SELECT DISTINCT dst FROM ed),
         |b0 AS (SELECT node, node AS m FROM n0),
         |$ballCtes,
         |hh AS ($hashUnion),
         |r AS (
         |  SELECT hop, node, mh,
         |    row_number() OVER (PARTITION BY hop, node ORDER BY mh) AS rn,
         |    count(*) OVER (PARTITION BY hop, node) AS c
         |  FROM hh)
         |SELECT node, hop, CAST(least(c, 12) AS BIGINT) AS n_sk,
         |  CAST(CASE WHEN min(c) < 12 THEN min(c)
         |       ELSE (CAST(11 AS BIGINT) * 1000000007)
         |            // min(CASE WHEN rn = 12 THEN mh END) END
         |    AS BIGINT) AS est
         |FROM r GROUP BY node, hop, c
         |ORDER BY hop, node""".stripMargin
    },


    // q196's ball-size replay extended by the lag-difference harmonic sum.
    "q199_harmonic_centrality" -> {
      val ballCtes = (1 to 4).map { h =>
        s"""b$h AS MATERIALIZED (
           |  SELECT DISTINCT node, m FROM (
           |    SELECT node, m FROM b${h - 1}
           |    UNION ALL
           |    SELECT ed.src AS node, b.m FROM ed JOIN b${h - 1} b ON b.node = ed.dst))""".stripMargin
      }.mkString(",\n")
      val hashUnion = (1 to 4).map { h =>
        s"SELECT $h AS hop, node, (${graft.dedup.Dedup.hashA(0)} * m + ${graft.dedup.Dedup.hashB(0)}) % 1000000007 AS mh FROM b$h"
      }.mkString(" UNION ALL ")
      s"""WITH ed AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT event_id % 97 AS src, (event_id * 31 + 7) % 97 AS dst FROM events
         |    UNION ALL
         |    SELECT event_id % 97, (event_id * 17 + 3) % 97 FROM events)
         |  WHERE src <> dst),
         |n0 AS (SELECT DISTINCT src AS node FROM ed
         |       UNION SELECT DISTINCT dst FROM ed),
         |b0 AS (SELECT node, node AS m FROM n0),
         |$ballCtes,
         |hh AS ($hashUnion),
         |r AS (
         |  SELECT hop, node, mh,
         |    row_number() OVER (PARTITION BY hop, node ORDER BY mh) AS rn,
         |    count(*) OVER (PARTITION BY hop, node) AS c
         |  FROM hh),
         |est AS (
         |  SELECT node, hop,
         |    CAST(CASE WHEN min(c) < 12 THEN min(c)
         |         ELSE (CAST(11 AS BIGINT) * 1000000007)
         |              // min(CASE WHEN rn = 12 THEN mh END) END
         |      AS BIGINT) AS est
         |  FROM r GROUP BY node, hop, c),
         |g AS (
         |  SELECT node, hop, est,
         |    greatest(est - coalesce(lag(est) OVER (PARTITION BY node ORDER BY hop),
         |                            CAST(1 AS BIGINT)), 0) AS gain
         |  FROM est)
         |SELECT node, CAST(sum((gain * 1000000) // hop) AS BIGINT) AS h_micros
         |FROM g GROUP BY node
         |ORDER BY h_micros DESC, node LIMIT 20""".stripMargin
    },


    "q203_clustering_coeff" ->
      """WITH raw AS (
        |  SELECT CAST(user_id % 60 AS BIGINT) AS x,
        |    CAST((user_id % 60 + 1 + event_id % 5) % 60 AS BIGINT) AS y
        |  FROM events),
        |e AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
        |      FROM raw WHERE x <> y),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1
        |  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        |tn AS (SELECT node, count(*) AS n_tri
        |       FROM (SELECT unnest([x, y, z]) AS node FROM tri) GROUP BY 1),
        |deg AS (SELECT node, count(*) AS deg FROM (
        |  SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1)
        |SELECT deg.node, CAST(deg AS BIGINT) AS deg,
        |  CAST(coalesce(n_tri, 0) AS BIGINT) AS n_tri,
        |  CAST(CASE WHEN deg >= 2
        |       THEN (2 * coalesce(n_tri, 0) * 10000) // (deg * (deg - 1))
        |       ELSE 0 END AS BIGINT) AS coeff_bp
        |FROM deg LEFT JOIN tn ON tn.node = deg.node
        |ORDER BY deg.node""".stripMargin,


    "q222_reciprocity" ->
      """WITH e AS (
        |  SELECT DISTINCT CAST(user_id % 50 AS BIGINT) AS src,
        |    CAST(((user_id % 50) * 7 + event_id % 11) % 50 AS BIGINT) AS dst
        |  FROM events),
        |e2 AS (SELECT src, dst FROM e WHERE src <> dst),
        |r AS (SELECT a.src, a.dst FROM e2 a
        |      JOIN e2 b ON b.src = a.dst AND b.dst = a.src)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM e2) AS n_edges,
        |  (SELECT CAST(count(*) AS BIGINT) FROM r) AS n_reciprocal,
        |  CAST((SELECT count(*) FROM r) * 10000
        |    // (SELECT count(*) FROM e2) AS BIGINT) AS reciprocity_bp""".stripMargin,

  )
}
