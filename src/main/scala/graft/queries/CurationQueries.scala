package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{CoreOps, EntityResolution, Intervals}
import graft.similarity.Similarity
import graft.text.TextOps

/** Wave 8 — corpus-curation operators: prefix-filtering set-similarity
  * join (the frequency-adaptive blocking family), CCNet-style sub-document
  * boilerplate REMOVAL with reconstruction, MAD-based robust outlier
  * sweeps (the heavy-tail-safe twin of q128's 3σ), and DSIR-style
  * importance scoring for target-distribution data selection. Every
  * number is integer-exact so the DuckDB oracle replays it bit-for-bit.
  */
object CurationQueries {

  import CoreOps.cents

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // AllPairs/PPJoin prefix-filtering similarity self-join over 3-shingle
    // sets at Jaccard ≥ 0.7: candidates must share one of each doc's
    // RAREST shingles (global-frequency order), so the candidate join
    // fans out by rare-element df instead of hot-element df — 28
    // candidate pairs at sf0.01 where all-pairs would be 12.5M. Exact
    // verify via integer cross-multiplied Jaccard; per-lang rollup.
    // Shingles travel as the codegen'd 8-byte `shingle_hashes` (q31/q186
    // semantics): the frequency join, prefix explode, and candidate join
    // all exchange longs, never trigram strings — the string form cost
    // 16.8 s at sf0.1 against 6-7 s hashed, in BOTH engines.
    "q187_prefix_simjoin" -> ((s, dir) => {
      org.apache.spark.sql.GraftFunctions.register(s)
      val r = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          call_function("shingle_hashes", col("text"), lit(3)).as("ts"))
        .filter(size(col("ts")) >= 1)
      EntityResolution.prefixFilterPairs(r, "doc_id", col("ts"), 7, 10,
          carryCols = Seq("lang"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("inter")).as("sum_inter"),
          sum(col("sz_a") + col("sz_b") - col("inter")).as("sum_union"))
        .orderBy(col("lang"))
    }),

    // CCNet-style boilerplate chunk removal: 10-token chunks appearing in
    // ≥ 3 distinct docs (by portable fingerprint) are dropped and each doc is
    // REBUILT from its surviving chunks in order — the rewrite q186 only
    // measures. The per-source rollup gates the reconstruction itself via
    // the summed fingerprint of the rebuilt texts.
    "q188_chunk_dedup" -> ((s, dir) => {
      TextOps.removeBoilerplateChunks(Tables.load(s, dir, "documents"),
          "doc_id", "text", w = 10, minDocs = 3L, carryCols = Seq("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chunks")).as("n_chunks"),
          sum(col("n_dropped")).as("n_dropped"),
          sum(when(col("new_text") === "", 1L).otherwise(0L)).as("n_emptied"),
          sum(TextOps.fingerprint(col("new_text"))).as("sum_fp"))
        .orderBy(col("source"))
    }),

    // MAD-based robust outliers per event_type — the heavy-tail-safe twin
    // of q128's 3σ sweep (one gross outlier corrupts mean AND stddev; the
    // median/MAD pair has a 50% breakdown point). Exact order statistics
    // from CoreOps.rangeRank twice (values, then absolute deviations), in
    // doubled/quadrupled integer cents so even-n midpoints stay integers:
    // med2 = 2·median, mad2 = 4·MAD, and the consistent-3σ rule
    // |x−med| > 3·1.4826·MAD becomes dv·20000 > 44478·mad2 with
    // dv = 2|x−med| — no floats anywhere.
    "q189_mad_outliers" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_type"), col("event_id"), cents(col("value")).as("v_c"))
      val n = e.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .withColumn("k_lo", expr("(n + 1) div 2"))
        .withColumn("k_hi", expr("(n + 2) div 2"))
      val med = CoreOps.rangeRank(e, Seq("event_type"),
          Seq(col("v_c"), col("event_id")))
        .join(broadcast(n), "event_type")
        .filter(col("rank") === col("k_lo") || col("rank") === col("k_hi"))
        .groupBy(col("event_type")).agg(
          (min(when(col("rank") === col("k_lo"), col("v_c"))) +
            min(when(col("rank") === col("k_hi"), col("v_c")))).as("med2"))
      val d = e.join(broadcast(med), "event_type")
        .withColumn("dv", abs(col("v_c") * 2 - col("med2")))
      val mad = CoreOps.rangeRank(
          d.select(col("event_type"), col("event_id"), col("dv")),
          Seq("event_type"), Seq(col("dv"), col("event_id")))
        .join(broadcast(n), "event_type")
        .filter(col("rank") === col("k_lo") || col("rank") === col("k_hi"))
        .groupBy(col("event_type")).agg(
          (min(when(col("rank") === col("k_lo"), col("dv"))) +
            min(when(col("rank") === col("k_hi"), col("dv")))).as("mad2"))
      d.join(broadcast(mad), "event_type").join(broadcast(n), "event_type")
        .groupBy(col("event_type"))
        .agg(min(col("n")).as("n"), min(col("med2")).as("med2"),
          min(col("mad2")).as("mad2"),
          sum(when(col("dv") * 20000 > col("mad2") * 44478, 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy(col("event_type"))
    }),

    // DSIR-style data selection: score every doc by mean token-level
    // target/raw frequency ratio (target = the curated src1/src2 slice),
    // integer-floor-divided at 1e6 scale; the 25 most target-like docs.
    "q190_importance_select" -> ((s, dir) => {
      TextOps.importanceScores(Tables.load(s, dir, "documents"),
          "doc_id", "text", col("source").isin("src1", "src2"),
          carryCols = Seq("source"))
        .select(col("doc_id"), col("source"), col("n_tok"), col("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(25)
    }),

    // MMR diversified re-ranking (λ = 0.7): 5 picks from the 20 most
    // query-similar vectors, each step trading relevance against max
    // similarity to what's already chosen. Relevance is one distributed
    // kernel pass + TakeOrdered; only the 20 candidates reach the driver.
    "q191_mmr_rerank" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      Similarity.mmrRerank(e.filter(col("vec_id") =!= 0), qv,
          "vec_id", "embedding", topN = 20, k = 5, relW = 7L, divW = 3L)
        .select(col("step"), col("id").as("vec_id"), col("rel"))
        .orderBy(col("step"))
    }),

    // Time-grid gap-fill + forward-fill: daily per-user value snapshots
    // over the events span — slots with no event carry the user's last
    // observed value (the point-in-time reporting primitive). Grid bounds
    // are one 1-row aggregate; the fill is a single keyed window.
    "q192_gap_fill" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("slot"),
          unix_micros(col("ts")).as("tsm"), col("event_id"),
          cents(col("value")).as("v_c"))
      val d = e.groupBy(col("user_id"), col("slot"))
        .agg(max(struct(col("tsm").as("t"), col("event_id").as("e"),
          col("v_c").as("v"))).getField("v").as("observed"))
      val b = e.agg(min(col("slot")), max(col("slot"))).head()
      Intervals.gapFill(d, "user_id", "slot", "observed",
          b.getLong(0), b.getLong(1))
        .groupBy(col("slot"))
        .agg(count(col("observed")).as("n_active"),
          sum(when(col("observed").isNull && col("filled").isNotNull, 1L)
            .otherwise(0L)).as("n_carried"),
          sum(col("filled")).as("sum_filled"))
        .orderBy(col("slot"))
    }),

    // Distribution drift between the first and second half of the event
    // timeline: 10 equi-width integer bins per event_type over the global
    // [min, max] cents range, per-bin proportions in basis points, and
    // the summed/max absolute deviation — the integer-exact total-
    // variation surrogate of the PSI monitoring metric (PSI's ln term
    // needs floats; TV distance gates bit-for-bit and bounds it).
    "q193_tv_drift" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_type"), cents(col("value")).as("v_c"),
          (expr("unix_micros(ts) div 86400000000") <
            expr("unix_micros(timestamp'2024-01-16 00:00:00') div 86400000000"))
            .as("first_half"))
      val mm = e.groupBy(col("event_type"))
        .agg(min(col("v_c")).as("lo"), max(col("v_c")).as("hi"))
      val b = e.join(broadcast(mm), "event_type")
        .withColumn("bin",
          least(lit(9L), expr("((v_c - lo) * 10) div (hi - lo + 1)")))
      val n = b.groupBy(col("event_type")).agg(
        sum(when(col("first_half"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("first_half"), 1L).otherwise(0L)).as("nb"))
      val c = b.groupBy(col("event_type"), col("bin")).agg(
        sum(when(col("first_half"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("first_half"), 1L).otherwise(0L)).as("cb"))
      c.join(broadcast(n), "event_type")
        .withColumn("dev", abs(expr("ca * 10000 div na - cb * 10000 div nb")))
        .groupBy(col("event_type"))
        .agg(min(col("na")).as("n_first"), min(col("nb")).as("n_second"),
          sum(col("dev")).as("sum_abs_bp"), max(col("dev")).as("max_abs_bp"))
        .orderBy(col("event_type"))
    }),

    // Last-touch attribution: each purchase credited to the user's latest
    // click/view within 7 days — the backward as-of join (one keyed
    // shuffle, linear per key) instead of the quadratic-per-hot-user
    // window join; same-timestamp touches pre-collapsed by max event_id
    // so the match is total-order deterministic.
    "q194_attribution" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), cents(col("value")).as("v_c"))
      val t = ev.filter(col("event_type").isin("click", "view"))
        .groupBy(col("user_id"), unix_micros(col("ts")).as("ts_us"))
        .agg(max(struct(col("event_id").as("i"), col("event_type").as("t")))
          .getField("t").as("touch"))
      graft.ops.AsofJoin.asofJoin(p, t, Seq("user_id"), "ts_us", "ts_us",
          toleranceMicros = Some(604800000000L))
        .groupBy(coalesce(col("touch"), lit("none")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"), sum(col("v_c")).as("sum_cents"))
        .orderBy(col("channel"))
    }),

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

    // Johnson–Lindenstrauss 64→16 reduction feeding ANN: top-10 by
    // integer L2 in the reduced space vs exact full-space cosine top-10,
    // recall per query — the q124 recall-gate pattern for the
    // dimensionality-reduction front-end (4× less data on the wire).
    "q197_jl_recall" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val red = Similarity.jlProject(e, "vec_id", "embedding", outDims = 16)
      val qr = red.filter(col("id") < 5)
        .select(col("id").as("query_id"), col("rv").as("qrv"))
      val dist = expr("aggregate(zip_with(rv, qrv, (x, y) -> (x - y) * (x - y)), 0L, (acc, d) -> acc + d)")
      val approx = red.join(broadcast(qr), col("id") =!= col("query_id"))
        .withColumn("d", dist)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
            .orderBy(col("d"), col("id"))))
        .filter(col("rn") <= 10)
        .select(col("query_id"), col("id").as("corpus_id"))
      val exact = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .select(col("query_id"), col("corpus_id"))
      qr.select(col("query_id"))
        .join(exact.join(approx, Seq("query_id", "corpus_id"), "left_semi")
          .groupBy(col("query_id")).agg(count(lit(1)).as("hits")),
          Seq("query_id"), "left")
        .select(col("query_id"), coalesce(col("hits"), lit(0L)).as("n_hits"))
        .orderBy(col("query_id"))
    }),

    // k-anonymity audit (Sweeney 2002): customers grouped by the
    // quasi-identifier (segment, nation, balance decile); groups with
    // < 5 members are re-identification risks and would be suppressed.
    // Decile bounds are one broadcast row; everything else is two
    // partial-aggregable counts.
    "q198_k_anonymity" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_nationkey"),
          cents(col("c_acctbal")).as("bal"))
      val mm = c.agg(min(col("bal")).as("lo"), max(col("bal")).as("hi"))
      val g = c.join(broadcast(mm))
        .withColumn("decile",
          least(lit(9L), expr("((bal - lo) * 10) div (hi - lo + 1)")))
        .groupBy(col("c_mktsegment"), col("c_nationkey"), col("decile"))
        .agg(count(lit(1)).as("n"))
      g.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("n") < 5, 1L).otherwise(0L)).as("n_risky_groups"),
          sum(col("n")).as("n_rows"),
          sum(when(col("n") < 5, col("n")).otherwise(0L)).as("n_suppressed"))
        .orderBy(col("c_mktsegment"))
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

    // Heaps-law vocabulary growth at TRIGRAM grain: new distinct
    // 3-shingles contributed by each decile of the corpus (by doc_id
    // order) and the cumulative vocabulary — the "does more data buy
    // more diversity" scaling diagnostic (unigram vocab saturates in the
    // first decile on any real corpus; higher-order n-grams are where
    // the curve lives). First occurrence = one min agg per shingle hash;
    // the decile histogram + running sum are driver-sized (10 rows).
    "q200_heaps_law" -> ((s, dir) => {
      org.apache.spark.sql.GraftFunctions.register(s)
      val docs = Tables.load(s, dir, "documents")
      val n = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
      val first = docs
        .select(col("doc_id"),
          explode(call_function("shingle_hashes", col("text"), lit(3))).as("t"))
        .groupBy(col("t")).agg(min(col("doc_id")).as("first_doc"))
      val dec = first
        .withColumn("decile", least(lit(9L), expr(s"(first_doc * 10) div ${n}L")))
        .groupBy(col("decile")).agg(count(lit(1)).as("n_new_shingles"))
      dec.withColumn("cum_vocab",
          sum(col("n_new_shingles")).over(org.apache.spark.sql.expressions.Window
            .orderBy(col("decile"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .orderBy(col("decile"))
    }),

    // Retrieval-eval MRR: for each of 20 label-carrying queries, the
    // reciprocal rank (micros) of the first SAME-LABEL vector in the
    // brute-force cosine top-10 — the eval loop every embedding pipeline
    // runs. Ranks come from the shared bruteForceTopK; the label joins
    // in by corpus id (hash join, no second kernel pass).
    "q201_retrieval_mrr" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val labels = e.select(col("vec_id"), col("label"))
      val top = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 20),
          "vec_id", "embedding", 10)
        .join(labels.select(col("vec_id").as("corpus_id"),
          col("label").as("c_label")), "corpus_id")
        .join(broadcast(labels.select(col("vec_id").as("query_id"),
          col("label").as("q_label"))), "query_id")
      val rr = top.filter(col("c_label") === col("q_label"))
        .groupBy(col("query_id"))
        .agg(min(col("rank")).as("first_hit"))
        .withColumn("rr_micros", expr("1000000 div first_hit"))
      top.select(col("query_id")).distinct()
        .join(rr, Seq("query_id"), "left")
        .agg(count(lit(1)).as("n_queries"),
          sum(when(col("rr_micros").isNotNull, 1L).otherwise(0L)).as("n_hit"),
          expr("coalesce(sum(rr_micros), 0L) div count(1)").as("mean_rr_micros"))
    }),

    // Market-basket association rules (A-priori shape): baskets = each
    // user's distinct item set (props.k), pairs generated per user AFTER
    // the frequent-item prune (left_semi against the broadcast frequent
    // list — the A-priori monotonicity cut that keeps per-user fan-out
    // bounded by the FREQUENT basket size), top-20 pairs by support with
    // both direction confidences in basis points.
    "q202_assoc_rules" -> ((s, dir) => {
      val baskets = Tables.load(s, dir, "events")
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .filter(col("item").isNotNull).distinct()
      val itemSup = baskets.groupBy(col("item")).agg(count(lit(1)).as("sup"))
      val frequent = itemSup.filter(col("sup") >= 10)
      val fb = baskets.join(broadcast(frequent.select(col("item"))), Seq("item"), "left_semi")
      val pairs = fb.select(col("user_id"), col("item").as("i"))
        .join(fb.select(col("user_id"), col("item").as("j")), "user_id")
        .filter(col("i") < col("j"))
        .groupBy(col("i"), col("j")).agg(count(lit(1)).as("support"))
      pairs
        .join(broadcast(frequent.select(col("item").as("i"), col("sup").as("sup_i"))), "i")
        .join(broadcast(frequent.select(col("item").as("j"), col("sup").as("sup_j"))), "j")
        .select(col("i"), col("j"), col("support"),
          expr("support * 10000 div sup_i").as("conf_ij_bp"),
          expr("support * 10000 div sup_j").as("conf_ji_bp"))
        .orderBy(col("support").desc, col("i"), col("j"))
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

    // Join-cardinality estimation from CMS sketches (the AGMS/CMS inner
    // product, Alon et al. / Cormode & Muthukrishnan): |A ⋈ B| on a key
    // = Σ_v f_A(v)·f_B(v), estimated as the min over sketch rows of the
    // row inner product — the optimizer-statistics primitive that sizes
    // a join from two O(depth·width) summaries without touching either
    // table again. The inner product only ever OVERestimates (hash
    // collisions add non-negative mass), so ge_ok is deterministic; the
    // slack bound is the standard N_A·N_B/width with 3× margin.
    "q204_join_card_est" -> ((s, dir) => {
      import graft.functions.CountMin
      val (depth, width) = (4, 1024)
      val ev = Tables.load(s, dir, "events")
      def side(t: String, sk: String, n: String) =
        ev.filter(col("event_type") === t)
          .agg(CountMin.sketch(depth, width)(col("user_id")).as(sk),
            count(lit(1)).as(n))
      val joined = side("click", "ska", "n_a").crossJoin(side("purchase", "skb", "n_b"))
      val prods = (0 until depth).map { d =>
        expr(s"aggregate(zip_with(slice(ska, ${d * width + 1}, $width), " +
          s"slice(skb, ${d * width + 1}, $width), (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
      }
      val est = least(prods: _*)
      val exact = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(count(lit(1)).as("ca"))
        .join(ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(count(lit(1)).as("cb")), "user_id")
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("exact_size"))
      joined.crossJoin(exact)
        .select(col("exact_size"), col("n_a"), col("n_b"),
          (est >= col("exact_size")).as("ge_ok"),
          ((est - col("exact_size")) * width <= col("n_a") * col("n_b") * 3)
            .as("slack_ok"))
    }),

    // Equi-depth histogram per event_type (ANALYZE-style optimizer
    // stats, the equi-DEPTH twin of q193's equi-width bins): 8 buckets
    // whose boundaries are the exact ceil(i·n/8) order statistics from
    // rangeRank; per-bucket row counts follow from rank arithmetic
    // alone — no second data pass.
    "q205_equidepth_hist" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_type"), col("event_id"), cents(col("value")).as("v_c"))
      val n = e.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val ranked = CoreOps.rangeRank(e, Seq("event_type"),
        Seq(col("v_c"), col("event_id")))
      val bounds = ranked.join(broadcast(n), "event_type")
        .withColumn("bucket", expr("(rank * 8 + n - 1) div n")) // ceil(rank·8/n)
        .groupBy(col("event_type"), col("bucket"))
        .agg(max(col("v_c")).as("hi"), count(lit(1)).as("n_rows"))
      bounds
        .withColumn("lo", lag(col("hi"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type")).orderBy(col("bucket"))))
        .select(col("event_type"), col("bucket"), col("lo"), col("hi"), col("n_rows"))
        .orderBy(col("event_type"), col("bucket"))
    }),

    // Frame-level audio energy over the REAL WAV codec (the q142
    // payloads): 8-sample frames, exact integer energy Σ s², silence =
    // mean-square below 90000 — the VAD/silence-removal front-end. One
    // decode+frame kernel pass; per-lang rollup.
    "q206_audio_energy" -> ((s, dir) => {
      def le(e: String, bytes: Int): String = (0 until bytes)
        .map(k => s"lpad(hex((($e) div ${1L << (8 * k)}) % 256), 2, '0')")
        .mkString("concat(", ", ", ")")
      val media = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"))
        .withColumn("n", (col("doc_id") % 10 + 20).cast("int"))
        .withColumn("payload", expr(
          s"""unhex(concat(
             |  '52494646', ${le("36 + 2 * n + CASE WHEN doc_id % 3 = 0 THEN 12 ELSE 0 END", 4)},
             |  '57415645',
             |  '666D7420', '10000000', '0100', '0100',
             |  '401F0000', '803E0000', '0200', '1000',
             |  CASE WHEN doc_id % 3 = 0
             |    THEN concat('6A756E6B', '04000000', '00000000') ELSE '' END,
             |  '64617461', ${le("2 * n", 4)},
             |  array_join(transform(sequence(0, n - 1), j ->
             |    ${le("((doc_id * 13 + 7 * j) % 2048 + 64512) % 65536", 2)}), '')
             |))""".stripMargin))
        .drop("n")
      graft.multimodal.Multimodal.wavFrameEnergy(media, "payload", frame = 8)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_frames"),
          sum(col("energy")).as("sum_energy"),
          sum(when(col("energy") < col("n_samples") * 90000L, 1L).otherwise(0L))
            .as("n_silent"))
        .orderBy(col("lang"))
    }),

    // Leave-one-out target encoding (the leakage-safe categorical
    // feature): nation → LOO mean balance, each row excluded from its
    // own encoding ((Σ − own) div (n−1), null for singletons) — the
    // standard remedy for target leakage in mean encoding. One group
    // agg + one keyed join back; per-nation rollup gates every LOO value
    // through the summed encodings.
    "q207_target_encoding" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select(col("c_nationkey"), cents(col("c_acctbal")).as("bal"))
      val g = c.groupBy(col("c_nationkey"))
        .agg(sum(col("bal")).as("tot"), count(lit(1)).as("n"))
      c.join(broadcast(g), "c_nationkey")
        .withColumn("enc", when(col("n") > 1,
          expr("(tot - bal) div (n - 1)")))
        .groupBy(col("c_nationkey"))
        .agg(min(col("n")).as("n"),
          sum(when(col("enc").isNull, 1L).otherwise(0L)).as("n_null_enc"),
          coalesce(sum(col("enc")), lit(0L)).as("sum_enc"))
        .orderBy(col("c_nationkey"))
    }),

    // Purged temporal cross-validation folds (de Prado's embargo): three
    // 10-day test windows over the event timeline; train rows must sit
    // OUTSIDE test ± 1-day embargo so boundary leakage (labels computed
    // from windows that straddle the split) can't contaminate training.
    // One pass: fold ids explode per row, membership is pure arithmetic.
    "q208_purged_folds" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(expr("unix_micros(ts) div 86400000000").as("day"))
      val d0 = e.agg(min(col("day"))).head().getLong(0)
      e.select((col("day") - d0).as("rel"))
        .select(col("rel"), explode(expr("sequence(0, 2)")).as("fold"))
        .withColumn("cls",
          when(col("rel").between(col("fold") * 10, col("fold") * 10 + 9), "test")
            .when(col("rel").between(col("fold") * 10 - 1, col("fold") * 10 + 10),
              "embargo")
            .otherwise("train"))
        .groupBy(col("fold"))
        .agg(sum(when(col("cls") === "test", 1L).otherwise(0L)).as("n_test"),
          sum(when(col("cls") === "embargo", 1L).otherwise(0L)).as("n_embargo"),
          sum(when(col("cls") === "train", 1L).otherwise(0L)).as("n_train"))
        .orderBy(col("fold"))
    }),

    // k-Center greedy coreset (farthest-first, Sener & Savarese 2018):
    // 5 picks covering the embedding space — each step one distributed
    // corpus scan against the broadcast chosen set + TakeOrdered(1);
    // integer-micro L2 so the oracle replays every pick.
    "q209_kcenter_coreset" -> ((s, dir) => {
      Similarity.kCenterGreedy(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", k = 5)
        .select(col("step"), col("id").as("vec_id"), col("dmin"))
        .orderBy(col("step"))
    }),

    // Asymmetric containment dedup at 80%: docs whose 3-shingle set is
    // mostly inside another doc's (the quote/copy relation symmetric
    // Jaccard can't see). A-prefix × B-full-postings candidate join,
    // verify |A∩B| ≥ 0.8·|A| scan-local; per-lang rollup of contained
    // docs and their containment mass.
    "q210_containment_dedup" -> ((s, dir) => {
      org.apache.spark.sql.GraftFunctions.register(s)
      val r = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          call_function("shingle_hashes", col("text"), lit(3)).as("ts"))
        .filter(size(col("ts")) >= 1)
      EntityResolution.containmentPairs(r, "doc_id", col("ts"), 8, 10,
          carryCols = Seq("lang"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("id_a")).as("n_contained_docs"),
          sum(col("inter")).as("sum_inter"),
          sum(col("sz_a")).as("sum_sz_a"))
        .orderBy(col("lang"))
    }),

    // Daily leaderboard churn: top-10 items per day (by event count,
    // ties to the smaller item), overlap between consecutive days — the
    // rank-stability diagnostic behind trending/alerting dashboards.
    // Daily tops are windowed per day (items bounded by the vocabulary);
    // churn is one self-join keyed on item.
    "q211_topk_churn" -> ((s, dir) => {
      val daily = Tables.load(s, dir, "events")
        .select(expr("unix_micros(ts) div 86400000000").as("day"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .filter(col("item").isNotNull)
        .groupBy(col("day"), col("item")).agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("day"))
            .orderBy(col("n").desc, col("item"))))
        .filter(col("rn") <= 10)
        .select(col("day"), col("item"))
      daily.select((col("day") - 1).as("day"), col("item"))
        .join(daily, Seq("day", "item"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_common"))
        .select((col("day") + 1).as("day"), col("n_common"))
        .orderBy(col("day"))
    }),

    // l-diversity audit (Machanavajjhala et al. 2007, the k-anonymity
    // complement): within each (segment, nation) quasi-identifier group,
    // how many DISTINCT sensitive values (balance deciles) appear — a
    // group of 50 people all in decile 9 is k-anonymous yet leaks the
    // sensitive attribute outright. Groups under l = 3 are flagged.
    "q212_l_diversity" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_nationkey"),
          cents(col("c_acctbal")).as("bal"))
      val mm = c.agg(min(col("bal")).as("lo"), max(col("bal")).as("hi"))
      val g = c.join(broadcast(mm))
        .withColumn("decile",
          least(lit(9L), expr("((bal - lo) * 10) div (hi - lo + 1)")))
        .groupBy(col("c_mktsegment"), col("c_nationkey"))
        .agg(countDistinct(col("decile")).as("l"), count(lit(1)).as("n"))
      g.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_groups"),
          min(col("l")).as("min_l"),
          sum(when(col("l") < 3, 1L).otherwise(0L)).as("n_low_diversity"),
          sum(when(col("l") < 3, col("n")).otherwise(0L)).as("n_exposed_rows"))
        .orderBy(col("c_mktsegment"))
    }),

    // Seasonal-naive forecast baseline + backtest MAE: predict each
    // day's total as the value 7 days earlier and score the last two
    // weeks — the sanity baseline every forecasting pipeline must beat,
    // and the shape (self-join on day−7, integer absolute errors) any
    // real backtest shares. One daily rollup + one keyed self-join.
    "q213_seasonal_naive" -> ((s, dir) => {
      val daily = Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(sum(cents(col("value"))).as("v"))
      val d0 = daily.agg(min(col("day"))).head().getLong(0)
      daily.select(col("event_type"), col("day"), col("v"))
        .join(daily.select(col("event_type"), (col("day") + 7).as("day"),
          col("v").as("pred")), Seq("event_type", "day"))
        .filter(col("day") >= d0 + 16)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("v") - col("pred"))).as("sum_abs_err"),
          expr("sum(abs(v - pred)) div count(1)").as("mae_cents"))
        .orderBy(col("event_type"))
    }),

    // CUSUM changepoint scan: cumulative deviation of daily totals from
    // the FIRST-HALF mean (the in-control baseline), flagging where
    // |cusum| peaks — the classic drift-onset locator. Baseline is one
    // broadcast row; the cusum is a single per-type running window over
    // ~30 day rows.
    "q214_cusum" -> ((s, dir) => {
      val daily = Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(sum(cents(col("value"))).as("v"))
      val d0 = daily.agg(min(col("day"))).head().getLong(0)
      val base = daily.filter(col("day") < d0 + 15)
        .groupBy(col("event_type"))
        .agg(expr("sum(v) div count(1)").as("mu"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      daily.join(broadcast(base), "event_type")
        .withColumn("cusum", sum(col("v") - col("mu")).over(w))
        .groupBy(col("event_type"))
        .agg(max(abs(col("cusum"))).as("max_abs_cusum"),
          // scalar argmax key (|cusum|, earlier-day tiebreak): day span
          // ≤ 1e5 so the composite never collides; struct keys are out —
          // DuckDB's arg_max has no struct overload.
          max_by(col("day"),
            abs(col("cusum")) * 100000L - (col("day") - lit(d0))).as("peak_day"))
        .orderBy(col("event_type"))
    }),

    // Session path mining at trigram grain: the top-10 3-step event-type
    // paths users actually walk (per-user time order, two lag windows) —
    // q171's transition matrix extended to path shape. Per-user windows
    // are bounded sorts, parallel across users.
    "q215_path_trigrams" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("t2", lead(col("event_type"), 1).over(w))
        .withColumn("t3", lead(col("event_type"), 2).over(w))
        .filter(col("t3").isNotNull)
        .groupBy(col("event_type").as("s1"), col("t2").as("s2"), col("t3").as("s3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
        .limit(10)
    }),

    // FIFO rank matching: each user's k-th purchase settles against the
    // k-th click (the inventory/cost-basis allocation shape) — two
    // per-user rank windows + one (user, rank) equi-join, never a
    // quadratic interval pairing; unmatched tails counted per side.
    "q216_fifo_match" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      def ranked(t: String, tsName: String) = ev
        .filter(col("event_type") === t)
        .select(col("user_id"), unix_micros(col("ts")).as(tsName), col("event_id"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
            .orderBy(col(tsName), col("event_id"))))
        .drop("event_id")
      val c = ranked("click", "c_ts")
      val p = ranked("purchase", "p_ts")
      val m = p.join(c, Seq("user_id", "rk"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_matched"),
          sum(abs(col("p_ts") - col("c_ts"))).as("sum_abs_lag_us"))
      val nP = p.groupBy(col("user_id")).agg(count(lit(1)).as("n_p"))
      val nC = c.groupBy(col("user_id")).agg(count(lit(1)).as("n_c"))
      // Full-outer across the per-side counts: users with only clicks or
      // only purchases still contribute their whole side as unmatched.
      nP.join(nC, Seq("user_id"), "full_outer")
        .join(m, Seq("user_id"), "left")
        .agg(count(lit(1)).as("n_users"),
          sum(coalesce(col("n_matched"), lit(0L))).as("n_matched"),
          sum(coalesce(col("n_p"), lit(0L)) -
            coalesce(col("n_matched"), lit(0L))).as("n_unmatched_purchases"),
          sum(coalesce(col("n_c"), lit(0L)) -
            coalesce(col("n_matched"), lit(0L))).as("n_unmatched_clicks"),
          expr("sum(sum_abs_lag_us) div sum(n_matched)").as("mean_abs_lag_us"))
    }),

    // Gini coefficient of per-user value concentration, exact in basis
    // points from the rank identity G = (2·Σ rank·x − (n+1)·Σx) /
    // (n·Σx): ranks are rangeRank order statistics, both Σ terms
    // partial-aggregable — the inequality metric behind "is our corpus /
    // revenue dominated by a few contributors" governance checks.
    "q217_value_gini" -> ((s, dir) => {
      val u = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(cents(col("value"))).as("x"))
      val ranked = CoreOps.rangeRank(u, Seq("event_type"),
        Seq(col("x"), col("user_id")))
      ranked.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("x")).as("sum_x"),
          sum(col("rank") * col("x")).as("sum_rx"))
        .select(col("event_type"), col("n_users"),
          expr("((2 * sum_rx - (n_users + 1) * sum_x) * 10000)" +
            " div (n_users * sum_x)").as("gini_bp"))
        .orderBy(col("event_type"))
    }),

    // Winner-take-all share: the top-1%-of-users' fraction of total value
    // in basis points (ceil(n/100) heaviest users by rangeRank order
    // statistics) — the concentration complement of q217's Gini.
    "q218_top_share" -> ((s, dir) => {
      val u = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(cents(col("value"))).as("x"))
      val n = u.groupBy(col("event_type")).agg(count(lit(1)).as("n"),
        sum(col("x")).as("tot"))
      CoreOps.rangeRank(u, Seq("event_type"), Seq(col("x"), col("user_id")))
        .join(broadcast(n), "event_type")
        .filter(col("rank") > col("n") - expr("(n + 99) div 100"))
        .groupBy(col("event_type"))
        .agg(min(col("n")).as("n_users"),
          count(lit(1)).as("n_top"),
          expr("(sum(x) * 10000) div min(tot)").as("top_share_bp"))
        .orderBy(col("event_type"))
    }),

    // Deterministic negative sampling for recommender training: per user,
    // the 5 non-interacted items ranked by the portable (user, item)
    // hash — content-addressed (re-runs and engines agree), uniform over
    // the complement. Candidates = users × item vocabulary (bounded by
    // the CATALOG, not events) anti-joined against interactions; at
    // billion-user scale the same shape runs per hash-bucket block.
    // Output gates the full sampled set via per-user hash sums.
    "q219_negative_sampling" -> ((s, dir) => {
      val b = Tables.load(s, dir, "events")
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .filter(col("item").isNotNull).distinct()
      val items = b.select(col("item")).distinct()
      val users = b.select(col("user_id")).distinct()
      val h = expr(s"(2654435761 * (user_id * 101 + item) + 1013904223) % 1000000007")
      users.join(items)
        .join(b, Seq("user_id", "item"), "left_anti")
        .withColumn("h", h)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
            .orderBy(col("h"), col("item"))))
        .filter(col("rn") <= 5)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_neg"), sum(col("item")).as("sum_items"),
          sum(col("h")).as("sum_h"))
        .orderBy(col("user_id"))
    }),

    // Cohort LTV curve: cumulative value per signup cohort across day
    // offsets — q168's retention matrix extended to value (the curve
    // growth teams actually plot). Two partial-aggregable aggs + one
    // user-keyed join + a per-cohort running window over ≤30 offsets.
    "q220_cohort_ltv" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          cents(col("value")).as("v"))
      val first = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val cell = e.join(first, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("off"))
        .agg(sum(col("v")).as("v"))
      cell.withColumn("cum_value_cents",
          sum(col("v")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("cohort_day")).orderBy(col("off"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .select(col("cohort_day"), col("off"), col("v").as("value_cents"),
          col("cum_value_cents"))
        .orderBy(col("cohort_day"), col("off"))
    }),

    // Longest consecutive-day activity streak per user, rolled up as a
    // streak-length histogram — gaps-and-islands on the INTEGER day
    // axis via the day − row_number constancy trick (consecutive days
    // share the diff), one distinct + one per-user window; the
    // engagement metric behind every "7-day streak" product feature.
    "q221_activity_streaks" -> ((s, dir) => {
      val days = Tables.load(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day"))
      val streaks = days
        .withColumn("isl", col("day") - row_number().over(w))
        .groupBy(col("user_id"), col("isl"))
        .agg(count(lit(1)).as("len"))
      val best = streaks.groupBy(col("user_id")).agg(max(col("len")).as("best"))
      best.groupBy(col("best").as("streak_len"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("streak_len"))
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

    // Span-corruption masking prep (T5-style denoising objectives):
    // deterministically mask every 3-token span starting at positions
    // ≡ 0 (mod 10) — ~30% corruption — emitting the corrupted text with
    // one sentinel token per span. Pure array transforms (scan-local, no
    // shuffle beyond the rollup); the summed fingerprint gates every
    // reconstructed string including sentinel placement.
    "q223_span_corruption" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("corrupted", expr(
          """concat_ws(' ', filter(transform(toks, (t, i) ->
            |  CASE WHEN i % 10 = 0 THEN '<X>'
            |       WHEN i % 10 < 3 THEN CAST(NULL AS STRING)
            |       ELSE t END), x -> x IS NOT NULL))""".stripMargin))
        .withColumn("n_masked", expr(
          "size(filter(sequence(0, size(toks) - 1), i -> i % 10 < 3))"))
        .withColumn("n_spans", expr(
          "size(filter(sequence(0, size(toks) - 1), i -> i % 10 = 0))"))
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("size(toks)")).as("n_tokens"),
          sum(col("n_masked")).as("n_masked"),
          sum(col("n_spans")).as("n_spans"),
          sum(TextOps.fingerprint(col("corrupted"))).as("sum_fp"))
        .orderBy(col("source"))
    }),

    // Length-distribution matching: per-(source, length-quartile) keep
    // rates (bp) that reshape every source's length mix to the GLOBAL
    // mix — rate = min(1, global_share/source_share), the quota-sampling
    // step that stops one source's short-doc glut from skewing training.
    // Quartile bounds are global order statistics (rangeRank), shares
    // two partial aggs, rates a driver-sized frame.
    "q224_length_matching" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val n = d.count()
      val ranked = CoreOps.rangeRank(d, Nil, Seq(col("n_chars"), col("doc_id")))
        .withColumn("quartile", expr(s"((rank - 1) * 4) div ${n}L"))
      val global = ranked.groupBy(col("quartile"))
        .agg(count(lit(1)).as("ng"))
        .withColumn("g_bp", expr(s"(ng * 10000) div ${n}L"))
      val bySrc = ranked.groupBy(col("source"), col("quartile"))
        .agg(count(lit(1)).as("ns"))
      val srcTot = bySrc.groupBy(col("source")).agg(sum(col("ns")).as("nt"))
      bySrc.join(srcTot, "source").join(broadcast(global), "quartile")
        .withColumn("s_bp", expr("(ns * 10000) div nt"))
        // greatest(s_bp, 1): a quartile share below 1/10000 floors to
        // s_bp = 0; the guarded divisor keeps both engines total (DuckDB's
        // // raises on zero) and caps the rate at 10000 anyway.
        .withColumn("keep_bp",
          least(lit(10000L), expr("(g_bp * 10000) div greatest(s_bp, 1)")))
        .select(col("source"), col("quartile"), col("ns"),
          col("s_bp"), col("g_bp"), col("keep_bp"))
        .orderBy(col("source"), col("quartile"))
    }),

    // Data-quality expectation suite (the dbt-test / Great-Expectations
    // report): FK integrity, range, uniqueness, nullness, and a generator
    // invariant (n_chars = length(text)), one (check, checked, failed)
    // row each. Each check is a partial-aggregable scan (the FK check a
    // broadcast anti-join count); the report is a union of 1-row aggs.
    "q195_dq_expectations" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val customer = Tables.load(s, dir, "customer")
      val lineitem = Tables.load(s, dir, "lineitem")
      val documents = Tables.load(s, dir, "documents")
      val events = Tables.load(s, dir, "events")
      def check(name: String, df: org.apache.spark.sql.DataFrame,
                failed: Column): org.apache.spark.sql.DataFrame =
        df.agg(count(lit(1)).as("n_checked"),
            sum(when(failed, 1L).otherwise(0L)).as("n_failed"))
          .select(lit(name).as("check_name"), col("n_checked"), col("n_failed"))
      val fk = orders.join(broadcast(customer.select(col("c_custkey"))),
          col("o_custkey") === col("c_custkey"), "left")
        .agg(count(lit(1)).as("n_checked"),
          sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("n_failed"))
        .select(lit("orders_custkey_fk").as("check_name"),
          col("n_checked"), col("n_failed"))
      val uniq = customer
        .agg(count(lit(1)).as("n_checked"),
          (count(lit(1)) - countDistinct(col("c_custkey"))).as("n_failed"))
        .select(lit("customer_key_unique").as("check_name"),
          col("n_checked"), col("n_failed"))
      fk.unionByName(uniq)
        .unionByName(check("lineitem_qty_range", lineitem,
          col("l_quantity") < 1 || col("l_quantity") > 50))
        .unionByName(check("lineitem_price_positive", lineitem,
          !(col("l_extendedprice") > 0)))
        .unionByName(check("documents_nchars_consistent", documents,
          col("n_chars") =!= length(col("text"))))
        .unionByName(check("events_value_nonnull", events,
          col("value").isNull))
        .orderBy(col("check_name"))
    }))

  /** q27's portable rolling-hash fingerprint as DuckDB SQL. */
  private def fpSql(s: String) =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split($s, ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (acc, c) -> (acc * 31 + c) % 1000000007)""".stripMargin

  val oracles: Map[String, String] = Map(

    // Replays the prefix filter from first principles: shared shingle-hash
    // CTEs (the q31/q186 portable hash chain), global (df, hash) order,
    // integer-ceil prefix length, candidate = shared prefix element,
    // exact Jaccard ≥ 7/10 by cross-multiplication.
    "q187_prefix_simjoin" ->
      s"""WITH ${DedupQueries.shingleCtes(3, extraCols = " lang,")},
         |r2 AS (SELECT doc_id, lang, hs AS ts FROM h WHERE len(hs) >= 1),
         |el AS (SELECT doc_id, unnest(ts) AS t FROM r2),
         |freq AS (SELECT t, count(*) AS df FROM el GROUP BY 1),
         |ord AS (
         |  SELECT el.doc_id, el.t,
         |    row_number() OVER (PARTITION BY el.doc_id ORDER BY df, el.t) AS rn,
         |    count(*) OVER (PARTITION BY el.doc_id) AS s
         |  FROM el JOIN freq USING (t)),
         |pre AS (SELECT doc_id, t FROM ord WHERE rn <= s - (7*s + 9)//10 + 1),
         |cand AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
         |         FROM pre a JOIN pre b ON a.t = b.t AND a.doc_id < b.doc_id),
         |v AS (
         |  SELECT ida, idb, len(list_intersect(ra.ts, rb.ts)) AS i,
         |         len(ra.ts) AS sa, len(rb.ts) AS sb, ra.lang
         |  FROM cand JOIN r2 ra ON ra.doc_id = ida JOIN r2 rb ON rb.doc_id = idb)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(i) AS BIGINT) AS sum_inter,
         |  CAST(sum(sa + sb - i) AS BIGINT) AS sum_union
         |FROM v WHERE i * 10 >= 7 * (sa + sb - i)
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "q188_chunk_dedup" ->
      s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
         |           FROM documents),
         |c AS (SELECT doc_id, source, ci,
         |        array_to_string(toks[(ci*10+1):(ci*10+10)], ' ') AS chunk
         |      FROM t, LATERAL (SELECT unnest(range(0, (len(toks)+9)//10)) AS ci) r),
         |f AS (SELECT doc_id, source, ci, chunk, ${fpSql("chunk")} AS fp FROM c),
         |cnt AS (SELECT fp, count(DISTINCT doc_id) AS nd FROM f GROUP BY 1),
         |k AS (SELECT f.*, nd FROM f JOIN cnt USING (fp)),
         |rec AS (SELECT doc_id, any_value(source) AS source,
         |        CAST(count(*) AS BIGINT) AS n_chunks,
         |        CAST(sum(CASE WHEN nd >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |        coalesce(string_agg(CASE WHEN nd < 3 THEN chunk END, ' '
         |          ORDER BY ci), '') AS new_text
         |        FROM k GROUP BY 1)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
         |  CAST(sum(n_dropped) AS BIGINT) AS n_dropped,
         |  CAST(sum(CASE WHEN new_text = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_emptied,
         |  CAST(sum(${fpSql("new_text")}) AS BIGINT) AS sum_fp
         |FROM rec GROUP BY source ORDER BY source""".stripMargin,

    // row_number replays rangeRank's (v, event_id) total order; both
    // median extractions and the 44478/20000 rule re-derive in integers.
    "q189_mad_outliers" ->
      """WITH e AS (SELECT event_type, event_id,
        |             CAST(round(value * 100) AS BIGINT) AS v_c FROM events),
        |r1 AS (SELECT event_type, v_c,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY v_c, event_id) AS rank FROM e),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
        |med AS (SELECT r1.event_type,
        |         min(CASE WHEN rank = (n+1)//2 THEN v_c END)
        |         + min(CASE WHEN rank = (n+2)//2 THEN v_c END) AS med2
        |        FROM r1 JOIN n USING (event_type) GROUP BY 1),
        |d AS (SELECT e.event_type, event_id, abs(2*v_c - med2) AS dv
        |      FROM e JOIN med USING (event_type)),
        |r2 AS (SELECT event_type, dv,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY dv, event_id) AS rank FROM d),
        |mad AS (SELECT r2.event_type,
        |         min(CASE WHEN rank = (n+1)//2 THEN dv END)
        |         + min(CASE WHEN rank = (n+2)//2 THEN dv END) AS mad2
        |        FROM r2 JOIN n USING (event_type) GROUP BY 1)
        |SELECT d.event_type, n,
        |  (SELECT med2 FROM med WHERE med.event_type = d.event_type) AS med2,
        |  mad2,
        |  CAST(sum(CASE WHEN dv * 20000 > 44478 * mad2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM d JOIN mad USING (event_type) JOIN n USING (event_type)
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,

    // Unrolled 5-step greedy (MATERIALIZED CTEs keep the chain linear;
    // the recursive-CTE form miscomputes correlated aggregates in the
    // recursive term on some engines). Every pick key replays the Spark
    // side's (relW·rel − divW·maxsim)·1e6 − id composite exactly.
    "q191_mmr_rerank" -> {
      val dotS = (a: String, b: String) =>
        s"list_reduce(list_prepend(0.0, list_transform(range(1, 65), " +
          s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"
      val cosS = (a: String, b: String) =>
        s"CASE WHEN sqrt(${dotS(a, a)}) * sqrt(${dotS(b, b)}) = 0.0 THEN 0.0 " +
          s"ELSE (${dotS(a, b)}) / (sqrt(${dotS(a, a)}) * sqrt(${dotS(b, b)})) END"
      val chain = new StringBuilder(
        "p1 AS MATERIALIZED (SELECT vec_id FROM cand ORDER BY rel DESC, vec_id LIMIT 1),\n" +
        "c1 AS MATERIALIZED (SELECT vec_id FROM p1)")
      for (k <- 2 to 5) {
        val prev = s"c${k - 1}"
        chain.append(s""",
          |s$k AS MATERIALIZED (
          |  SELECT c.vec_id,
          |    (7 * c.rel - 3 * (SELECT max(s) FROM sims WHERE ia = c.vec_id
          |        AND ib IN (SELECT vec_id FROM $prev))) * 1000000 - c.vec_id AS key
          |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM $prev)),
          |p$k AS MATERIALIZED (SELECT vec_id FROM s$k ORDER BY key DESC LIMIT 1),
          |c$k AS MATERIALIZED (SELECT vec_id FROM $prev UNION ALL SELECT vec_id FROM p$k)""".stripMargin)
      }
      val union = (1 to 5)
        .map(k => s"SELECT $k AS step, vec_id FROM p$k").mkString(" UNION ALL ")
      s"""WITH q AS MATERIALIZED (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cand AS MATERIALIZED (
         |  SELECT vec_id, embedding,
         |    CAST(floor((${cosS("embedding", "qv")}) * 1000000) AS BIGINT) AS rel
         |  FROM embeddings, q WHERE vec_id <> 0
         |  ORDER BY rel DESC, vec_id LIMIT 20),
         |sims AS MATERIALIZED (
         |  SELECT a.vec_id AS ia, b.vec_id AS ib,
         |    CAST(floor((${cosS("a.embedding", "b.embedding")}) * 1000000) AS BIGINT) AS s
         |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
         |${chain.result()}
         |SELECT u.step, u.vec_id, cand.rel
         |FROM ($union) u JOIN cand USING (vec_id) ORDER BY u.step""".stripMargin
    },

    // Forward fill replayed as an ASOF join against the latest-wins slot
    // values (the fill value at slot t IS the as-of match at t). Two
    // DuckDB performance cliffs found at sf1 and avoided here: struct
    // min/max aggregates (370+ s over 1M rows — row_number latest-wins
    // instead) and last_value(IGNORE NULLS) over a growing frame (O(n²)
    // per partition — the ASOF formulation needs no window at all).
    "q192_gap_fill" ->
      """WITH e AS MATERIALIZED (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS slot,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsm, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS v_c
        |  FROM events),
        |d AS MATERIALIZED (
        |  SELECT user_id, slot, v_c AS observed FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, slot
        |      ORDER BY tsm DESC, event_id DESC) AS rn FROM e)
        |  WHERE rn = 1),
        |bounds AS (SELECT min(slot) AS lo, max(slot) AS hi FROM e),
        |grid AS (SELECT user_id, unnest(range(lo, hi + 1)) AS slot
        |         FROM (SELECT DISTINCT user_id FROM e), bounds),
        |j AS MATERIALIZED (
        |  SELECT g.slot, d.slot AS obs_slot, d.observed
        |  FROM grid g ASOF LEFT JOIN d
        |    ON g.user_id = d.user_id AND g.slot >= d.slot)
        |SELECT slot,
        |  CAST(sum(CASE WHEN obs_slot = slot THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
        |  CAST(sum(CASE WHEN obs_slot < slot THEN 1 ELSE 0 END) AS BIGINT) AS n_carried,
        |  CAST(sum(observed) AS BIGINT) AS sum_filled
        |FROM j GROUP BY slot ORDER BY slot""".stripMargin,

    "q193_tv_drift" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 <
        |     epoch_us(TIMESTAMP '2024-01-16 00:00:00') // 86400000000) AS first_half
        |  FROM events),
        |mm AS (SELECT event_type, min(v_c) AS lo, max(v_c) AS hi FROM e GROUP BY 1),
        |b AS (
        |  SELECT e.event_type, first_half,
        |    least(9, ((v_c - lo) * 10) // (hi - lo + 1)) AS bin
        |  FROM e JOIN mm USING (event_type)),
        |n AS (SELECT event_type,
        |        CAST(sum(CASE WHEN first_half THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |        CAST(sum(CASE WHEN NOT first_half THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |      FROM b GROUP BY 1),
        |c AS (SELECT event_type, bin,
        |        CAST(sum(CASE WHEN first_half THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |        CAST(sum(CASE WHEN NOT first_half THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |      FROM b GROUP BY 1, 2)
        |SELECT c.event_type, min(na) AS n_first, min(nb) AS n_second,
        |  CAST(sum(abs(ca * 10000 // na - cb * 10000 // nb)) AS BIGINT) AS sum_abs_bp,
        |  CAST(max(abs(ca * 10000 // na - cb * 10000 // nb)) AS BIGINT) AS max_abs_bp
        |FROM c JOIN n USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q194_attribution" ->
      """WITH p AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    CAST(round(value * 100) AS BIGINT) AS v_c
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    arg_max(event_type, event_id) AS touch
        |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2),
        |m AS (
        |  SELECT p.user_id, p.event_id, p.v_c,
        |    CASE WHEN p.ts_us - t.ts_us <= 604800000000 THEN t.touch END AS channel
        |  FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND p.ts_us >= t.ts_us)
        |SELECT coalesce(channel, 'none') AS channel,
        |  CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(v_c) AS BIGINT) AS sum_cents
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "q195_dq_expectations" ->
      """SELECT * FROM (
        |  SELECT 'orders_custkey_fk' AS check_name,
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_checked,
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |      WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                        WHERE c.c_custkey = o.o_custkey)) AS n_failed
        |  UNION ALL
        |  SELECT 'customer_key_unique',
        |    (SELECT CAST(count(*) AS BIGINT) FROM customer),
        |    (SELECT CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) FROM customer)
        |  UNION ALL
        |  SELECT 'lineitem_qty_range',
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |     WHERE l_quantity < 1 OR l_quantity > 50)
        |  UNION ALL
        |  SELECT 'lineitem_price_positive',
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |     WHERE NOT (l_extendedprice > 0))
        |  UNION ALL
        |  SELECT 'documents_nchars_consistent',
        |    (SELECT CAST(count(*) AS BIGINT) FROM documents),
        |    (SELECT CAST(count(*) AS BIGINT) FROM documents
        |     WHERE n_chars <> length(text))
        |  UNION ALL
        |  SELECT 'events_value_nonnull',
        |    (SELECT CAST(count(*) AS BIGINT) FROM events),
        |    (SELECT CAST(count(*) AS BIGINT) FROM events WHERE value IS NULL)
        |) ORDER BY check_name""".stripMargin,

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

    "q223_span_corruption" -> {
      val fp = (s: String) =>
        s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
           |  list_transform(string_split($s, ''), c -> CAST(ascii(c) AS BIGINT))),
           |  (acc, c) -> (acc * 31 + c) % 1000000007)""".stripMargin
      s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
         |           FROM documents),
         |c AS (
         |  SELECT doc_id, source, len(toks) AS n_tok,
         |    array_to_string(list_filter(
         |      list_transform(range(0, len(toks)), i ->
         |        CASE WHEN i % 10 = 0 THEN '<X>'
         |             WHEN i % 10 < 3 THEN NULL
         |             ELSE toks[i + 1] END), x -> x IS NOT NULL), ' ') AS corrupted,
         |    len(list_filter(range(0, len(toks)), i -> i % 10 < 3)) AS n_masked,
         |    len(list_filter(range(0, len(toks)), i -> i % 10 = 0)) AS n_spans
         |  FROM t)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  CAST(sum(n_masked) AS BIGINT) AS n_masked,
         |  CAST(sum(n_spans) AS BIGINT) AS n_spans,
         |  CAST(sum(${fp("corrupted")}) AS BIGINT) AS sum_fp
         |FROM c GROUP BY source ORDER BY source""".stripMargin
    },

    "q224_length_matching" ->
      """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
        |n AS (SELECT count(*) AS n FROM d),
        |r AS (SELECT source,
        |        ((row_number() OVER (ORDER BY n_chars, doc_id) - 1) * 4)
        |          // (SELECT n FROM n) AS quartile
        |      FROM d),
        |g AS (SELECT quartile, count(*) AS ng,
        |        (count(*) * 10000) // (SELECT n FROM n) AS g_bp
        |      FROM r GROUP BY 1),
        |s AS (SELECT source, quartile, count(*) AS ns FROM r GROUP BY 1, 2),
        |t AS (SELECT source, sum(ns) AS nt FROM s GROUP BY 1)
        |SELECT s.source, CAST(s.quartile AS BIGINT) AS quartile,
        |  CAST(ns AS BIGINT) AS ns,
        |  CAST((ns * 10000) // nt AS BIGINT) AS s_bp,
        |  CAST(g_bp AS BIGINT) AS g_bp,
        |  CAST(least(10000, (g_bp * 10000)
        |    // greatest((ns * 10000) // nt, 1)) AS BIGINT) AS keep_bp
        |FROM s JOIN t USING (source) JOIN g USING (quartile)
        |ORDER BY s.source, s.quartile""".stripMargin,

    "q221_activity_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |s AS (
        |  SELECT user_id,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS isl
        |  FROM days),
        |streaks AS (SELECT user_id, isl, count(*) AS len FROM s GROUP BY 1, 2),
        |best AS (SELECT user_id, max(len) AS best FROM streaks GROUP BY 1)
        |SELECT best AS streak_len, CAST(count(*) AS BIGINT) AS n_users
        |FROM best GROUP BY 1 ORDER BY 1""".stripMargin,

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

    "q219_negative_sampling" ->
      """WITH b AS (
        |  SELECT DISTINCT user_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |items AS (SELECT DISTINCT item FROM b),
        |users AS (SELECT DISTINCT user_id FROM b),
        |cand AS (
        |  SELECT u.user_id, i.item,
        |    (2654435761 * (u.user_id * 101 + i.item) + 1013904223)
        |      % 1000000007 AS h
        |  FROM users u CROSS JOIN items i
        |  WHERE NOT EXISTS (SELECT 1 FROM b
        |    WHERE b.user_id = u.user_id AND b.item = i.item)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY h, item) AS rn FROM cand)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_neg,
        |  CAST(sum(item) AS BIGINT) AS sum_items,
        |  CAST(sum(h) AS BIGINT) AS sum_h
        |FROM r WHERE rn <= 5 GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q220_cohort_ltv" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
        |cell AS (
        |  SELECT cohort_day, day - cohort_day AS off, sum(v) AS v
        |  FROM e JOIN f USING (user_id) GROUP BY 1, 2)
        |SELECT cohort_day, off, CAST(v AS BIGINT) AS value_cents,
        |  CAST(sum(v) OVER (PARTITION BY cohort_day ORDER BY off
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_value_cents
        |FROM cell ORDER BY cohort_day, off""".stripMargin,

    "q217_value_gini" ->
      """WITH u AS (
        |  SELECT event_type, user_id,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS x
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, x,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY x, user_id) AS rank FROM u)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(((2 * sum(rank * x) - (count(*) + 1) * sum(x)) * 10000)
        |    // (count(*) * sum(x)) AS BIGINT) AS gini_bp
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q218_top_share" ->
      """WITH u AS (
        |  SELECT event_type, user_id,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS x
        |  FROM events GROUP BY 1, 2),
        |n AS (SELECT event_type, count(*) AS n, sum(x) AS tot FROM u GROUP BY 1),
        |r AS (SELECT event_type, user_id, x,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY x, user_id) AS rank FROM u)
        |SELECT r.event_type, CAST(min(n) AS BIGINT) AS n_users,
        |  CAST(count(*) AS BIGINT) AS n_top,
        |  CAST((sum(x) * 10000) // min(tot) AS BIGINT) AS top_share_bp
        |FROM r JOIN n USING (event_type)
        |WHERE rank > n - (n + 99) // 100
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q213_seasonal_naive" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS v
        |  FROM events GROUP BY 1, 2),
        |d0 AS (SELECT min(day) AS d0 FROM daily)
        |SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(abs(a.v - b.v)) AS BIGINT) AS sum_abs_err,
        |  CAST(sum(abs(a.v - b.v)) // count(*) AS BIGINT) AS mae_cents
        |FROM daily a JOIN daily b
        |  ON b.event_type = a.event_type AND b.day = a.day - 7, d0
        |WHERE a.day >= d0.d0 + 16
        |GROUP BY a.event_type ORDER BY a.event_type""".stripMargin,

    "q214_cusum" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS v
        |  FROM events GROUP BY 1, 2),
        |d0 AS (SELECT min(day) AS d0 FROM daily),
        |base AS (SELECT event_type, sum(v) // count(*) AS mu
        |         FROM daily, d0 WHERE day < d0.d0 + 15 GROUP BY 1),
        |c AS (
        |  SELECT daily.event_type, day,
        |    sum(v - mu) OVER (PARTITION BY daily.event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
        |  FROM daily JOIN base USING (event_type))
        |SELECT event_type, CAST(max(abs(cusum)) AS BIGINT) AS max_abs_cusum,
        |  CAST(arg_max(day, abs(cusum) * 100000 - (day - (SELECT d0 FROM d0)))
        |    AS BIGINT) AS peak_day
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "q215_path_trigrams" ->
      """WITH s AS (
        |  SELECT event_type AS s1,
        |    lead(event_type, 1) OVER w AS s2,
        |    lead(event_type, 2) OVER w AS s3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY CAST(ts AS TIMESTAMP), event_id))
        |SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n
        |FROM s WHERE s3 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY n DESC, s1, s2, s3 LIMIT 10""".stripMargin,

    "q216_fifo_match" ->
      """WITH c AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS c_ts,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rk
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rk
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (SELECT p.user_id, count(*) AS n_matched,
        |        sum(abs(p_ts - c_ts)) AS lag_us
        |      FROM p JOIN c ON c.user_id = p.user_id AND c.rk = p.rk
        |      GROUP BY 1),
        |np AS (SELECT user_id, count(*) AS n_p FROM p GROUP BY 1),
        |nc AS (SELECT user_id, count(*) AS n_c FROM c GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(coalesce(n_matched, 0)) AS BIGINT) AS n_matched,
        |  CAST(sum(coalesce(n_p, 0) - coalesce(n_matched, 0)) AS BIGINT)
        |    AS n_unmatched_purchases,
        |  CAST(sum(coalesce(n_c, 0) - coalesce(n_matched, 0)) AS BIGINT)
        |    AS n_unmatched_clicks,
        |  CAST(sum(lag_us) // sum(n_matched) AS BIGINT) AS mean_abs_lag_us
        |FROM np FULL OUTER JOIN nc USING (user_id)
        |LEFT JOIN m USING (user_id)""".stripMargin,

    // Containment replay: shared shingle CTEs, A-prefix against B's full
    // postings, |A∩B| ≥ 0.8·|A|, canonical direction (sz, id).
    "q210_containment_dedup" ->
      s"""WITH ${DedupQueries.shingleCtes(3, extraCols = " lang,")},
         |r2 AS (SELECT doc_id, lang, hs AS ts FROM h WHERE len(hs) >= 1),
         |el AS (SELECT doc_id, unnest(ts) AS t FROM r2),
         |freq AS (SELECT t, count(*) AS df FROM el GROUP BY 1),
         |ord AS (
         |  SELECT el.doc_id, el.t,
         |    row_number() OVER (PARTITION BY el.doc_id ORDER BY df, el.t) AS rn,
         |    count(*) OVER (PARTITION BY el.doc_id) AS s
         |  FROM el JOIN freq USING (t)),
         |pre AS (SELECT doc_id, t FROM ord WHERE rn <= s - (8*s + 9)//10 + 1),
         |cand AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
         |         FROM pre a JOIN el b ON a.t = b.t AND a.doc_id <> b.doc_id),
         |v AS (
         |  SELECT ida, idb, len(list_intersect(ra.ts, rb.ts)) AS i,
         |         len(ra.ts) AS sa, len(rb.ts) AS sb, ra.lang
         |  FROM cand JOIN r2 ra ON ra.doc_id = ida JOIN r2 rb ON rb.doc_id = idb
         |  WHERE len(ra.ts) < len(rb.ts)
         |     OR (len(ra.ts) = len(rb.ts) AND ida < idb))
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(count(DISTINCT ida) AS BIGINT) AS n_contained_docs,
         |  CAST(sum(i) AS BIGINT) AS sum_inter,
         |  CAST(sum(sa) AS BIGINT) AS sum_sz_a
         |FROM v WHERE i * 10 >= 8 * sa
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "q211_topk_churn" ->
      """WITH daily AS (
        |  SELECT day, item FROM (
        |    SELECT day, item, row_number() OVER (PARTITION BY day
        |      ORDER BY n DESC, item) AS rn
        |    FROM (
        |      SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
        |        count(*) AS n
        |      FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
        |      GROUP BY 1, 2))
        |  WHERE rn <= 10)
        |SELECT b.day, CAST(count(*) AS BIGINT) AS n_common
        |FROM daily a JOIN daily b ON b.day = a.day + 1 AND b.item = a.item
        |GROUP BY b.day ORDER BY b.day""".stripMargin,

    "q212_l_diversity" ->
      """WITH c AS (SELECT c_mktsegment, c_nationkey,
        |             CAST(round(c_acctbal * 100) AS BIGINT) AS bal FROM customer),
        |mm AS (SELECT min(bal) AS lo, max(bal) AS hi FROM c),
        |g AS (
        |  SELECT c_mktsegment, c_nationkey,
        |    count(DISTINCT least(9, ((bal - lo) * 10) // (hi - lo + 1))) AS l,
        |    count(*) AS n
        |  FROM c, mm GROUP BY 1, 2)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(min(l) AS BIGINT) AS min_l,
        |  CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_diversity,
        |  CAST(sum(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT) AS n_exposed_rows
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // Samples replayed arithmetically (the q142 fixture formula), framed
    // by j div 8, signed via the 16-bit two's-complement fold.
    "q206_audio_energy" ->
      """WITH d AS (SELECT doc_id, lang, 20 + doc_id % 10 AS n FROM documents),
        |s AS (
        |  SELECT doc_id, lang, j // 8 AS frame,
        |    CASE WHEN ((doc_id*13 + 7*j) % 2048 + 64512) % 65536 >= 32768
        |         THEN ((doc_id*13 + 7*j) % 2048 + 64512) % 65536 - 65536
        |         ELSE ((doc_id*13 + 7*j) % 2048 + 64512) % 65536 END AS sv
        |  FROM d, LATERAL (SELECT unnest(range(0, n)) AS j) r),
        |f AS (SELECT doc_id, lang, frame, count(*) AS ns, sum(sv*sv) AS energy
        |      FROM s GROUP BY 1, 2, 3)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(sum(energy) AS BIGINT) AS sum_energy,
        |  CAST(sum(CASE WHEN energy < ns * 90000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_silent
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin,

    "q207_target_encoding" ->
      """WITH c AS (SELECT c_nationkey,
        |             CAST(round(c_acctbal * 100) AS BIGINT) AS bal FROM customer),
        |g AS (SELECT c_nationkey, sum(bal) AS tot, count(*) AS n
        |      FROM c GROUP BY 1)
        |SELECT c.c_nationkey, CAST(min(n) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN n <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_enc,
        |  CAST(coalesce(sum(CASE WHEN n > 1
        |    THEN (tot - bal) // (n - 1) END), 0) AS BIGINT) AS sum_enc
        |FROM c JOIN g USING (c_nationkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q208_purged_folds" ->
      """WITH e AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
        |    - (SELECT min(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000)
        |       FROM events) AS rel
        |  FROM events),
        |x AS (SELECT rel, unnest(range(0, 3)) AS fold FROM e),
        |c AS (
        |  SELECT fold,
        |    CASE WHEN rel BETWEEN fold*10 AND fold*10 + 9 THEN 'test'
        |         WHEN rel BETWEEN fold*10 - 1 AND fold*10 + 10 THEN 'embargo'
        |         ELSE 'train' END AS cls
        |  FROM x)
        |SELECT fold,
        |  CAST(sum(CASE WHEN cls = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
        |  CAST(sum(CASE WHEN cls = 'embargo' THEN 1 ELSE 0 END) AS BIGINT) AS n_embargo,
        |  CAST(sum(CASE WHEN cls = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train
        |FROM c GROUP BY fold ORDER BY fold""".stripMargin,

    // Farthest-first unrolled 4 steps over integer-micro L2 (round, the
    // microsVec convention), MATERIALIZED chain, ties to smaller id.
    "q209_kcenter_coreset" -> {
      val distS =
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 65), " +
          "i -> (m.vm[i] - c.vm[i]) * (m.vm[i] - c.vm[i]))), (acc, x) -> acc + x)"
      val steps = (2 to 5).map { k =>
        s"""d$k AS MATERIALIZED (
           |  SELECT m.id, min($distS) AS dmin
           |  FROM m JOIN c${k - 1} c ON m.id <> c.id
           |  WHERE m.id NOT IN (SELECT id FROM c${k - 1})
           |  GROUP BY m.id),
           |p$k AS MATERIALIZED (SELECT id, dmin FROM d$k
           |                     ORDER BY dmin DESC, id LIMIT 1),
           |c$k AS MATERIALIZED (SELECT id, vm FROM c${k - 1}
           |  UNION ALL SELECT m.id, m.vm FROM m JOIN p$k USING (id))""".stripMargin
      }.mkString(",\n")
      val union = ("SELECT 1 AS step, id, CAST(0 AS BIGINT) AS dmin FROM p1" +:
        (2 to 5).map(k => s"SELECT $k, id, dmin FROM p$k")).mkString(" UNION ALL ")
      s"""WITH m AS MATERIALIZED (
         |  SELECT vec_id AS id,
         |    list_transform(range(1, 65),
         |      i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)) AS vm
         |  FROM embeddings),
         |p1 AS MATERIALIZED (SELECT min(id) AS id FROM m),
         |c1 AS MATERIALIZED (SELECT m.id, m.vm FROM m JOIN p1 USING (id)),
         |$steps
         |SELECT step, id AS vec_id, dmin FROM ($union) ORDER BY step""".stripMargin
    },

    "q202_assoc_rules" ->
      """WITH b AS (
        |  SELECT DISTINCT user_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |sup AS (SELECT item, count(*) AS sup FROM b GROUP BY 1),
        |f AS (SELECT item, sup FROM sup WHERE sup >= 10),
        |fb AS (SELECT b.user_id, b.item FROM b JOIN f USING (item)),
        |p AS (
        |  SELECT l.item AS i, r.item AS j, count(*) AS support
        |  FROM fb l JOIN fb r ON l.user_id = r.user_id AND l.item < r.item
        |  GROUP BY 1, 2)
        |SELECT i, j, CAST(support AS BIGINT) AS support,
        |  CAST(support * 10000 // fi.sup AS BIGINT) AS conf_ij_bp,
        |  CAST(support * 10000 // fj.sup AS BIGINT) AS conf_ji_bp
        |FROM p JOIN f fi ON fi.item = p.i JOIN f fj ON fj.item = p.j
        |ORDER BY support DESC, i, j LIMIT 20""".stripMargin,

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

    // Tolerance-boolean pattern (q115): the exact join size replays in
    // SQL; ge_ok is deterministic (inner products only overestimate) and
    // slack_ok holds by the N_A·N_B/width bound with 3× margin.
    "q204_join_card_est" ->
      """WITH a AS (SELECT user_id, count(*) AS ca FROM events
        |           WHERE event_type = 'click' GROUP BY 1),
        |b AS (SELECT user_id, count(*) AS cb FROM events
        |      WHERE event_type = 'purchase' GROUP BY 1),
        |na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM events
        |       WHERE event_type = 'click'),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM events
        |       WHERE event_type = 'purchase')
        |SELECT
        |  (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT)
        |   FROM a JOIN b USING (user_id)) AS exact_size,
        |  na.n_a, nb.n_b, true AS ge_ok, true AS slack_ok
        |FROM na, nb""".stripMargin,

    "q205_equidepth_hist" ->
      """WITH e AS (SELECT event_type, event_id,
        |             CAST(round(value * 100) AS BIGINT) AS v_c FROM events),
        |r AS (SELECT event_type, v_c,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY v_c, event_id) AS rank FROM e),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
        |bk AS (
        |  SELECT r.event_type, (rank * 8 + n - 1) // n AS bucket,
        |    max(v_c) AS hi, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM r JOIN n USING (event_type) GROUP BY 1, 2)
        |SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
        |  CAST(lag(hi) OVER (PARTITION BY event_type ORDER BY bucket) AS BIGINT) AS lo,
        |  CAST(hi AS BIGINT) AS hi, n_rows
        |FROM bk ORDER BY event_type, bucket""".stripMargin,

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

    "q200_heaps_law" ->
      s"""WITH ${DedupQueries.shingleCtes(3)},
         |f AS (
         |  SELECT t, min(doc_id) AS first_doc FROM (
         |    SELECT doc_id, unnest(hs) AS t FROM h) GROUP BY t),
         |n AS (SELECT max(doc_id) + 1 AS n FROM documents),
         |d AS (
         |  SELECT least(9, (first_doc * 10) // n.n) AS decile,
         |    CAST(count(*) AS BIGINT) AS n_new_shingles
         |  FROM f, n GROUP BY 1)
         |SELECT decile, n_new_shingles,
         |  CAST(sum(n_new_shingles) OVER (ORDER BY decile
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
         |FROM d ORDER BY decile""".stripMargin,

    "q201_retrieval_mrr" -> {
      val dotS = (a: String, b: String) =>
        s"list_reduce(list_prepend(0.0, list_transform(range(1, 65), " +
          s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"
      val cosS = (a: String, b: String) =>
        s"CASE WHEN sqrt(${dotS(a, a)}) * sqrt(${dotS(b, b)}) = 0.0 THEN 0.0 " +
          s"ELSE (${dotS(a, b)}) / (sqrt(${dotS(a, a)}) * sqrt(${dotS(b, b)})) END"
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id AS query_id, embedding AS qv, label AS q_label
         |  FROM embeddings WHERE vec_id < 20),
         |ranked AS (
         |  SELECT query_id, q_label, corpus_id, c_label, rn FROM (
         |    SELECT q.query_id, q.q_label, c.vec_id AS corpus_id,
         |      c.label AS c_label,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY ${cosS("c.embedding", "q.qv")} DESC, c.vec_id) AS rn
         |    FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.query_id)
         |  WHERE rn <= 10),
         |rr AS (
         |  SELECT query_id, 1000000 // min(rn) AS rr_micros
         |  FROM ranked WHERE c_label = q_label GROUP BY query_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(count(rr.rr_micros) AS BIGINT) AS n_hit,
         |  CAST(coalesce(sum(rr.rr_micros), 0) // count(*) AS BIGINT) AS mean_rr_micros
         |FROM q LEFT JOIN rr USING (query_id)""".stripMargin
    },

    // Both retrieval paths replayed: reduced vectors from the ±1
    // sin-sign planes (floor micros), integer L2 top-10 vs exact cosine
    // top-10, hits counted per query.
    "q197_jl_recall" -> {
      val dotS = (a: String, b: String) =>
        s"list_reduce(list_prepend(0.0, list_transform(range(1, 65), " +
          s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"
      val cosS = (a: String, b: String) =>
        s"CASE WHEN sqrt(${dotS(a, a)}) * sqrt(${dotS(b, b)}) = 0.0 THEN 0.0 " +
          s"ELSE (${dotS(a, b)}) / (sqrt(${dotS(a, a)}) * sqrt(${dotS(b, b)})) END"
      s"""WITH red AS MATERIALIZED (
         |  SELECT vec_id,
         |    list_transform(range(1, 17), p -> CAST(floor(1000000 *
         |      list_reduce(list_prepend(0.0, list_transform(range(1, 65),
         |        i -> CAST(embedding[i] AS DOUBLE) *
         |             CAST(sign(sin(CAST(i * p AS DOUBLE))) AS DOUBLE))),
         |        (acc, x) -> acc + x)) AS BIGINT)) AS rv
         |  FROM embeddings),
         |q AS (SELECT vec_id AS query_id, rv AS qrv FROM red WHERE vec_id < 5),
         |approx AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT q.query_id, red.vec_id AS corpus_id,
         |      row_number() OVER (PARTITION BY q.query_id ORDER BY
         |        list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          list_transform(range(1, 17),
         |            j -> (red.rv[j] - q.qrv[j]) * (red.rv[j] - q.qrv[j]))),
         |          (acc, d) -> acc + d),
         |        red.vec_id) AS rn
         |    FROM red CROSS JOIN q WHERE red.vec_id <> q.query_id)
         |  WHERE rn <= 10),
         |exact AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT q2.query_id, c.vec_id AS corpus_id,
         |      row_number() OVER (PARTITION BY q2.query_id
         |        ORDER BY ${cosS("c.embedding", "q2.qv")} DESC, c.vec_id) AS rn
         |    FROM embeddings c CROSS JOIN
         |      (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
         |       WHERE vec_id < 5) q2
         |    WHERE c.vec_id <> q2.query_id)
         |  WHERE rn <= 10),
         |hits AS (
         |  SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hits
         |  FROM exact e JOIN approx a
         |    ON a.query_id = e.query_id AND a.corpus_id = e.corpus_id
         |  GROUP BY e.query_id)
         |SELECT q.query_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits
         |FROM q LEFT JOIN hits h ON h.query_id = q.query_id
         |ORDER BY q.query_id""".stripMargin
    },

    "q198_k_anonymity" ->
      """WITH c AS (SELECT c_mktsegment, c_nationkey,
        |             CAST(round(c_acctbal * 100) AS BIGINT) AS bal FROM customer),
        |mm AS (SELECT min(bal) AS lo, max(bal) AS hi FROM c),
        |g AS (
        |  SELECT c_mktsegment, c_nationkey,
        |    least(9, ((bal - lo) * 10) // (hi - lo + 1)) AS decile,
        |    count(*) AS n
        |  FROM c, mm GROUP BY 1, 2, 3)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_groups,
        |  CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS n_suppressed
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "q190_importance_select" ->
      """WITH tok AS (SELECT doc_id, source, (source IN ('src1','src2')) AS tgt,
        |               unnest(list_distinct(string_split(text, ' '))) AS t
        |             FROM documents),
        |freq AS (SELECT t, count(*) AS rdf,
        |           CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS tdf
        |         FROM tok GROUP BY 1),
        |doc AS (SELECT doc_id, any_value(source) AS source,
        |          CAST(count(*) AS BIGINT) AS n_tok,
        |          sum((tdf * 1000000) // rdf) // count(*) AS score
        |        FROM tok JOIN freq USING (t) GROUP BY 1)
        |SELECT doc_id, source, n_tok, CAST(score AS BIGINT) AS score
        |FROM doc ORDER BY score DESC, doc_id LIMIT 25""".stripMargin)
}
