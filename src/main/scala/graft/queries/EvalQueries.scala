package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{CoreOps, EntityResolution, Intervals}
import graft.similarity.Similarity
import graft.text.TextOps

/** Model-evaluation / feature-prep operators: JL-projection recall,
  * retrieval MRR, audio frame energy, leakage-safe target encoding and
  * purged temporal CV folds. Split out of CurationQueries along the
  * family seam (VERDICT r7 item 6).
  */
object EvalQueries {

  import CoreOps.cents

  /** Mann–Whitney midrank ROC-AUC over (strata..., sc, y, event_id) —
    * exact under ties (2·midrank per tied group = min+max rank, an
    * integer), ranked by [[CoreOps.rangeRank]] so no global window ever
    * runs. Shared by the global (q252) and per-segment (q263) forms.
    */
  private[graft] def midrankAuc(e: DataFrame, strata: Seq[String]): DataFrame = {
    val ranked = CoreOps.rangeRank(e, strata,
      Seq(col("sc"), col("event_id")), rankCol = "rnk")
    val g = ranked.groupBy((strata :+ "sc").map(col): _*)
      .agg(sum(col("rnk")).as("sum_rank"), count(lit(1)).as("n_g"),
        sum(col("y")).as("p_g"))
    // BOUNDS (r12 overflow audit): 2U = sum2mid − P(P+1) ≤ 2·P·N is
    // data-sized on two axes (≈ 4e11 at sf1, P = 0.4N), so the ×1e6
    // numerator wraps int64 at ~30× sf1 — it runs in DECIMAL(38,0);
    // `div` returns BIGINT, both operands nonnegative (U ≥ 0), so
    // truncation = floor on both engines (DuckDB's sums are HUGEINT
    // already). sum2mid itself ≤ 2PN stays int64 to ~3000× sf1;
    // per-group Σrank ≤ n_g·N likewise — documented, not cast.
    g.groupBy(strata.map(col): _*)
      .agg(sum(expr("p_g * ((2 * sum_rank) div n_g)")).as("sum2mid"),
        sum(col("p_g")).as("p"), sum(col("n_g")).as("n"))
      .select(strata.map(col) ++ Seq(col("p").as("n_pos"),
        (col("n") - col("p")).as("n_neg"),
        expr("(1000000 * (CAST(sum2mid AS DECIMAL(38,0)) - p * (p + 1)))" +
          " div (2 * p * (n - p))").as("auc_micros")): _*)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

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


    // Distributed ROC-AUC via the Mann-Whitney rank statistic — the
    // standard quality-classifier eval (does `value` separate
    // purchase/signup events from the rest?). Exact under ties through
    // integer MIDRANKS: within a tied-score group of consecutive ranks,
    // 2·midrank = 2·Σrank/n is an exact integer (= min+max), so
    // 2U = Σ_pos 2·midrank − P(P+1) and auc_micros = 1e6·2U div (2·P·N)
    // stay in BIGINT with zero float ops. Scale shape: the global rank is
    // CoreOps.rangeRank (range-partitioned prefix offsets — no
    // single-partition window), then one groupBy(score) + one 1-row agg.
    // Long sums hold to ~sf10 (Σrank ≤ N²·½, ×1e6 headroom); past that
    // the two sums switch to decimal(38,0) with an explicit
    // multiply-subtract floor div.
    "q252_auc_rank" -> ((s, dir) => {
      midrankAuc(Tables.load(s, dir, "events").select(
        cents(col("value")).as("sc"),
        when(col("event_type").isin("purchase", "signup"), 1L)
          .otherwise(0L).as("y"),
        col("event_id")), Seq.empty)
    }),


    // Calibration-by-decile audit + Brier score for a pseudo-probability
    // (value/max(value), floor micros): per score decile (exact
    // distributedNtile — no global-window sort), row count, mean
    // predicted probability vs observed positive rate, their gap, and
    // the mean squared error in micros² — the reliability-diagram table
    // every classifier-scored corpus filter ships with its data card.
    // All integer-exact: probabilities are floor-micros of a rational,
    // Brier terms are exact squares of micro differences.
    "q253_calibration_deciles" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events").select(
        cents(col("value")).as("sc"),
        when(col("event_type").isin("purchase", "signup"), 1L)
          .otherwise(0L).as("y"),
        col("event_id")).withColumn("g", lit(0))
      val maxSc = e.groupBy(col("g")).agg(max(col("sc")).as("max_sc"))
      val p = e.join(broadcast(maxSc), Seq("g"))
        .withColumn("p_micros", expr("(1000000 * sc) div max_sc"))
      // BOUNDS (r12 overflow audit): each Brier term is ≤ 1e12, so an
      // int64 sum wraps past ~9.2e6 rows per decile — data-sized, not
      // window-bounded, hence the sum runs in DECIMAL(38,0) like q251's
      // var2 (DuckDB's BIGINT sum is HUGEINT already). `div` (Spark
      // IntegralDivide) accepts decimal and returns BIGINT, and both
      // operands are nonnegative, so truncation = floor on both engines.
      // sum_p stays int64: terms ≤ 1e6 → headroom to 9.2e12 rows/decile.
      CoreOps.distributedNtile(p, Seq("g"),
          Seq(col("sc"), col("event_id")), n = 10, binCol = "decile")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), sum(col("p_micros")).as("sum_p"),
          sum(col("y")).as("n_pos"),
          sum(expr("CAST(p_micros - 1000000 * y AS DECIMAL(38,0)) *" +
              " (p_micros - 1000000 * y)"))
            .as("sum_sq"))
        .select(col("decile").cast("long").as("decile"), col("n"),
          expr("sum_p div n").as("mean_p_micros"),
          expr("(1000000 * n_pos) div n").as("frac_pos_micros"),
          abs(expr("sum_p div n") - expr("(1000000 * n_pos) div n"))
            .as("gap_micros"),
          expr("sum_sq div n").as("brier_micros2"))
        .orderBy(col("decile"))
    }),


    // Per-segment ROC-AUC (q252's midrank machinery with event_type as
    // the rangeRank stratum): does value separate weekend from weekday
    // activity, per event type — the sliced-eval report a classifier
    // ships (aggregate AUC hides a segment where the score is inverted).
    // Weekend = epoch-day mod 7 ∈ {2, 3} (Sat/Sun; day 0 = Thursday) —
    // timezone-free, so both engines label identically.
    "q263_group_auc" -> ((s, dir) => {
      midrankAuc(Tables.load(s, dir, "events").select(
          col("event_type"), cents(col("value")).as("sc"),
          when(expr("(unix_micros(ts) div 86400000000) % 7").isin(2, 3), 1L)
            .otherwise(0L).as("y"),
          col("event_id")), Seq("event_type"))
        .orderBy(col("event_type"))
    }),


    // Split-conformal prediction intervals (Vovk; Lei et al., JASA
    // 2018) — the distribution-free uncertainty gate for model serving:
    // fit on split A (per-type mean, integer cents), take q̂ = the
    // ⌈0.9·(n+1)⌉-th smallest |y − ŷ| on calibration split B (an EXACT
    // order statistic via rangeRank — never a per-stratum sort window),
    // audit empirical coverage on test split C. ~90% coverage is then
    // GUARANTEED by exchangeability, and the audit's cov_bp says how
    // tight the finite sample runs. Splits hash on user_id so the
    // assignment reproduces on any cluster at any scale.
    "q281_conformal" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events").select(col("event_type"),
        col("event_id"), col("user_id"), cents(col("value")).as("vc"))
      val mu = e.filter(col("user_id") % 4 <= 1)
        .groupBy(col("event_type")).agg(expr("sum(vc) div count(1)").as("mu"))
      val cal = e.filter(col("user_id") % 4 === 2)
        .join(broadcast(mu), "event_type")
        .select(col("event_type"), col("event_id"),
          abs(col("vc") - col("mu")).as("sc"))
        .localCheckpoint() // rangeRank double-evaluates its input
      val n = cal.groupBy(col("event_type")).agg(count(lit(1)).as("n_cal"))
      val qhat = CoreOps.rangeRank(cal, Seq("event_type"),
          Seq(col("sc"), col("event_id")), "rk")
        .join(broadcast(n), "event_type")
        .filter(col("rk") ===
          least(col("n_cal"), expr("(9 * (n_cal + 1) + 9) div 10")))
        .select(col("event_type"), col("sc").as("qhat_cents"), col("n_cal"))
      val cov = e.filter(col("user_id") % 4 === 3)
        .join(broadcast(mu), "event_type")
        .join(broadcast(qhat), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(abs(col("vc") - col("mu")) <= col("qhat_cents"), 1L)
            .otherwise(0L)).as("n_covered"))
      mu.join(qhat, "event_type").join(cov, "event_type")
        .select(col("event_type"), col("mu").as("mu_cents"),
          col("n_cal"), col("qhat_cents"), col("n_test"), col("n_covered"),
          expr("(10000 * n_covered) div n_test").as("cov_bp"))
        .orderBy(col("event_type"))
    }),

  )

  val oracles: Map[String, String] = Map(

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


    // Midranks replayed through a plain row_number: per-score-group
    // Σrank is order-independent, so the oracle's single sort and the
    // engine's range-partitioned rank agree exactly.
    "q252_auc_rank" ->
      """WITH s AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS sc,
        |    CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS y,
        |    event_id
        |  FROM events),
        |r AS (SELECT sc, y,
        |        row_number() OVER (ORDER BY sc, event_id) AS rnk FROM s),
        |g AS (SELECT sc, sum(rnk) AS sum_rank, count(*) AS n_g, sum(y) AS p_g
        |      FROM r GROUP BY sc),
        |t AS (SELECT sum(p_g * ((2 * sum_rank) // n_g)) AS sum2mid,
        |        sum(p_g) AS p, sum(n_g) AS n FROM g)
        |SELECT CAST(p AS BIGINT) AS n_pos, CAST(n - p AS BIGINT) AS n_neg,
        |  CAST((1000000 * (sum2mid - p * (p + 1))) // (2 * p * (n - p))
        |    AS BIGINT) AS auc_micros
        |FROM t""".stripMargin,


    "q253_calibration_deciles" ->
      """WITH s AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS sc,
        |    CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS y,
        |    event_id
        |  FROM events),
        |p AS (
        |  SELECT sc, y, event_id,
        |    (1000000 * sc) // (SELECT max(sc) FROM s) AS p_micros
        |  FROM s),
        |b AS (SELECT y, p_micros,
        |        ntile(10) OVER (ORDER BY sc, event_id) AS decile FROM p),
        |a AS (
        |  SELECT decile, count(*) AS n, sum(p_micros) AS sum_p,
        |    sum(y) AS n_pos,
        |    sum((p_micros - 1000000 * y) * (p_micros - 1000000 * y)) AS sum_sq
        |  FROM b GROUP BY decile)
        |SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n,
        |  CAST(sum_p // n AS BIGINT) AS mean_p_micros,
        |  CAST((1000000 * n_pos) // n AS BIGINT) AS frac_pos_micros,
        |  CAST(abs(sum_p // n - (1000000 * n_pos) // n) AS BIGINT) AS gap_micros,
        |  CAST(sum_sq // n AS BIGINT) AS brier_micros2
        |FROM a ORDER BY decile""".stripMargin,


    "q263_group_auc" ->
      """WITH s AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS sc,
        |    CASE WHEN (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) % 7
        |           IN (2, 3) THEN 1 ELSE 0 END AS y,
        |    event_id
        |  FROM events),
        |r AS (SELECT event_type, sc, y,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY sc, event_id) AS rnk FROM s),
        |g AS (SELECT event_type, sc, sum(rnk) AS sum_rank, count(*) AS n_g,
        |        sum(y) AS p_g
        |      FROM r GROUP BY event_type, sc),
        |t AS (SELECT event_type,
        |        sum(p_g * ((2 * sum_rank) // n_g)) AS sum2mid,
        |        sum(p_g) AS p, sum(n_g) AS n
        |      FROM g GROUP BY event_type)
        |SELECT event_type, CAST(p AS BIGINT) AS n_pos,
        |  CAST(n - p AS BIGINT) AS n_neg,
        |  CAST((1000000 * (sum2mid - p * (p + 1))) // (2 * p * (n - p))
        |    AS BIGINT) AS auc_micros
        |FROM t ORDER BY event_type""".stripMargin,


    // The oracle's per-stratum row_number window IS what rangeRank
    // replaces; identical order because the key ends in event_id.
    "q281_conformal" ->
      """WITH e AS (
        |  SELECT event_type, event_id, user_id,
        |    CAST(round(value * 100) AS BIGINT) AS vc FROM events),
        |mu AS (SELECT event_type, sum(vc) // count(*) AS mu
        |       FROM e WHERE user_id % 4 <= 1 GROUP BY 1),
        |cal AS (SELECT e.event_type, event_id, abs(vc - mu) AS sc
        |        FROM e JOIN mu USING (event_type) WHERE user_id % 4 = 2),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal
        |      FROM cal GROUP BY 1),
        |r AS (SELECT event_type, sc,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY sc, event_id) AS rk FROM cal),
        |q AS (SELECT r.event_type, sc AS qhat_cents, n_cal
        |      FROM r JOIN n USING (event_type)
        |      WHERE rk = least(n_cal, (9 * (n_cal + 1) + 9) // 10)),
        |cov AS (
        |  SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_test,
        |    CAST(sum(CASE WHEN abs(vc - mu) <= qhat_cents THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_covered
        |  FROM e JOIN mu USING (event_type) JOIN q USING (event_type)
        |  WHERE user_id % 4 = 3 GROUP BY 1)
        |SELECT event_type, CAST(mu AS BIGINT) AS mu_cents, n_cal,
        |  CAST(qhat_cents AS BIGINT) AS qhat_cents, n_test, n_covered,
        |  CAST((10000 * n_covered) // n_test AS BIGINT) AS cov_bp
        |FROM mu JOIN q USING (event_type) JOIN cov USING (event_type)
        |ORDER BY event_type""".stripMargin,

  )
}
