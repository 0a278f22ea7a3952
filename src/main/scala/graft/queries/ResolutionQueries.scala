package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{CoreOps, EntityResolution, Intervals, Skyline}

/** Wave 7 — record-linkage and interval/frontier analytics: blocked fuzzy
  * entity resolution (block-purge-verify, never all-pairs), gaps-and-islands
  * interval coalescing, step-function time integration, and the 2-D Pareto
  * skyline. Each is the scalable formulation of an operation the reference's
  * users would otherwise hand-roll quadratically.
  */
object ResolutionQueries {

  import CoreOps.cents

  private def secs(c: Column) = unix_timestamp(c)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Blocked fuzzy ER over documents: block on (lang, first token, 20-char
    // length bucket), purge blocks > 100 rows, verify 40-char-prefix
    // levenshtein <= 10 with the threshold (early-exit) kernel. Per-lang
    // match-pair rollup; integer distances hash-gate exactly.
    "q180_fuzzy_er" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      EntityResolution.blockedFuzzyPairs(docs, "doc_id", "text",
          extraBlockCols = Seq("lang"), lenBucket = 20, blockCap = 100,
          prefixLen = 40, maxDist = 10)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("dist")).as("sum_dist"))
        .orderBy(col("lang"))
    }),

    // Gaps-and-islands: events become [start, start+60+event_id%540]
    // validity intervals; coalesce overlaps per user and roll up coverage.
    // One window sort per user, no self-join.
    "q181_interval_coalesce" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("s0", secs(col("ts")))
        .withColumn("e0", col("s0") + lit(60L) + col("event_id") % 540)
      Intervals.coverage(ev, "user_id", col("s0"), col("e0"), col("event_id"))
        .orderBy(col("user_id"))
    }),

    // Step-function time integration: each event's value (cents) holds until
    // the user's next event; exact integer weighted sum + held seconds.
    "q182_time_weighted" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      Intervals.timeWeightedSum(ev, "user_id", secs(col("ts")),
          cents(col("value")), col("event_id"))
        .orderBy(col("user_id"))
    }),

    // Per-document duplicated-shingle fraction — the doc-grain twin of
    // TextOps.boilerplateStats (which stops at per-source totals): how
    // much of EACH document's content appears verbatim elsewhere in the
    // corpus, rolled up per language with a majority-duplicated doc count
    // (the rows a crawl pipeline drops). Shingles travel as 8-byte hashes
    // (codegen'd shingle_hashes, distinct per doc); the corpus count table
    // is a partial-aggregable hash agg; the join back to the exploded rows
    // is hash-keyed with skew bounded by docs-per-shingle. No pair join.
    "q186_dup_shingle_frac" -> ((s, dir) => {
      org.apache.spark.sql.GraftFunctions.register(s)
      // Explicit width (the 5043be2 treatment): the shingle kernel +
      // explode is the CPU and has TWO consumers (census + join side);
      // at the local scan's 1-3 splits it ran near-serial — twice — at
      // sf1. Width first; the kernel still runs once per consumer (the
      // census's column pruning re-canonicalizes its copy, so
      // ReusedExchange never fires), but at full width that duplicate is
      // cheaper than materializing the 45×-exploded hash rows — measured
      // both ways: repartition-only 2.13 s sf1, +localCheckpoint 2.72 s.
      val sh = Tables.load(s, dir, "documents")
        .repartition(s.sessionState.conf.numShufflePartitions)
        .select(col("doc_id"), col("lang"),
          explode(call_function("shingle_hashes", col("text"), lit(3))).as("h"))
      val cnt = sh.groupBy(col("h")).agg(count(lit(1)).as("nd"))
      sh.join(cnt, Seq("h"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_sh"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_sh")).as("n_shingles"),
          sum(col("n_dup")).as("n_dup_shingles"),
          sum(when(col("n_dup") * 2 > col("n_sh"), 1L).otherwise(0L))
            .as("n_docs_majority_dup"))
        .orderBy(col("lang"))
    }),

    // 2-D Pareto skyline per market segment: customers not dominated on
    // (account balance, order count). Sort-filter skyline — one distinct +
    // one window, no quadratic anti-join.
    "q183_skyline" -> ((s, dir) => {
      val oc = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_ord"))
      val c = Tables.load(s, dir, "customer")
        .join(oc, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_mktsegment"), cents(col("c_acctbal")).as("bal"),
          coalesce(col("n_ord"), lit(0L)).as("no"))
      Skyline.frontier2D(c, Seq("c_mktsegment"), col("bal"), col("no"))
        .select(col("c_mktsegment"), col("x").as("acctbal_cents"),
          col("y").as("n_orders"), col("n_points"))
        .orderBy(col("c_mktsegment"), col("acctbal_cents"), col("n_orders"))
    }),


    // Survivorship / golden-record merge — the step AFTER entity
    // resolution: collapse each matched entity (user_id) to one record
    // with per-FIELD survivor rules (MDM "most recent wins" for the type,
    // "highest value wins" for the payload, plus first-seen and exact
    // totals). Each argmax is a struct-max aggregate — ONE shuffle for
    // all five fields, no per-field window sorts, tie-broken by the
    // unique event_id so the survivor is deterministic on any cluster.
    "q256_survivorship" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events").select(
        col("user_id"), col("ts"), col("event_id"), col("event_type"),
        cents(col("value")).as("v_cents"), col("props"))
      e.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("first_ts"),
          max(struct(col("ts"), col("event_id"), col("event_type"))).as("l"),
          max(struct(col("v_cents"), col("event_id"), col("props"))).as("b"),
          sum(col("v_cents")).as("total_cents"))
        .select(col("user_id"), col("n_events"), col("first_ts"),
          col("l.event_type").as("last_event_type"),
          col("b.props").as("best_props"), col("total_cents"))
        .orderBy(col("user_id"))
    }),


    // Sorted-neighborhood ER blocking (Hernández & Stolfo, SIGMOD 1995)
    // — the blocking strategy for near-dups that share a sort-key PREFIX
    // rather than an exact block key: rank parts by (p_name, p_partkey)
    // with [[CoreOps.rangeRank]] (range-partitioned, never a one-task
    // global window), then compare each record to its w=3 successors via
    // an EQUI-join on rank+offset — O(w·n) candidates by construction,
    // skew-impossible (every rank key is unique), versus key blocking's
    // hot-block quadratic risk. Verify = full-name levenshtein ≤ 3 on
    // distinct parts. Per-offset rollup shows the classic SN decay:
    // adjacent ranks match most, the window tail pays for recall.
    "q277_sorted_neighborhood" -> ((s, dir) => {
      val w = 3
      val p = Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_name"))
      val ranked = CoreOps.rangeRank(p, Nil,
          Seq(col("p_name"), col("p_partkey")), "rk")
        .localCheckpoint()
      val left = ranked.withColumn("off",
          explode(expr(s"sequence(CAST(1 AS BIGINT), CAST($w AS BIGINT))")))
        .withColumn("nrk", col("rk") + col("off"))
        .select(col("off"), col("nrk"), col("p_name").as("nm1"))
      val right = ranked.select(col("rk").as("nrk"),
        col("p_name").as("nm2"))
      left.join(right, "nrk")
        .withColumn("dist", levenshtein(col("nm1"), col("nm2")))
        .groupBy(col("off"))
        .agg(count(lit(1)).as("n_candidates"),
          sum(when(col("dist") <= 3, 1L).otherwise(0L)).as("n_matches"),
          sum(when(col("dist") === 0, 1L).otherwise(0L)).as("n_exact"),
          sum(col("dist").cast("long")).as("sum_dist"))
        .orderBy(col("off"))
    }),


    // Peak concurrency (sweep line): q181's synthetic validity intervals
    // become ±1 boundary points; the running sum of deltas in event-time
    // order IS the live-interval count, and its max is the capacity
    // metric every serving/session system sizes against. The prefix sum
    // rides rangePrefixSums (per-type range partitioning, never a
    // one-task global window); end-before-start ordering at equal
    // timestamps (delta −1 < +1) means touching intervals don't
    // double-count; (t, delta, event_id) is a total order so the peak
    // and its struct-max timestamp are deterministic on any cluster.
    "q288_peak_concurrency" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("s0", secs(col("ts")))
        .withColumn("e0", col("s0") + lit(60L) + col("event_id") % 540)
      val pts = ev.select(col("event_type"), col("s0").as("t"),
          lit(1L).as("delta"), col("event_id"))
        .unionByName(ev.select(col("event_type"), col("e0").as("t"),
          lit(-1L).as("delta"), col("event_id")))
      val c = CoreOps.rangePrefixSums(pts, Seq("event_type"),
        Seq(col("t"), col("delta"), col("event_id")), Seq("delta"))
      c.groupBy(col("event_type"))
        .agg(sum(when(col("delta") === 1L, 1L).otherwise(0L))
          .as("n_intervals"),
          max(struct(col("delta_cum"), col("t"))).as("pk"))
        .select(col("event_type"), col("n_intervals"),
          col("pk.delta_cum").as("peak_concurrency"),
          col("pk.t").as("peak_at_s"))
        .orderBy(col("event_type"))
    }))

  val oracles: Map[String, String] = Map(

    "q180_fuzzy_er" ->
      """WITH r AS (
        |  SELECT doc_id, lang, split_part(text, ' ', 1) AS tok,
        |         length(text) // 20 AS lb, substr(text, 1, 40) AS pre
        |  FROM documents),
        |k AS (SELECT lang, tok, lb FROM r GROUP BY 1, 2, 3 HAVING count(*) <= 100),
        |c AS (SELECT r.* FROM r JOIN k USING (lang, tok, lb)),
        |p AS (
        |  SELECT a.lang, levenshtein(a.pre, b.pre) AS dist
        |  FROM c a JOIN c b
        |    ON a.lang = b.lang AND a.tok = b.tok AND a.lb = b.lb
        |   AND a.doc_id < b.doc_id
        |  WHERE levenshtein(a.pre, b.pre) <= 10)
        |SELECT lang, count(*) AS n_pairs, CAST(sum(dist) AS BIGINT) AS sum_dist
        |FROM p GROUP BY lang ORDER BY lang""".stripMargin,

    // Survivors replayed via rank-1 windows; struct-max and (ORDER BY ts
    // DESC, event_id DESC) pick identical rows because event_id is unique.
    "q256_survivorship" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS v_cents, props
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rl,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY v_cents DESC, event_id DESC) AS rb
        |  FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  min(ts) AS first_ts,
        |  max(CASE WHEN rl = 1 THEN event_type END) AS last_event_type,
        |  max(CASE WHEN rb = 1 THEN props END) AS best_props,
        |  CAST(sum(v_cents) AS BIGINT) AS total_cents
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q181_interval_coalesce" ->
      """WITH iv AS (
        |  SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS s0,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 + 60 + event_id % 540 AS e0
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, s0, e0,
        |    CASE WHEN max(e0) OVER w IS NULL OR s0 > max(e0) OVER w
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM iv
        |  WINDOW w AS (PARTITION BY user_id ORDER BY s0, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |g AS (
        |  SELECT user_id, s0, e0,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY s0, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
        |  FROM m),
        |isl AS (
        |  SELECT user_id, island_id, min(s0) AS i_s, max(e0) AS i_e, count(*) AS n_iv
        |  FROM g GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_islands,
        |  CAST(sum(i_e - i_s) AS BIGINT) AS covered_secs,
        |  CAST(max(i_e - i_s) AS BIGINT) AS max_island_secs,
        |  CAST(sum(n_iv) AS BIGINT) AS n_intervals
        |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q182_time_weighted" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS s0,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |h AS (
        |  SELECT user_id, v,
        |    lead(s0) OVER (PARTITION BY user_id ORDER BY s0, event_id) - s0 AS held
        |  FROM e)
        |SELECT user_id,
        |  CAST(sum(v * held) AS BIGINT) AS weighted_sum_units,
        |  CAST(sum(held) AS BIGINT) AS held_secs
        |FROM h WHERE held IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q186_dup_shingle_frac" ->
      s"""WITH ${DedupQueries.shingleCtes(3, extraCols = " lang,")},
         |e AS (SELECT doc_id, lang, unnest(hs) AS h FROM h),
         |c AS (SELECT h, count(*) AS nd FROM e GROUP BY h),
         |pd AS (
         |  SELECT doc_id, any_value(lang) AS lang, count(*) AS n_sh,
         |    sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS n_dup
         |  FROM e JOIN c USING (h) GROUP BY doc_id)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_sh) AS BIGINT) AS n_shingles,
         |  CAST(sum(n_dup) AS BIGINT) AS n_dup_shingles,
         |  CAST(sum(CASE WHEN n_dup * 2 > n_sh THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_docs_majority_dup
         |FROM pd GROUP BY lang ORDER BY lang""".stripMargin,

    "q183_skyline" ->
      """WITH oc AS (SELECT o_custkey, count(*) AS n_ord FROM orders GROUP BY 1),
        |c AS (
        |  SELECT c_mktsegment, CAST(round(c_acctbal * 100) AS BIGINT) AS x,
        |         COALESCE(n_ord, 0) AS y
        |  FROM customer LEFT JOIN oc ON c_custkey = o_custkey),
        |pts AS (SELECT c_mktsegment, x, y, count(*) AS n_points FROM c GROUP BY 1, 2, 3),
        |f AS (
        |  SELECT c_mktsegment, x, y, n_points,
        |    max(y) OVER (PARTITION BY c_mktsegment ORDER BY x DESC, y DESC
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM pts)
        |SELECT c_mktsegment, x AS acctbal_cents, y AS n_orders, n_points
        |FROM f WHERE pm IS NULL OR pm < y
        |ORDER BY c_mktsegment, acctbal_cents, n_orders""".stripMargin,

    // The oracle's global row_number window IS the thing rangeRank
    // replaces at scale; both produce the identical total order because
    // the sort key ends in the unique p_partkey.
    "q277_sorted_neighborhood" ->
      """WITH rk AS (
        |  SELECT p_partkey, p_name,
        |    row_number() OVER (ORDER BY p_name, p_partkey) AS rk
        |  FROM part),
        |cand AS (
        |  SELECT o.off, levenshtein(a.p_name, b.p_name) AS dist
        |  FROM rk a
        |  CROSS JOIN (SELECT unnest(range(1, 4)) AS off) o
        |  JOIN rk b ON b.rk = a.rk + o.off)
        |SELECT off, CAST(count(*) AS BIGINT) AS n_candidates,
        |  CAST(sum(CASE WHEN dist <= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_matches,
        |  CAST(sum(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_exact,
        |  CAST(sum(dist) AS BIGINT) AS sum_dist
        |FROM cand GROUP BY off ORDER BY off""".stripMargin,

    // Oracle sweep: the partitioned window cumsum IS what
    // rangePrefixSums replaces at scale; same (t, delta, event_id)
    // total order, peak time = max t among max-cum rows (struct-max
    // semantics).
    "q288_peak_concurrency" ->
      """WITH iv AS (
        |  SELECT event_type, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS s0,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 + 60 + event_id % 540
        |      AS e0
        |  FROM events),
        |pts AS (
        |  SELECT event_type, s0 AS t, CAST(1 AS BIGINT) AS delta, event_id
        |  FROM iv
        |  UNION ALL
        |  SELECT event_type, e0, CAST(-1 AS BIGINT), event_id FROM iv),
        |c AS (
        |  SELECT event_type, t, delta,
        |    CAST(sum(delta) OVER (PARTITION BY event_type
        |      ORDER BY t, delta, event_id ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum
        |  FROM pts),
        |p AS (SELECT event_type, max(cum) AS peak FROM c GROUP BY 1),
        |pa AS (
        |  SELECT c.event_type, max(t) AS peak_at_s
        |  FROM c JOIN p ON c.event_type = p.event_type AND c.cum = p.peak
        |  GROUP BY 1),
        |ni AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals
        |       FROM iv GROUP BY 1)
        |SELECT event_type, n_intervals,
        |  CAST(peak AS BIGINT) AS peak_concurrency, peak_at_s
        |FROM ni JOIN p USING (event_type) JOIN pa USING (event_type)
        |ORDER BY event_type""".stripMargin)
}
