package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{CoreOps, EntityResolution, Intervals}
import graft.similarity.Similarity
import graft.text.TextOps

/** Data-governance operators: expectation suites (dbt-test shape),
  * privacy audits (k-anonymity, l-diversity), vocabulary-growth and
  * optimizer-statistics profiling. Split out of CurationQueries along
  * the family seam (VERDICT r7 item 6).
  */
object GovernanceQueries {

  import CoreOps.cents

  /** Two-sided-geometric (discrete Laplace) inverse-CDF for ε = 0.5,
    * α = e^−ε: thresholds are floor(CDF·(2^31−1)) precomputed as exact
    * integers, tails clamped to ±8. Shared verbatim by the Spark plan
    * and the DuckDB oracle. The MECHANISM is the real ε-DP count release
    * (sensitivity-1 count + discrete Laplace); the randomness source
    * here is a deterministic keyed hash so the oracle can gate it —
    * production swaps in a crypto draw per release, nothing else moves.
    */
  private val dpNoiseThresholds: Seq[(Long, Int)] = Seq(
    24482903L -> -8, 40365483L -> -7, 66551431L -> -6, 109724760L -> -5,
    180905546L -> -4, 298262823L -> -3, 491752260L -> -2, 810762412L -> -1,
    1336721234L -> 0, 1655731386L -> 1, 1849220823L -> 2, 1966578100L -> 3,
    2037758886L -> 4, 2080932215L -> 5, 2107118163L -> 6, 2123000743L -> 7)

  private def dpNoiseSql(u: String): String =
    "CASE " + dpNoiseThresholds
      .map { case (t, v) => s"WHEN $u < $t THEN $v" }
      .mkString(" ") + " ELSE 8 END"

  /** Cross-engine-stable 31-bit hash of the released key (built-in
    * string hashes differ between engines, so the key reduces to
    * integers first — first-char code and length, then the Knuth
    * multiplicative mix).
    */
  private val dpHashSql: String =
    "(CAST(ascii(substr(event_type, 1, 1)) * 31 + length(event_type)" +
      " AS BIGINT) * 2654435761) % 2147483647"

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

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


    // Right-to-be-forgotten cascade: a deterministic deletion-request set
    // (user_id ≡ 0 mod 37) tombstones through Compaction.merge (the same
    // keyed MERGE the lifecycle family ships), the derived serving rollup
    // rebuilds from the merged fact, and the audit DEMANDS zero orphans
    // in both — the compliance report a deletion pipeline must emit, not
    // just the delete. The request set is a bounded artifact (deletion
    // requests are small by nature), so both orphan probes are broadcast
    // semi-joins and the fact table never shuffles.
    "q274_forget_user" -> ((s, dir) => {
      import graft.pipeline.Compaction
      val ev = Tables.load(s, dir, "events").select(col("event_id"),
        col("user_id"), cents(col("value")).as("vc"))
      val tomb = ev.filter(col("user_id") % 37 === 0)
        .withColumn("del", lit(true))
      val after = Compaction.merge(ev, tomb, Seq("event_id"),
        deleteCol = Some("del")).localCheckpoint()
      val reqUsers = ev.filter(col("user_id") % 37 === 0)
        .select(col("user_id")).distinct()
      val rollup = after.groupBy(col("user_id")).agg(sum(col("vc")).as("t"))
      ev.agg(count(lit(1)).as("n_events_before"))
        .crossJoin(after.agg(count(lit(1)).as("n_events_after")))
        .crossJoin(reqUsers.agg(count(lit(1)).as("n_users_requested")))
        .crossJoin(after.join(broadcast(reqUsers), Seq("user_id"), "left_semi")
          .agg(count(lit(1)).as("n_orphan_events")))
        .crossJoin(rollup.join(broadcast(reqUsers), Seq("user_id"), "left_semi")
          .agg(count(lit(1)).as("n_orphan_rollup")))
        .withColumn("n_events_deleted",
          col("n_events_before") - col("n_events_after"))
    }),


    // ε-DP count release over the per-type event counts: sensitivity-1
    // counts + discrete-Laplace noise via the integer-threshold inverse
    // CDF in [[dpNoiseSql]]. The aggregate is one partial-aggregable
    // groupBy; the noise is a per-GROUP scalar (|event_type| rows), so
    // the release costs nothing at any scale — the DP accounting
    // (ε, the noise mechanism, the release columns) is the operator,
    // not the arithmetic.
    "q280_dp_noisy_counts" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(col("event_type")).agg(count(lit(1)).as("true_count"))
        .withColumn("u", expr(dpHashSql))
        .withColumn("noise", expr(dpNoiseSql("u")).cast("long"))
        .select(col("event_type"), col("true_count"), col("noise"),
          (col("true_count") + col("noise")).as("released_count"),
          lit(0.5).as("epsilon"))
        .orderBy(col("event_type"))
    }),


    // Bounded-contribution capping — the prerequisite every user-level DP
    // aggregate (and abuse-resistant metric) shares: cap each user at
    // their FIRST k=10 events (time order, event_id tie-break, so the
    // kept set is deterministic on any cluster), then report the metric
    // distortion the cap introduces per event_type. The cap is one
    // per-user window (partitioned — parallel in users, bounded by the
    // per-user event count); the uncapped side is a scan-only partial
    // agg. kept_bp is the audit number: how much signal the privacy
    // bound costs.
    "q284_contribution_cap" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val k = 10
      val e = Tables.load(s, dir, "events").select(col("user_id"),
        col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"),
        cents(col("value")).as("vc"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val capped = e.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
      val full = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("vc")).as("sum_cents"))
      val cap = capped.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_capped"),
          sum(col("vc")).as("sum_capped_cents"))
      full.join(cap, "event_type")
        .withColumn("kept_bp", expr("(10000 * n_capped) div n_events"))
        .orderBy(col("event_type"))
    }),


    // Join-key skew report — the pre-flight the salted-join family
    // (q47/q79) assumes someone ran: per candidate key column, exact
    // cardinality, hottest-key mass, count of hot keys (> 4× the mean,
    // cross-multiplied in DECIMAL — c·n_keys is data²-sized), and the
    // salt factor that would level the hottest reducer at P = 32
    // (⌈max_cnt / (n/P)⌉, exact ceil-div). One groupBy per column plus
    // a broadcast of the 1-row totals; nothing data-sized crosses the
    // wire twice.
    "q290_skew_report" -> ((s, dir) => {
      val P = 32L
      val dec = (c: Column) => c.cast("decimal(19,0)")
      def audit(df: DataFrame, keyCol: String, name: String): DataFrame = {
        val counts = df.groupBy(col(keyCol).as("k"))
          .agg(count(lit(1)).as("c")).localCheckpoint()
        val tot = counts.agg(sum(col("c")).as("n_rows"),
          count(lit(1)).as("n_keys"), max(col("c")).as("max_cnt"))
        counts.crossJoin(broadcast(tot))
          .agg(min(col("n_rows")).as("n_rows"),
            min(col("n_keys")).as("n_keys"),
            min(col("max_cnt")).as("max_cnt"),
            sum(when(dec(col("c")) * dec(col("n_keys")) >
              dec(col("n_rows")) * lit(4L).cast("decimal(19,0)"), 1L)
              .otherwise(0L)).as("n_hot_keys"))
          .select(lit(name).as("key_name"), col("n_rows"), col("n_keys"),
            col("max_cnt"),
            expr("(1000000 * max_cnt) div n_rows").as("top1_ppm"),
            col("n_hot_keys"),
            expr(s"(max_cnt * $P + n_rows - 1) div n_rows").as("salt_factor"))
      }
      audit(Tables.load(s, dir, "events"), "user_id", "events.user_id")
        .unionByName(audit(Tables.load(s, dir, "lineitem"), "l_partkey",
          "lineitem.l_partkey"))
        .orderBy(col("key_name"))
    }),


    // t-closeness (Li et al., ICDE 2007) — the third leg of the privacy
    // triad after k-anonymity (q198) and l-diversity (q212): a
    // quasi-identifier group leaks when its SENSITIVE-attribute
    // distribution sits far from the global one, measured for an
    // ORDERED attribute by the Earth-Mover's Distance = mean |CDF gap|
    // over the bins. Exact: per (segment, decile) counts + the
    // broadcast global histogram; the CDF gap |cum_g·N − cum_glob·n_g|
    // clears denominators entirely (DECIMAL — the product is
    // data²-sized), one ppm division at the end, per-segment cumsums
    // over a 10-row window (bin-bounded, the q239 class). Flag at
    // t = 0.2 (200000 ppm).
    "q294_t_closeness" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dec = (c: Column) => c.cast("decimal(19,0)")
      val c = Tables.load(s, dir, "customer")
        .select(col("c_mktsegment").as("seg"),
          cents(col("c_acctbal")).as("bal"))
      val mm = c.agg(min(col("bal")).as("lo"), max(col("bal")).as("hi"))
      val binned = c.join(broadcast(mm))
        .withColumn("decile",
          least(lit(9L), expr("((bal - lo) * 10) div (hi - lo + 1)")))
      val grp = binned.groupBy(col("seg"), col("decile"))
        .agg(count(lit(1)).as("cnt"))
      val glob = binned.groupBy(col("decile"))
        .agg(count(lit(1)).as("gcnt")).localCheckpoint()
      val nGlob = glob.agg(sum(col("gcnt"))).head().getLong(0)
      // dense bin grid so zero-count bins still carry their CDF gap
      val grid = grp.select(col("seg")).distinct()
        .withColumn("decile", explode(expr(
          "sequence(CAST(0 AS BIGINT), CAST(9 AS BIGINT))")))
      val w = Window.partitionBy(col("seg")).orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cums = grid.join(grp, Seq("seg", "decile"), "left")
        .join(broadcast(glob), Seq("decile"), "left")
        .withColumn("cum_g", sum(coalesce(col("cnt"), lit(0L))).over(w))
        .withColumn("cum_glob", sum(coalesce(col("gcnt"), lit(0L))).over(w))
      val tot = grp.groupBy(col("seg")).agg(sum(col("cnt")).as("n_g"))
      cums.join(broadcast(tot), "seg")
        .filter(col("decile") < 9) // CDF gap at the last bin is 0 by def
        .groupBy(col("seg"))
        .agg(min(col("n_g")).as("n"),
          sum(abs(dec(col("cum_g")) * lit(nGlob)
            - dec(col("cum_glob")) * dec(col("n_g")))).as("gap_sum"))
        .select(col("seg"), col("n"),
          // IntegralDivide on DECIMAL = BIGINT with floor-on-nonneg
          // (pinned by OverflowBoundsSpec) — decimal `/` would round at
          // its result scale before any cast could truncate
          call_function("div", col("gap_sum") * lit(1000000L),
            dec(lit(9L)) * dec(col("n")) * lit(nGlob)).as("emd_ppm"))
        .withColumn("t_violation", col("emd_ppm") > 200000L)
        .orderBy(col("seg"))
    }),

  )

  val oracles: Map[String, String] = Map(

    "q280_dp_noisy_counts" ->
      s"""WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS true_count
         |           FROM events GROUP BY 1),
         |u AS (SELECT c.*, $dpHashSql AS u FROM c)
         |SELECT event_type, true_count,
         |  CAST(${dpNoiseSql("u")} AS BIGINT) AS noise,
         |  true_count + CAST(${dpNoiseSql("u")} AS BIGINT) AS released_count,
         |  CAST(0.5 AS DOUBLE) AS epsilon
         |FROM u ORDER BY event_type""".stripMargin,

    "q284_contribution_cap" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY us, event_id) AS rn FROM e),
        |fa AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(vc) AS BIGINT) AS sum_cents
        |  FROM e GROUP BY 1),
        |cap AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_capped,
        |    CAST(sum(vc) AS BIGINT) AS sum_capped_cents
        |  FROM r WHERE rn <= 10 GROUP BY 1)
        |SELECT event_type, n_events, sum_cents, n_capped, sum_capped_cents,
        |  (10000 * n_capped) // n_events AS kept_bp
        |FROM fa JOIN cap USING (event_type) ORDER BY event_type""".stripMargin,

    "q290_skew_report" ->
      """WITH eu AS (SELECT user_id AS k, count(*) AS c
        |            FROM events GROUP BY 1),
        |et AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
        |         CAST(count(*) AS BIGINT) AS n_keys,
        |         CAST(max(c) AS BIGINT) AS max_cnt FROM eu),
        |ea AS (
        |  SELECT 'events.user_id' AS key_name, et.n_rows, et.n_keys,
        |    et.max_cnt,
        |    (1000000 * et.max_cnt) // et.n_rows AS top1_ppm,
        |    (SELECT CAST(sum(CASE WHEN CAST(c AS HUGEINT) * et2.n_keys
        |        > CAST(et2.n_rows AS HUGEINT) * 4 THEN 1 ELSE 0 END)
        |        AS BIGINT)
        |     FROM eu, et et2) AS n_hot_keys,
        |    (et.max_cnt * 32 + et.n_rows - 1) // et.n_rows AS salt_factor
        |  FROM et),
        |lu AS (SELECT l_partkey AS k, count(*) AS c
        |       FROM lineitem GROUP BY 1),
        |lt AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
        |         CAST(count(*) AS BIGINT) AS n_keys,
        |         CAST(max(c) AS BIGINT) AS max_cnt FROM lu),
        |la AS (
        |  SELECT 'lineitem.l_partkey' AS key_name, lt.n_rows, lt.n_keys,
        |    lt.max_cnt,
        |    (1000000 * lt.max_cnt) // lt.n_rows AS top1_ppm,
        |    (SELECT CAST(sum(CASE WHEN CAST(c AS HUGEINT) * lt2.n_keys
        |        > CAST(lt2.n_rows AS HUGEINT) * 4 THEN 1 ELSE 0 END)
        |        AS BIGINT)
        |     FROM lu, lt lt2) AS n_hot_keys,
        |    (lt.max_cnt * 32 + lt.n_rows - 1) // lt.n_rows AS salt_factor
        |  FROM lt)
        |SELECT * FROM ea UNION ALL SELECT * FROM la
        |ORDER BY key_name""".stripMargin,

    "q294_t_closeness" ->
      """WITH c AS (SELECT c_mktsegment AS seg,
        |             CAST(round(c_acctbal * 100) AS BIGINT) AS bal
        |           FROM customer),
        |mm AS (SELECT min(bal) AS lo, max(bal) AS hi FROM c),
        |b AS (SELECT seg, least(9, ((bal - lo) * 10) // (hi - lo + 1))
        |        AS decile FROM c, mm),
        |grp AS (SELECT seg, decile, CAST(count(*) AS BIGINT) AS cnt
        |        FROM b GROUP BY 1, 2),
        |gl AS (SELECT decile, CAST(count(*) AS BIGINT) AS gcnt
        |       FROM b GROUP BY 1),
        |ng AS (SELECT CAST(sum(gcnt) AS BIGINT) AS n_glob FROM gl),
        |grid AS (
        |  SELECT s.seg, d.decile
        |  FROM (SELECT DISTINCT seg FROM grp) s
        |  CROSS JOIN (SELECT unnest(range(0, 10)) AS decile) d),
        |cums AS (
        |  SELECT grid.seg, grid.decile,
        |    sum(COALESCE(cnt, 0)) OVER (PARTITION BY grid.seg
        |      ORDER BY grid.decile ROWS UNBOUNDED PRECEDING) AS cum_g,
        |    sum(COALESCE(gcnt, 0)) OVER (PARTITION BY grid.seg
        |      ORDER BY grid.decile ROWS UNBOUNDED PRECEDING) AS cum_glob
        |  FROM grid
        |  LEFT JOIN grp ON grid.seg = grp.seg AND grid.decile = grp.decile
        |  LEFT JOIN gl ON grid.decile = gl.decile),
        |tot AS (SELECT seg, CAST(sum(cnt) AS BIGINT) AS n_g
        |        FROM grp GROUP BY 1),
        |agg AS (
        |  SELECT cums.seg, min(n_g) AS n, min(n_glob) AS n_glob,
        |    sum(abs(CAST(cum_g AS HUGEINT) * n_glob
        |            - CAST(cum_glob AS HUGEINT) * n_g)) AS gap_sum
        |  FROM cums JOIN tot USING (seg) CROSS JOIN ng
        |  WHERE decile < 9 GROUP BY 1)
        |SELECT seg, CAST(n AS BIGINT) AS n,
        |  CAST((gap_sum * 1000000)
        |    // (9 * CAST(n AS HUGEINT) * n_glob) AS BIGINT) AS emd_ppm,
        |  (gap_sum * 1000000) // (9 * CAST(n AS HUGEINT) * n_glob)
        |    > 200000 AS t_violation
        |FROM agg ORDER BY seg""".stripMargin,

    "q274_forget_user" ->
      """WITH ev AS (SELECT event_id, user_id FROM events),
        |req AS (SELECT DISTINCT user_id FROM ev WHERE user_id % 37 = 0),
        |aft AS (SELECT * FROM ev WHERE user_id % 37 <> 0)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM ev) AS n_events_before,
        |  (SELECT CAST(count(*) AS BIGINT) FROM aft) AS n_events_after,
        |  (SELECT CAST(count(*) AS BIGINT) FROM req) AS n_users_requested,
        |  (SELECT CAST(count(*) AS BIGINT) FROM aft JOIN req USING (user_id))
        |    AS n_orphan_events,
        |  (SELECT CAST(count(*) AS BIGINT)
        |   FROM (SELECT DISTINCT user_id FROM aft) r JOIN req USING (user_id))
        |    AS n_orphan_rollup,
        |  (SELECT CAST(count(*) AS BIGINT) FROM ev)
        |    - (SELECT CAST(count(*) AS BIGINT) FROM aft) AS n_events_deleted""".stripMargin,

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

  )
}
