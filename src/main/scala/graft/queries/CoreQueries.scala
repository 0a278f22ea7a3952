package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.CoreOps

/** Wave 1 — core relational operator queries (SURVEY.md §2.1-§2.9), each
  * paired with an ANSI-SQL DuckDB oracle over the same parquet tables.
  *
  * Determinism rules applied throughout (so a hash compare against a
  * single-threaded oracle is exact at any parallelism):
  *  - money/double sums go through [[CoreOps.cents]] — integer cents, since
  *    long addition is associative and double addition is not;
  *  - averages are derived from exact sums with one final double division;
  *  - every query ends in an explicit ORDER BY present in both dialects
  *    (Spark asc = nulls first, so the SQL says NULLS FIRST);
  *  - event-time comparisons are done at microsecond truncation on both
  *    sides (`events.ts` is parquet NANOS; Spark stores micros).
  */
object CoreQueries {

  private def cents(c: org.apache.spark.sql.Column) = CoreOps.cents(c)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A4 pricing rollup (TPC-H Q1 shape): hash agg with partial map-side agg,
    // one shuffle on the two low-cardinality keys.
    "q01_pricing_rollup" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("count_order"),
          sum(cents(col("l_quantity"))).as("sum_qty_cents"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_cents"))
        .withColumn("avg_qty",
          col("sum_qty_cents").cast("double") / lit(100.0) / col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // F1 range filter + global agg (TPC-H Q6 shape): predicate reaches the
    // parquet scan (row-group min/max skipping on l_shipdate).
    "q02_filter_revenue" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(
          coalesce(sum(cents(col("l_extendedprice") * col("l_discount"))), lit(0L)).as("revenue_cents"),
          count(lit(1)).as("n"))
    }),

    // §2.6/§2.7 top-k per group: partial top-k before the shuffle.
    "q03_topk_per_group" -> ((s, dir) => {
      CoreOps.topKPerGroup(Tables.load(s, dir, "orders"),
          Seq("o_orderpriority"), Seq(col("o_totalprice"), col("o_orderkey")), 3)
        .select(col("o_orderpriority"), col("rk"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rk"))
    }),

    // A2/J5 latest-wins dedup: one hash exchange on the key, no join.
    "q04_latest_wins" -> ((s, dir) => {
      CoreOps.latestWins(Tables.load(s, dir, "events"),
          Seq("user_id"), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_id"), col("value"))
        .orderBy(col("user_id"))
    }),

    // J2 FK join chain + agg: customer ⋈ orders ⋈ lineitem, AQE picks the
    // join strategy per side at runtime.
    "q05_segment_revenue" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_cents"))
        .orderBy(col("c_mktsegment"))
    }),

    // J3 star join with explicitly broadcast fixed-size dims (region=5,
    // nation=25 — constant at any SF, always broadcastable).
    "q06_region_revenue" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
      val sup = Tables.load(s, dir, "supplier")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      l.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_cents"),
          count(lit(1)).as("n"))
        .orderBy(col("r_name"))
    }),

    // §2.8 anti join (J2-orphans shape): customers with no 1998 order.
    "q07_no_orders" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1998-01-01 00:00:00")))
      c.join(o.select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    // §2.8 semi join: customers with at least one big order, per nation.
    "q08_big_spenders" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      val n = Tables.load(s, dir, "nation")
      c.join(o.select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_semi")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
        .orderBy(col("n_name"))
    }),

    // §2.6 lag/delta window: engagement-delta semantics of the reference's
    // 2-day re-crawl (SURVEY.md §2.6), one shuffle on user_id.
    "q09_value_delta" -> ((s, dir) => {
      val withDelta = CoreOps.lagDelta(Tables.load(s, dir, "events"),
        Seq("user_id"), Seq(col("ts"), col("event_id")), col("value"), "delta")
      withDelta.groupBy(col("user_id"))
        .agg(count(col("delta")).as("n_deltas"),
          sum(cents(col("delta"))).as("sum_delta_cents"))
        .orderBy(col("user_id"))
    }),

    // §2.10-batch sessionization: 30-min gap sessions, two window passes over
    // one user_id-partitioned sort (no self-join).
    "q10_sessions" -> ((s, dir) => {
      CoreOps.sessionize(Tables.load(s, dir, "events"), "user_id", "ts", 1800L)
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // §2.10 tumbling window as a batch bucket agg (15-min micro-batch cadence
    // of the reference re-expressed as epoch arithmetic).
    "q11_tumbling_agg" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(CoreOps.tumblingBucket(col("ts"), 900L).as("bucket_start"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_cents"))
        .orderBy(col("bucket_start"), col("event_type"))
    }),

    // A1/S8 max-by / top-1 per key (latest file discovery semantics) — the
    // partial-aggregable variant: map-side combine, no per-key sort.
    "q12_latest_per_type" -> ((s, dir) => {
      CoreOps.latestWinsAgg(Tables.load(s, dir, "events"),
          Seq("event_type"), Seq(col("ts"), col("event_id")))
        .select(col("event_type"), col("event_id"))
        .orderBy(col("event_type"))
    }),

    // A4 hierarchy rollup (topic × day analog): grouping-set aggregation.
    "q13_rollup_agg" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_price_cents"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    }),

    // A6 exact distinct (node-dedup semantics of Cypher MERGE).
    "q14_distinct_per_flag" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // §2.9 scalar-function matrix: casts, string ops, date formatting,
    // modular arithmetic — all codegen'd, no UDFs.
    "q15_scalar_suite" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") <= 500)
        .select(
          col("o_orderkey"),
          upper(col("o_orderpriority")).as("up"),
          substring(col("o_orderpriority"), 1, 3).as("sub"),
          length(col("o_orderpriority")).as("len"),
          concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("cat"),
          regexp_replace(col("o_orderpriority"), "[0-9]-", "").as("pr"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
          year(col("o_orderdate")).cast("long").as("yr"),
          (col("o_orderkey") % 7).as("k7"))
        .orderBy(col("o_orderkey"))
    }),

    // §2.9 JSON extraction (props payload → typed column).
    "q16_json_extract" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .filter(col("event_id") < 200)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("event_id"))
    }),

    // §2.8 union + distinct (multi-file union semantics of S6).
    "q17_union_distinct" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
      e.filter(col("event_type") === "view").select(col("user_id"))
        .unionByName(e.filter(col("event_type") === "click").select(col("user_id")))
        .distinct()
        .agg(count(lit(1)).as("n"))
    }),

    // J4 fan-out: explode tokens (mention fan-out shape) → top-20 by count.
    "q18_explode_tokens" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20)
    }),

    // §2.6 SLIDING window aggregation (window(ts, 1d, 6h)): each event
    // lands in exactly 4 overlapping windows — the rolling-24h dashboard
    // rollup. Spark generates the window replication map-side (one
    // Expand, no self-join); the oracle replays the k=0..3 replication
    // arithmetically.
    "q233_sliding_window" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 day", "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_cents"))
        .select(unix_seconds(col("window.start")).as("w_start"),
          col("event_type"), col("n"), col("sum_value_cents"))
        .orderBy(col("w_start"), col("event_type"))
    }),

    // §2.6/§2.10 NATIVE session windows (session_window(ts, 30 min)) —
    // the built-in merging-window operator, distinct from q10's
    // lag/cumsum formulation at the exact-gap boundary: an event landing
    // exactly gap after its predecessor starts a NEW session here
    // (window end is exclusive), where q10's `> gap` merges it. Summary
    // per user: session count, events, and the largest session.
    "q234_session_window" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_ev"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), sum(col("n_ev")).as("n_events"),
          max(col("n_ev")).as("max_session_events"))
        .orderBy(col("user_id"))
    }),

    // §2.6 NTile: per-user value deciles within event_type (the quota/
    // tier assignment window) — decile populations and value mass. One
    // partitioned window (bounded per-type sorts), then a hash rollup.
    "q231_ntile_deciles" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("x"), col("user_id"))
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(cents(col("value"))).as("x"))
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy(col("event_type"), col("decile"))
        .agg(count(lit(1)).as("n_users"), sum(col("x")).as("sum_x"))
        .orderBy(col("event_type"), col("decile"))
    }),

    // §2.5 PIVOT: event_type × day-of-week count matrix via Spark's
    // relational pivot (compiles to one hash aggregate with a CASE per
    // pivot value — no per-column shuffle); oracle is the equivalent
    // conditional aggregation.
    "q232_pivot_dow" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .select(col("event_type"),
          expr("(unix_micros(ts) div 86400000000 + 4) % 7").as("dow"))
        .groupBy(col("event_type"))
        .pivot("dow", Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("event_type"), col("0").as("d0"), col("1").as("d1"),
          col("2").as("d2"), col("3").as("d3"), col("4").as("d4"),
          col("5").as("d5"), col("6").as("d6"))
        .orderBy(col("event_type"))
    }))

  // DuckDB oracle SQL. `CAST(ts AS TIMESTAMP)` truncates the parquet NANOS
  // column to micros = exactly what Spark stores; cents sums are cast back
  // from DuckDB's HUGEINT to BIGINT to match Spark's LongType.
  private val C = "CAST(round(%s * 100) AS BIGINT)"
  private def cSum(x: String) = s"CAST(sum(${C.format(x)}) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    "q01_pricing_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, count_order, sum_qty_cents, sum_base_cents, sum_disc_cents,
         |  CAST(sum_qty_cents AS DOUBLE) / 100.0 / count_order AS avg_qty
         |FROM (
         |  SELECT l_returnflag, l_linestatus, count(*) AS count_order,
         |    ${cSum("l_quantity")} AS sum_qty_cents,
         |    ${cSum("l_extendedprice")} AS sum_base_cents,
         |    ${cSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_cents
         |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |  GROUP BY l_returnflag, l_linestatus)
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_revenue" ->
      s"""SELECT coalesce(${cSum("l_extendedprice * l_discount")}, 0) AS revenue_cents, count(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q03_topk_per_group" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey DESC) AS INT) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,

    "q04_latest_wins" ->
      """SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q05_segment_revenue" ->
      s"""SELECT c_mktsegment, count(*) AS n,
         |  ${cSum("l_extendedprice * (1.0 - l_discount)")} AS revenue_cents
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q06_region_revenue" ->
      s"""SELECT r_name, ${cSum("l_extendedprice * (1.0 - l_discount)")} AS revenue_cents, count(*) AS n
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q07_no_orders" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q08_big_spenders" ->
      """SELECT n_name, count(*) AS n FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q09_value_delta" ->
      """SELECT user_id, count(delta) AS n_deltas,
        |  CAST(sum(CAST(round(delta * 100) AS BIGINT)) AS BIGINT) AS sum_delta_cents
        |FROM (
        |  SELECT user_id, value - lag(value) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS delta
        |  FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q10_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS secs FROM events),
        |m AS (
        |  SELECT user_id,
        |    CASE WHEN secs - lag(secs) OVER (PARTITION BY user_id ORDER BY secs, event_id) IS NULL
        |           OR secs - lag(secs) OVER (PARTITION BY user_id ORDER BY secs, event_id) > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM e)
        |SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q11_tumbling_agg" ->
      s"""SELECT secs - secs % 900 AS bucket_start, event_type, count(*) AS n,
         |  ${cSum("value")} AS sum_value_cents
         |FROM (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS secs, event_type, value FROM events)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q12_latest_per_type" ->
      """SELECT event_type, event_id FROM (
        |  SELECT event_type, event_id,
        |    row_number() OVER (PARTITION BY event_type ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "q13_rollup_agg" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n, ${cSum("o_totalprice")} AS sum_price_cents
         |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q14_distinct_per_flag" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q15_scalar_suite" ->
      """SELECT o_orderkey, upper(o_orderpriority) AS up, substr(o_orderpriority, 1, 3) AS sub,
        |  CAST(length(o_orderpriority) AS INT) AS len,
        |  concat_ws('-', o_orderstatus, o_orderpriority) AS cat,
        |  regexp_replace(o_orderpriority, '[0-9]-', '', 'g') AS pr,
        |  strftime(o_orderdate, '%Y-%m-%d') AS od,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  o_orderkey % 7 AS k7
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin,

    "q16_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin,

    "q17_union_distinct" ->
      """SELECT count(*) AS n FROM (
        |  SELECT DISTINCT user_id FROM (
        |    SELECT user_id FROM events WHERE event_type = 'view'
        |    UNION ALL
        |    SELECT user_id FROM events WHERE event_type = 'click'))""".stripMargin,

    "q18_explode_tokens" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> '' GROUP BY token
        |ORDER BY cnt DESC, token LIMIT 20""".stripMargin,

    "q233_sliding_window" ->
      s"""WITH e AS (
         |  SELECT event_type, ${C.format("value")} AS v_c,
         |    (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 21600) * 21600 AS base
         |  FROM events),
         |w AS (
         |  SELECT event_type, v_c, base - k * 21600 AS w_start
         |  FROM e, LATERAL (SELECT unnest(range(0, 4)) AS k) r)
         |SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(v_c) AS BIGINT) AS sum_value_cents
         |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q234_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |m AS (
        |  SELECT user_id, us, event_id,
        |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
        |           OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) >= 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM e),
        |g AS (
        |  SELECT user_id,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM m),
        |per AS (SELECT user_id, grp, count(*) AS n_ev FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(n_ev) AS BIGINT) AS n_events,
        |  CAST(max(n_ev) AS BIGINT) AS max_session_events
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,

    "q231_ntile_deciles" ->
      s"""WITH u AS (
         |  SELECT event_type, user_id, ${cSum("value")} AS x
         |  FROM events GROUP BY 1, 2),
         |d AS (
         |  SELECT event_type, x,
         |    CAST(ntile(10) OVER (PARTITION BY event_type
         |      ORDER BY x, user_id) AS BIGINT) AS decile
         |  FROM u)
         |SELECT event_type, decile, CAST(count(*) AS BIGINT) AS n_users,
         |  CAST(sum(x) AS BIGINT) AS sum_x
         |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q232_pivot_dow" ->
      """WITH e AS (
        |  SELECT event_type,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7 AS dow
        |  FROM events)
        |SELECT event_type,
        |  CAST(sum(CASE WHEN dow = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d0,
        |  CAST(sum(CASE WHEN dow = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        |  CAST(sum(CASE WHEN dow = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
        |  CAST(sum(CASE WHEN dow = 3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
        |  CAST(sum(CASE WHEN dow = 4 THEN 1 ELSE 0 END) AS BIGINT) AS d4,
        |  CAST(sum(CASE WHEN dow = 5 THEN 1 ELSE 0 END) AS BIGINT) AS d5,
        |  CAST(sum(CASE WHEN dow = 6 THEN 1 ELSE 0 END) AS BIGINT) AS d6
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin)
}
