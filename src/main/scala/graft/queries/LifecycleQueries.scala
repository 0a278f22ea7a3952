package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.TreeOps
import graft.ops.CoreOps
import graft.pipeline.Compaction

/** Table-lifecycle operators under the gate: landing-zone compaction (the
  * MERGE/Delta-shaped gap — re-crawl re-lands updates next to originals)
  * and recursive comment-tree flatten (depth + root attribution).
  */
object LifecycleQueries {

  /** Events flattened to JSON-safe exact types (see StreamQueries). */
  private def eventsFlat(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").select(
      col("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      col("event_type"),
      round(col("value") * 100, 0).cast("long").as("value_cents"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Change-data-feed between two MANIFEST VERSIONS: v1 = the customer
    // snapshot, v2 = a full MERGE result (updates %3, deletes %7,
    // inserts %11) published as a REWRITE under its own data dir — the
    // manifest records absolute file lists, so versions can point at
    // different rewrites and both stay readable (immutable files +
    // immutable version dirs). CDF = time-travel both versions + keyed
    // full-outer diff: exactly Delta's table_changes, over plain
    // directories. The oracle derives added/removed/changed straight
    // from the key arithmetic.
    "q156_cdf" -> ((s, dir) => {
      import graft.sources.DataSkipping
      val base = Tables.load(s, dir, "customer").select(
        col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100, 0).cast("long").as("bal_cents"))
      val changes =
        base.filter(col("k") % 3 === 0 && col("k") % 7 =!= 0)
          .withColumn("bal_cents", col("bal_cents") + 100)
          .withColumn("del", lit(false))
        .unionByName(base.filter(col("k") % 7 === 0)
          .withColumn("del", lit(true)))
        .unionByName(base.filter(col("k") % 11 === 0)
          .withColumn("k", col("k") + 10000000L)
          .withColumn("del", lit(false)))
      val merged = Compaction.merge(base, changes, Seq("k"),
        deleteCol = Some("del"))
      val d1 = Files.createTempDirectory("graft_cdf_v1_").toString
      val d2 = Files.createTempDirectory("graft_cdf_v2_").toString
      val mdir = d1 + "_manifest"
      base.write.mode("overwrite").parquet(d1)
      val v1 = DataSkipping.publishManifest(s, d1, mdir, "k")
      merged.write.mode("overwrite").parquet(d2)
      val v2 = DataSkipping.publishManifest(s, d2, mdir, "k")
      Compaction.tableDiff(
          DataSkipping.readTableAsOf(s, mdir, v1),
          DataSkipping.readTableAsOf(s, mdir, v2),
          Seq("k"), Seq("seg", "bal_cents"))
        .groupBy(col("change"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("change"))
    }),
    // Snapshot reconciliation: the row-level diff a compaction/backfill
    // job runs before swapping a snapshot in — removals (%5), additions
    // (the 3000-3100 band), value changes (%7), everything else silent.
    "q87_table_diff" -> ((s, dir) => {
      val flat = eventsFlat(s, dir)
        .select(col("event_id"), col("event_type"), col("value_cents"))
      val before = flat.filter(col("event_id") < 3000)
      val after = flat
        .filter((col("event_id") < 3000 && col("event_id") % 5 =!= 0) ||
          (col("event_id") >= 3000 && col("event_id") < 3100))
        .withColumn("value_cents",
          when(col("event_id") % 7 === 0, col("value_cents") + 1)
            .otherwise(col("value_cents")))
      Compaction.tableDiff(before, after, Seq("event_id"),
          Seq("event_type", "value_cents"))
        .orderBy(col("event_id"))
    }),

    // Landing zone = original events + a re-crawl batch that re-lands every
    // third event one hour later with a bumped engagement value
    // (`reddit/lambda_function_aggregate.py:59-71`). Compaction must keep
    // exactly the newest version per event_id, partitioned by event_type.
    "q69_compact_snapshot" -> ((s, dir) => {
      val flat = eventsFlat(s, dir)
      val recrawl = flat.filter(col("event_id") % 3 === 0)
        .withColumn("ts_us", col("ts_us") + expr("3600000000"))
        .withColumn("value_cents", col("value_cents") + 1)
      // Landing zone is input fixture (built once per sf dir); the
      // compaction run + snapshot write is the operator under test.
      val landing = FixtureCache.dir("q69_landing", dir) { d =>
        flat.write.mode("overwrite").parquet(d)
        recrawl.write.mode("append").parquet(d)
      }
      val snapshot = Files.createTempDirectory("graft_compact_out_").toString
      Compaction.compactLatestWins(s, landing, snapshot,
          keys = Seq("event_id"), order = Seq(col("ts_us")),
          partitionCols = Seq("event_type"))
        .select(col("event_id"), col("ts_us"), col("event_type"),
          col("value_cents"))
        .orderBy(col("event_id"))
    }),

    // Compaction ↔ data-skipping integration: compacting the landing zone
    // rewrites the file layout, so the skipping manifest MUST be rebuilt
    // with it (a stale one lists dead files). compactWithManifest swaps
    // the rebuilt manifest in atomically after the snapshot write; the
    // pruned range read over the compacted table must then be exact.
    "q102_compact_manifest" -> ((s, dir) => {
      val flat = eventsFlat(s, dir)
      val recrawl = flat.filter(col("event_id") % 3 === 0)
        .withColumn("ts_us", col("ts_us") + expr("3600000000"))
        .withColumn("value_cents", col("value_cents") + 1)
      val landing = FixtureCache.dir("q69_landing", dir) { d =>
        flat.write.mode("overwrite").parquet(d)
        recrawl.write.mode("append").parquet(d)
      }
      val snapshot = Files.createTempDirectory("graft_cm_snap_").toString
      val manifestDir = snapshot + "_manifest"
      graft.pipeline.Compaction.compactWithManifest(s, landing, snapshot,
        manifestDir, keys = Seq("event_id"), order = Seq(col("ts_us")),
        statCol = "event_id")
      graft.sources.DataSkipping.prunedRead(s, snapshot,
          graft.sources.DataSkipping.readManifest(s, manifestDir),
          "event_id", 1000L, 2000L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value_cents")).as("sum_cents"))
        .orderBy(col("event_type"))
    }),

    // TIME TRAVEL over the manifest snapshot log: publish v1 over the
    // initial landing, append a late batch, publish v2 — then read the
    // table AS OF v1 (exactly the files v1 lists; immutable version dirs
    // + immutable data files make an old manifest an old snapshot) and
    // AS OF v2 side by side. The Delta/Iceberg `VERSION AS OF` protocol
    // over plain directories; retention = the publish prune's grace
    // window. The as-of read must NOT see the late batch.
    "q145_time_travel" -> ((s, dir) => {
      import graft.sources.DataSkipping
      val flat = eventsFlat(s, dir)
      val early = flat.filter(col("event_id") % 3 =!= 0)
      val late = flat.filter(col("event_id") % 3 === 0)
      val data = Files.createTempDirectory("graft_tt_data_").toString
      val manifestDir = data + "_manifest"
      early.write.mode("overwrite").parquet(data)
      val v1 = DataSkipping.publishManifest(s, data, manifestDir, "event_id")
      late.write.mode("append").parquet(data)
      val v2 = DataSkipping.publishManifest(s, data, manifestDir, "event_id")
      def agg(state: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n"), sum(col("value_cents")).as("sum_cents"))
          .select(lit(state).as("state"), col("n"), col("sum_cents"))
      agg("v1", DataSkipping.readTableAsOf(s, manifestDir, v1))
        .unionAll(agg("v2", DataSkipping.readTableAsOf(s, manifestDir, v2)))
        .orderBy(col("state"))
    }),

    // MERGE INTO semantics over plain DataFrames: a change batch carrying
    // updates (%3, bal+100), deletes (%7) and inserts (%11, shifted keys)
    // merged into the customer snapshot in one keyed shuffle — the
    // Delta-shaped answer to the reference's 2-day re-crawl.
    "q91_merge_upsert" -> ((s, dir) => {
      val base = Tables.load(s, dir, "customer").select(
        col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100, 0).cast("long").as("bal_cents"))
      val changes =
        base.filter(col("k") % 3 === 0 && col("k") % 7 =!= 0)
          .withColumn("bal_cents", col("bal_cents") + 100)
          .withColumn("del", lit(false))
        .unionByName(base.filter(col("k") % 7 === 0)
          .withColumn("del", lit(true)))
        .unionByName(base.filter(col("k") % 11 === 0)
          .withColumn("k", col("k") + 10000000L)
          .withColumn("del", lit(false)))
      Compaction.merge(base, changes, Seq("k"), deleteCol = Some("del"))
        .orderBy(col("k"))
    }),

    // Incremental view maintenance: the per-key (sum, n) snapshot is built
    // from the first third of events, then two change batches fold in via
    // partial-sum merge — history is never re-scanned. Oracle = the full
    // recompute, which must agree exactly (integer cents).
    "q97_incr_agg" -> ((s, dir) => {
      import graft.pipeline.Incremental
      val ev = Tables.load(s, dir, "events").select(
        (col("user_id") % 25).as("k"),
        CoreOps.cents(col("value")).as("val_cents"),
        lit(1L).as("n"),
        col("event_id"))
      def slice(lo: Column, hi: Column) =
        ev.filter(col("event_id") % 3 >= lo && col("event_id") % 3 < hi)
          .drop("event_id")
      val keys = Seq("k")
      val sums = Seq("val_cents", "n")
      val snap0 = slice(lit(0), lit(1))
        .groupBy(col("k"))
        .agg(sum(col("val_cents")).as("val_cents"), sum(col("n")).as("n"))
      val snap1 = Incremental.mergeAggregate(snap0, slice(lit(1), lit(2)), keys, sums)
      val snap2 = Incremental.mergeAggregate(snap1, slice(lit(2), lit(3)), keys, sums)
      snap2.orderBy(col("k"))
    }),

    // Incremental JOIN-view maintenance with deltas on BOTH sides:
    // orders ≡ 7 mod 10 and customers ≡ 3 mod 20 arrive as tonight's
    // batch; the refreshed view = old view ∪ the three IVM delta terms
    // (history never joins history — its only touch is a Bloom-pruned
    // probe against the new dim keys). The gate proves the algebra
    // reconstitutes the full join bit-for-bit: oracle = plain join over
    // the full tables.
    "q120_delta_join" -> ((s, dir) => {
      import graft.pipeline.Incremental
      val fact = Tables.load(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        CoreOps.cents(col("o_totalprice")).as("price_cents"))
      val dim = Tables.load(s, dir, "customer").select(
        col("c_custkey"), col("c_mktsegment"))
      val factDelta = fact.filter(col("o_orderkey") % 10 === 7)
      val factOld = fact.filter(col("o_orderkey") % 10 =!= 7)
      val dimDelta = dim.filter(col("c_custkey") % 20 === 3)
      val dimOld = dim.filter(col("c_custkey") % 20 =!= 3)
      val oldView = factOld.join(dimOld,
        factOld("o_custkey") === dimOld("c_custkey"))
      val refreshed = oldView.unionByName(
        Incremental.deltaJoin(factOld, factDelta, dimOld, dimDelta,
          "o_custkey", "c_custkey", expectedDimDelta = 10000L))
      refreshed.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("sum_cents"))
        .orderBy(col("c_mktsegment"))
    }),

    // Compaction ⊕ Z-order ⊕ manifest in ONE rewrite (the real table-
    // maintenance unit): a 40-file dirty landing zone is rewritten into
    // ~targetBytes files Z-clustered on (event_id, user_id), the skipping
    // manifest is rebuilt from the files just written and swapped in
    // atomically, and the pruned range read over the re-clustered table
    // must be exact vs plain SQL over the source rows.
    "q129_compact_cluster" -> ((s, dir) => {
      import graft.sources.{DataSkipping, Layout}
      val dirty = FixtureCache.dir("q129_dirty", dir) { d =>
        Tables.load(s, dir, "events").select(
            col("event_id"), col("user_id"),
            col("event_type"),
            round(col("value") * 100, 0).cast("long").as("value_cents"))
          .repartition(40, col("event_id"))
          .write.mode("overwrite").parquet(d)
      }
      val out = Files.createTempDirectory("graft_q129_out_").toString + "/t"
      val manifest = out + "_manifest"
      Layout.compactClustered(s, dirty, out, targetBytes = 256 * 1024,
        aCol = "event_id", bCol = "user_id", bits = 8,
        manifestDir = manifest, statCol = "event_id")
      DataSkipping.prunedRead(s, out, DataSkipping.readManifest(s, manifest),
          "event_id", 1000L, 2000L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value_cents")).as("sum_cents"))
        .orderBy(col("event_type"))
    }),

    // Schema evolution ON READ: the landing zone's schema grows a column
    // mid-history (the reference's crawler-inferred schemas do exactly
    // this as scrape fields appear, `terraform/main.tf:301-319`), so half
    // the files are v1 (no value_cents) and half v2. `mergeSchema` must
    // union the file schemas, null-fill v1 rows, and keep both
    // generations queryable in one scan — no rewrite of old files.
    "q136_schema_evolution" -> ((s, dir) => {
      val landing = FixtureCache.dir("q136_landing", dir) { d =>
        val ev = Tables.load(s, dir, "events")
        ev.filter(col("event_id") % 2 === 0)
          .select(col("event_id"), col("event_type"))
          .write.mode("overwrite").parquet(d)
        ev.filter(col("event_id") % 2 === 1)
          .select(col("event_id"), col("event_type"),
            round(col("value") * 100, 0).cast("long").as("value_cents"))
          .write.mode("append").parquet(d)
      }
      s.read.option("mergeSchema", "true").parquet(landing)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value_cents").isNull, 1L).otherwise(0L)).as("n_v1"),
          coalesce(sum(col("value_cents")), lit(0L)).as("sum_cents_v2"))
        .orderBy(col("event_type"))
    }),

    // Comment-tree flatten: a deterministic forest over documents (roots
    // doc_id < 3, parent = (doc_id-1) div 2), resolved to (root, depth) by
    // pointer doubling — O(log depth) joins, vs the recursive CTE the
    // oracle runs.
    "q70_tree_flatten" -> ((s, dir) => {
      val nodes = Tables.load(s, dir, "documents").select(
        col("doc_id").as("id"),
        when(col("doc_id") < 3, lit(null).cast("long"))
          .otherwise(expr("(doc_id - 1) div 2")).as("parent"))
      TreeOps.treeFlatten(nodes, "id", "parent")
        .orderBy(col("id"))
    }))

  val oracles: Map[String, String] = Map(
    // CDF classes from the change-set arithmetic: %7 keys vanish
    // (removed), %3∧¬%7 keys get +100 balance (changed), %11 keys
    // reappear shifted (added). An update to an identical value would
    // not be a change — +100 always differs, so every class is exact.
    "q156_cdf" ->
      """WITH base AS (SELECT c_custkey AS k FROM customer),
        |cls AS (
        |  SELECT k, CASE WHEN k % 7 = 0 THEN 'removed'
        |                 WHEN k % 3 = 0 THEN 'changed' END AS change
        |  FROM base
        |  UNION ALL
        |  SELECT k + 10000000, 'added' FROM base WHERE k % 11 = 0)
        |SELECT change, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM cls WHERE change IS NOT NULL
        |GROUP BY change ORDER BY change""".stripMargin,
    "q136_schema_evolution" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_v1,
        |  CAST(COALESCE(sum(CASE WHEN event_id % 2 = 1
        |    THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS sum_cents_v2
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q129_compact_cluster" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events WHERE event_id BETWEEN 1000 AND 2000
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q102_compact_manifest" ->
      """WITH latest AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT)
        |      + CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS value_cents
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value_cents) AS BIGINT) AS sum_cents
        |FROM latest WHERE event_id BETWEEN 1000 AND 2000
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // v1 = the pre-append snapshot (event_id % 3 != 0 only); v2 = all
    // rows. The oracle replays both table states from the source.
    "q145_time_travel" ->
      """WITH flat AS (
        |  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS value_cents
        |  FROM events)
        |SELECT 'v1' AS state, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value_cents) AS BIGINT) AS sum_cents
        |FROM flat WHERE event_id % 3 <> 0
        |UNION ALL
        |SELECT 'v2' AS state, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(value_cents) AS BIGINT) AS sum_cents
        |FROM flat
        |ORDER BY state""".stripMargin,

    "q120_delta_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q97_incr_agg" ->
      """SELECT user_id % 25 AS k,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS val_cents,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY user_id % 25 ORDER BY k""".stripMargin,

    "q87_table_diff" ->
      """WITH flat AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS value_cents
        |  FROM events),
        |b AS (SELECT * FROM flat WHERE event_id < 3000),
        |a AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_id % 7 = 0 THEN value_cents + 1
        |         ELSE value_cents END AS value_cents
        |  FROM flat
        |  WHERE (event_id < 3000 AND event_id % 5 <> 0)
        |     OR (event_id >= 3000 AND event_id < 3100))
        |SELECT event_id, change FROM (
        |  SELECT COALESCE(b.event_id, a.event_id) AS event_id,
        |    CASE WHEN b.event_id IS NULL THEN 'added'
        |         WHEN a.event_id IS NULL THEN 'removed'
        |         WHEN b.value_cents IS DISTINCT FROM a.value_cents
        |           OR b.event_type IS DISTINCT FROM a.event_type THEN 'changed'
        |    END AS change
        |  FROM b FULL OUTER JOIN a ON b.event_id = a.event_id)
        |WHERE change IS NOT NULL ORDER BY event_id""".stripMargin,

    "q69_compact_snapshot" ->
      """SELECT event_id,
        |  epoch_us(CAST(ts AS TIMESTAMP))
        |    + CASE WHEN event_id % 3 = 0 THEN 3600000000 ELSE 0 END AS ts_us,
        |  event_type,
        |  CAST(round(value * 100) AS BIGINT)
        |    + CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS value_cents
        |FROM events ORDER BY event_id""".stripMargin,

    "q91_merge_upsert" ->
      """WITH base AS (
        |  SELECT c_custkey AS k, c_mktsegment AS seg,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer),
        |changes AS (
        |  SELECT k, seg, bal_cents + 100 AS bal_cents, FALSE AS del
        |  FROM base WHERE k % 3 = 0 AND k % 7 <> 0
        |  UNION ALL
        |  SELECT k, seg, bal_cents, TRUE AS del FROM base WHERE k % 7 = 0
        |  UNION ALL
        |  SELECT k + 10000000, seg, bal_cents, FALSE AS del
        |  FROM base WHERE k % 11 = 0)
        |SELECT k, seg, bal_cents FROM (
        |  SELECT b.k, b.seg, b.bal_cents FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.k = b.k)
        |  UNION ALL
        |  SELECT k, seg, bal_cents FROM changes WHERE NOT del)
        |ORDER BY k""".stripMargin,

    // Anchors mirror TreeOps.treeFlatten's documented DANGLING-parent
    // semantics (scraped forests hold comments whose parent never
    // landed): a node whose parent id is absent from the corpus settles
    // at root_id = the missing ancestor's id with depth 1, instead of
    // silently vanishing as a roots-only recursion would make it. The
    // sf0.1 fixture's id space is closed so the second anchor is empty
    // there; the sf1.0 replicated id space exercises it for real (the
    // 10x leg caught exactly this divergence).
    "q70_tree_flatten" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id AS id, doc_id AS root_id, CAST(0 AS BIGINT) AS depth
        |  FROM documents WHERE doc_id < 3
        |  UNION ALL
        |  SELECT doc_id, (doc_id - 1) // 2 AS root_id, CAST(1 AS BIGINT) AS depth
        |  FROM documents d
        |  WHERE doc_id >= 3 AND NOT EXISTS (
        |    SELECT 1 FROM documents p WHERE p.doc_id = (d.doc_id - 1) // 2)
        |  UNION ALL
        |  SELECT d.doc_id, t.root_id, t.depth + 1
        |  FROM documents d JOIN t ON (d.doc_id - 1) // 2 = t.id
        |  WHERE d.doc_id >= 3)
        |SELECT id, root_id, depth FROM t ORDER BY id""".stripMargin)
}
