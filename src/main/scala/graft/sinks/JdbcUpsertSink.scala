package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

/** K3 external-sink pattern: idempotent batched upsert from executors into
  * a JDBC store via `foreachPartition`.
  *
  * The reference loads its graph serving layer with per-row Cypher MERGE
  * from a Glue driver loop (`glue/reddit_glue.py:112-125`) — one session,
  * one row at a time. The distributed re-expression: each partition opens
  * ONE connection, streams its rows through a prepared MERGE statement in
  * batches, and commits per batch. MERGE-on-key makes the writer
  * idempotent, which is what makes it safe under Spark's task-retry model:
  * a task that dies mid-partition (even after committing some batches) is
  * re-run from the start and re-MERGEs the same rows into the same final
  * state — exactly-once per KEY on top of at-least-once task execution.
  *
  * The SQL dialect here is Derby's (`MERGE ... USING SYSIBM.SYSDUMMY1`),
  * the embedded store available in-sandbox; the shape (connection per
  * partition, prepared batch, commit cadence, key-merge idempotency) is
  * the part that transfers to Neo4j/Postgres/anything with an upsert verb.
  *
  * At scale: writer parallelism = partition count, so `repartition(n,
  * keys)` upstream both sizes the connection pool the store sees and
  * makes each key land in exactly one task — no cross-task write races on
  * a key, and deterministic final state even for non-idempotent value
  * functions.
  */
object JdbcUpsertSink {

  /** Upsert `df` into `table` (must exist) at `url`, merging on `keyCols`.
    * Executes on the executors; the driver ships only the SQL string.
    */
  def upsert(df: DataFrame, url: String, table: String, keyCols: Seq[String],
             batchSize: Int = 500,
             strictCounts: Option[Boolean] = None): Unit = {
    val cols = df.columns.toSeq
    require(keyCols.nonEmpty && keyCols.forall(cols.contains),
      s"keyCols $keyCols must be a subset of ${cols.mkString(",")}")
    val sql = mergeSql(table, cols, keyCols)
    val strict = strictCountsFor(url, strictCounts)
    df.foreachPartition { (rows: Iterator[Row]) =>
      writePartition(rows, url, sql, cols, keyCols, batchSize,
        strictCounts = Some(strict))
    }
  }

  /** SHARDED upsert: the serving store split across `nShards` independent
    * stores with a DETERMINISTIC key→shard map — the scale shape for a
    * store whose single node would otherwise bound the whole sink (the
    * q72/sf10 finding: one embedded engine serializes every writer through
    * the per-database monitor, and the readback is one connection).
    *
    * shard = pmod(xxhash64(keyCols…), nShards): a pure function of the KEY,
    * so the same key lands in the same store across batches, task retries,
    * and stream restarts — re-MERGEs stay idempotent per key and no key
    * ever exists in two stores. Rows are placed by an EXACT shard→partition
    * map (partition id = shard id) rather than `repartition(n, $"__shard")`:
    * hash(shard) mod n can collide two shards into one task (halving writer
    * parallelism there) and leave another task idle — correctness held
    * either way (runs are grouped), but "one writer task per store" was
    * not guaranteed (ADVICE r16).
    *
    * `urlForShard` maps shard id → JDBC URL; it ships to executors, so it
    * must close over plain data (e.g. an IndexedSeq of URLs). Writer
    * parallelism and store parallelism are both `nShards`: at 100 TB this
    * is "one store per key range" — shards scale horizontally with the
    * keyspace while each store sees a single ordered writer.
    *
    * `verifyManifest = true` makes each writer task check the target
    * store's [[manifestTable]] row ((shard_id, n_shards), stamped by
    * [[writeShardManifest]]) before writing and REFUSE a mismatch: the
    * key→shard map is a pure function of (key, nShards), so silently
    * writing a store set that was laid out for a different N would strand
    * keys across stores. Migrate with [[reshard]] instead.
    */
  def upsertSharded(df: DataFrame, nShards: Int, urlForShard: Int => String,
                    table: String, keyCols: Seq[String],
                    batchSize: Int = 500,
                    strictCounts: Option[Boolean] = None,
                    verifyManifest: Boolean = false): Unit = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val cols = df.columns.toSeq
    require(keyCols.nonEmpty && keyCols.forall(cols.contains),
      s"keyCols $keyCols must be a subset of ${cols.mkString(",")}")
    require(!cols.contains("__shard"), "__shard is reserved by upsertSharded")
    val sql = mergeSql(table, cols, keyCols)
    // __shard is appended LAST so writePartition's positional binding over
    // `cols` (indices 0 until cols.size) is untouched by the extra field.
    val shardIdx = cols.size
    partitionByShard(df.select(cols.map(col) :+
        pmod(xxhash64(keyCols.map(col): _*), lit(nShards.toLong))
          .cast("int").as("__shard"): _*), nShards, shardIdx)
      .foreachPartition { (rows: Iterator[Row]) =>
        // run-split loop kept as belt-and-braces: with the exact
        // partitioner each partition holds a single shard, so the outer
        // while executes at most once per non-empty partition
        val it = rows.buffered
        while (it.hasNext) {
          val sh = it.head.getInt(shardIdx)
          val url = urlForShard(sh)
          if (verifyManifest) checkShardManifest(url, sh, nShards)
          val run: Iterator[Row] = new Iterator[Row] {
            def hasNext: Boolean =
              it.hasNext && it.head.getInt(shardIdx) == sh
            def next(): Row = it.next()
          }
          writePartition(run, url, sql, cols, keyCols, batchSize,
            strictCounts = strictCounts)
        }
      }
  }

  /** partition id = shard id, exactly (the 1:1 writer-per-store map). */
  private[sinks] class ExactShardPartitioner(n: Int)
      extends org.apache.spark.Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = key.asInstanceOf[Int]
  }

  /** Rows keyed by the shard column at `shardIdx`, placed so partition i
    * holds exactly shard i. Factored out of [[upsertSharded]] so the spec
    * can pin the 1:1 guarantee directly.
    */
  private[graft] def partitionByShard(withShard: DataFrame, nShards: Int,
                                      shardIdx: Int)
      : org.apache.spark.rdd.RDD[Row] =
    withShard.rdd
      .map(r => (r.getInt(shardIdx), r))
      .partitionBy(new ExactShardPartitioner(nShards))
      .map(_._2)

  /** Per-store layout manifest: one row (shard_id, n_shards) stamped into
    * every store of a sharded set. The guard that makes a PERSISTENT
    * sharded store safe: the key→shard map is pure in (key, N), so a
    * writer configured with the wrong N must refuse loudly rather than
    * strand keys (see [[upsertSharded]]'s `verifyManifest` and
    * [[reshard]]).
    */
  val manifestTable = "GRAFT_SHARD_MANIFEST"

  /** Stamp (i, urls.size) into each store, replacing any previous row. */
  def writeShardManifest(urls: IndexedSeq[String]): Unit =
    urls.zipWithIndex.foreach { case (url, i) =>
      val conn = DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try st.executeUpdate(
          s"CREATE TABLE $manifestTable (shard_id INT, n_shards INT)")
        catch { case _: java.sql.SQLException => () } // exists — keep it
        st.executeUpdate(s"DELETE FROM $manifestTable"): Unit
        st.executeUpdate(s"INSERT INTO $manifestTable VALUES ($i, ${urls.size})"): Unit
        st.close()
      } finally conn.close()
    }

  /** Refuse a store whose stamped layout differs from the addressed one. */
  def checkShardManifest(url: String, shardId: Int, nShards: Int): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs =
        try conn.createStatement()
          .executeQuery(s"SELECT shard_id, n_shards FROM $manifestTable")
        catch { case e: java.sql.SQLException =>
          throw new IllegalStateException(
            s"no shard manifest at $url — stamp the store set with " +
              "writeShardManifest before verifyManifest writes", e)
        }
      if (!rs.next()) throw new IllegalStateException(
        s"empty shard manifest at $url — re-stamp with writeShardManifest")
      val (sid, n) = (rs.getInt(1), rs.getInt(2))
      if (sid != shardId || n != nShards)
        throw new IllegalStateException(
          s"shard manifest mismatch at $url: store is shard $sid of $n but " +
            s"this write addresses it as shard $shardId of $nShards — a " +
            "changed shard count strands keys; migrate with reshard()")
    } finally conn.close()
  }

  /** Union-of-shards readback: one JDBC scan per store. */
  def readSharded(spark: SparkSession, urls: Seq[String], table: String,
                  driver: String = "org.apache.derby.jdbc.EmbeddedDriver")
      : DataFrame =
    urls.map { url =>
      spark.read.format("jdbc")
        .option("url", url)
        .option("driver", driver)
        .option("dbtable", table).load()
    }.reduce(_ unionAll _)

  /** Re-shard a persistent sharded store set: read the union of the old
    * stores, re-derive shard = pmod(xxhash64(key), newUrls.size), MERGE
    * into the new stores (which must already hold `table`), and stamp the
    * new manifests. The migration path for a store set that outgrows its
    * N — without it a shard-count change silently strands keys, because
    * the shard map moves keys whenever N changes. Idempotent: re-running
    * re-MERGEs the same rows into the same stores. Returns the migrated
    * row count.
    *
    * `cols` realigns the readback (stores return their canonical
    * identifier case — Derby: upper) to the original column names/order,
    * so the key hash and MERGE binding see exactly what the first write
    * saw.
    */
  def reshard(spark: SparkSession, oldUrls: IndexedSeq[String],
              newUrls: IndexedSeq[String], table: String, cols: Seq[String],
              keyCols: Seq[String], batchSize: Int = 500): Long = {
    val back = readSharded(spark, oldUrls, table)
    val aligned = back.select(cols.map(c =>
      col(back.columns.find(_.equalsIgnoreCase(c)).getOrElse(c)).as(c)): _*)
    val n = aligned.count()
    upsertSharded(aligned, newUrls.size, newUrls(_), table, keyCols, batchSize)
    writeShardManifest(newUrls)
    n
  }

  /** Whether the zero-update-count check applies. "A key-MERGE affects
    * exactly one row" is DERBY's observed contract (the silent row-loss
    * race the check repairs is a Derby embedded-engine bug); other stores
    * legitimately report 0 for no-op updates (e.g. MySQL's
    * `INSERT … ON DUPLICATE KEY` with unchanged values, conditional-
    * update rewrites), where treating 0 as loss would retry forever and
    * then fail an honest batch. So: explicit override wins, else strict
    * exactly on Derby URLs.
    */
  def strictCountsFor(url: String, overrideOpt: Option[Boolean]): Boolean =
    overrideOpt.getOrElse(url.toLowerCase(java.util.Locale.ROOT)
      .startsWith("jdbc:derby:"))

  /** Embedded Derby gets ONE writer at a time per database. Every observed
    * manifestation of its concurrent-MERGE generated-code/latch race —
    * `baseCC`/`_rowMakingMethod` NPEs, the page-latch deadlock the
    * statement timeout converts, silent row loss (zero update count), and
    * a DUPLICATE base row surviving past the PRIMARY KEY (seen at sf0.1:
    * the race dropped the index entry but kept the base row, so the
    * silent-loss repair's re-MERGE probed NOT MATCHED through the index
    * and re-inserted — two identical physical rows, one key) — shares one
    * trigger: two connections executing MERGE into one embedded engine at
    * once. So for `jdbc:derby:` URLs the execute+commit window serializes
    * on a JVM-wide per-URL monitor; binding and connection setup stay
    * parallel. Real stores (the design target, where parallel writers are
    * the point) take no lock.
    */
  private val derbyExecLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  /** Lock key = the DATABASE, not the URL string: lowercase and strip the
    * `;attribute` tail, so `jdbc:derby:db` and `jdbc:derby:db;create=true`
    * (or case variants) — the same embedded engine — share one monitor.
    * Keying on the verbatim URL reintroduced the concurrent-MERGE race
    * through aliased URLs (r11 ADVICE).
    */
  private[graft] def derbyLockKey(url: String): String = {
    val lower = url.toLowerCase(java.util.Locale.ROOT)
    val semi = lower.indexOf(';')
    if (semi >= 0) lower.substring(0, semi) else lower
  }
  private def execLockFor(url: String): Option[Object] =
    if (url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:derby:"))
      Some(derbyExecLocks.computeIfAbsent(derbyLockKey(url), _ => new Object))
    else None

  /** Derby upsert: merge against the one-row dummy table with the key in
    * the ON clause — the standard Derby per-row MERGE idiom. Binding order:
    * ON keys, UPDATE non-keys, INSERT all columns.
    */
  def mergeSql(table: String, cols: Seq[String], keyCols: Seq[String]): String = {
    val nonKeys = cols.filterNot(keyCols.contains)
    val on = keyCols.map(k => s"t.$k = ?").mkString(" AND ")
    val matched =
      if (nonKeys.isEmpty) ""
      else s"WHEN MATCHED THEN UPDATE SET ${nonKeys.map(c => s"$c = ?").mkString(", ")} "
    val insert = s"WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 ON ($on) $matched$insert"
  }

  /** One partition's write: one connection, prepared batched MERGE,
    * commit per batch. Public (not just `foreachPartition`-internal) so the
    * retry spec can replay a partition exactly as a re-scheduled task
    * would. Re-running this on the same rows is a no-op by construction.
    *
    * Each batch gets a BOUNDED in-writer retry on a FRESH connection
    * (rollback → close → reconnect → re-prepare → re-bind): the MERGE is
    * idempotent per key, so replaying a batch after a transient store
    * error converges to the same state — and in `local` mode Spark does
    * not retry tasks at all (spark.task.maxFailures=1), so a transient
    * store hiccup (observed: Derby's generated-code races under
    * concurrent MERGE — `_rowMakingMethod`/`baseCC` NPEs — which poison
    * the CONNECTION, not just the statement) would otherwise kill the
    * job. When retries exhaust, the FIRST failure propagates as the
    * primary with every later attempt's error attached as suppressed —
    * neither the original cause nor a later, different failure is lost.
    */
  def writePartition(rows: Iterator[Row], url: String, sql: String,
                     cols: Seq[String], keyCols: Seq[String],
                     batchSize: Int, maxBatchRetries: Int = 2,
                     strictCounts: Option[Boolean] = None): Unit = {
    if (!rows.hasNext) return
    val strict = strictCountsFor(url, strictCounts)
    val nonKeys = cols.filterNot(keyCols.contains)
    val keyIdx = keyCols.map(cols.indexOf)
    val nonKeyIdx = nonKeys.map(cols.indexOf)
    var conn = DriverManager.getConnection(url)
    var stmt: java.sql.PreparedStatement = null
    var primary: Throwable = null
    try {
      // inside the try: a bad table/SQL must not leak the connection
      conn.setAutoCommit(false)
      stmt = conn.prepareStatement(sql)
      // Statement timeout: concurrent MERGE tasks into embedded Derby can
      // PAGE-LATCH deadlock (observed live: a task parked forever in
      // BasePage.setExclusive — latch waits are exempt from Derby's lock
      // deadlock detector, so nothing ever aborts). The timeout converts
      // the stuck state into a SQLException the bounded fresh-connection
      // retry absorbs; 60 s is far above any honest batch.
      stmt.setQueryTimeout(60)
      def flush(batch: Seq[Row]): Unit = {
        var attempt = 0
        var first: Throwable = null
        var done = false
        while (!done) {
          try {
            batch.foreach { r =>
              var p = 1
              keyIdx.foreach { i => stmt.setObject(p, r.get(i)); p += 1 }
              nonKeyIdx.foreach { i => stmt.setObject(p, r.get(i)); p += 1 }
              cols.indices.foreach { i => stmt.setObject(p, r.get(i)); p += 1 }
              stmt.addBatch()
            }
            // Derby only: the whole execute → count-check → commit window
            // runs under the per-database monitor (see [[execLockFor]]);
            // other stores run it lock-free.
            def executeCheckCommit(): Unit = {
              val counts = stmt.executeBatch()
            // A key-MERGE logically affects exactly one row, so a zero
            // (or EXECUTE_FAILED) count is a row the store dropped
            // WITHOUT raising — observed once under Derby's concurrent-
            // MERGE generated-code race: keys vanished from a committed
            // batch with no exception anywhere. Turn silent loss into a
            // store failure so the bounded retry (idempotent re-MERGE on
            // a fresh connection) repairs it. SUCCESS_NO_INFO (-2) is a
            // legitimate batch-mode answer and is accepted. With NO
            // non-key columns the MERGE has no UPDATE clause, so a
            // matched (already-present) key legitimately reports 0 —
            // the check only applies when every row must touch one row,
            // and only on stores where 0 means loss (see
            // [[strictCountsFor]]); EXECUTE_FAILED is a failure on every
            // store.
              val bad = counts.indexWhere(c =>
                (c == 0 && nonKeys.nonEmpty && strict) ||
                  c == java.sql.Statement.EXECUTE_FAILED)
              if (bad >= 0)
                throw new java.sql.SQLException(
                  s"MERGE batch row $bad reported update count ${counts(bad)}" +
                    " — store dropped the row without raising; retrying batch")
              conn.commit()
            }
            execLockFor(url) match {
              case Some(l) => l.synchronized(executeCheckCommit())
              case None => executeCheckCommit()
            }
            done = true
          } catch {
            // SQLException is the JDBC contract, but Derby's generated-
            // code races can surface as RAW RuntimeExceptions (NPEs) too —
            // both are store-side failures the bounded retry must absorb.
            case e @ (_: java.sql.SQLException | _: RuntimeException) =>
              // First failure = primary; later attempts' errors (often
              // follow-on noise like "Container has been closed", but
              // possibly a real, different failure) ride as suppressed.
              if (first == null) first = e else first.addSuppressed(e)
              if (attempt >= maxBatchRetries) throw first
              attempt += 1
              // The store race can poison the whole connection, so the
              // retry rebuilds it from scratch. Cleanup swallows ANY
              // exception (a poisoned Derby connection throws raw NPEs
              // from rollback/close too, not just SQLExceptions — letting
              // one escape here would abort the retry and lose `first`).
              try conn.rollback() catch { case _: Exception => () }
              try stmt.close() catch { case _: Exception => () }
              try conn.close() catch { case _: Exception => () }
              try {
                conn = DriverManager.getConnection(url)
                conn.setAutoCommit(false)
                stmt = conn.prepareStatement(sql)
                stmt.setQueryTimeout(60)
              } catch { case p: Exception =>
                first.addSuppressed(p); throw first }
              Thread.sleep(50L * attempt)
          }
        }
      }
      try {
        val buf = new scala.collection.mutable.ArrayBuffer[Row](batchSize)
        rows.foreach { r =>
          buf += r
          if (buf.size == batchSize) { flush(buf.toSeq); buf.clear() }
        }
        if (buf.nonEmpty) flush(buf.toSeq)
      } finally {
        // guarded: a close-time error on a poisoned connection must not
        // replace the in-flight primary exception (the outer finally's
        // rollback+close still runs either way)
        try stmt.close() catch { case _: Exception => () }
      }
    } catch { case t: Throwable => primary = t; throw t
    } finally {
      // If the write died mid-batch the transaction is still open, and
      // Derby refuses to close such a connection — the close-time error
      // would then MASK the primary failure (seen live as "Cannot close a
      // connection while a transaction is still active" hiding the real
      // lock/constraint error from the task log). On the error path only:
      // roll back (freeing the locks so the retried task's idempotent
      // re-MERGE proceeds) and swallow any close-time error so the
      // primary exception is the one that propagates. The happy path
      // stays a plain close.
      if (primary != null) {
        // Catch Exception, not just SQLException: a poisoned Derby
        // connection throws raw RuntimeExceptions (NPEs) from rollback/
        // close too, and one escaping here would mask `primary`.
        try conn.rollback() catch { case _: Exception => () }
        try conn.close() catch { case _: Exception => () }
      } else conn.close()
    }
  }
}
