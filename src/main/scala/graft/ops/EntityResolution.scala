package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity resolution — edit-distance record matching that
  * never goes all-pairs.
  *
  * The reference pipeline dedups records by exact id (Cypher MERGE, DynamoDB
  * keys); the operation users reach for next is FUZZY matching: "these two
  * records are the same entity up to typos". Naive fuzzy join is O(n²)
  * levenshtein — a non-starter at 100 TB. The standard scalable shape
  * (Papadakis et al., "Blocking and Filtering Techniques for Entity
  * Resolution", CSUR 2020) is:
  *
  *   1. BLOCK: records sharing a cheap discriminative key (here: language +
  *      first token + length bucket) are candidates; the candidate join is a
  *      plain equi-join Spark shuffles on the block key.
  *   2. PURGE: blocks bigger than `blockCap` are dropped entirely — an
  *      oversized block means the key is non-discriminative there (stop-word
  *      first token), and its pairs are near-certain non-matches. Purging
  *      bounds the worst block at cap², making the whole operator's work
  *      O(#blocks · cap²) regardless of skew — the census is a
  *      partial-aggregated count, not a window over the sorted table.
  *   3. VERIFY: the surviving pairs run bounded-prefix `levenshtein` with
  *      Spark's threshold form (early-exits the DP once the budget is blown,
  *      Apache Spark `StringUtils.getLevenshteinDistance(s, t, threshold)`
  *      semantics) — cost per pair is O(prefixLen · maxDist), not
  *      O(len²).
  *
  * Both engines (Spark plan and DuckDB oracle) see identical semantics:
  * candidates = equal block key in a retained block, match = prefix edit
  * distance ≤ maxDist; the hash gate is exact.
  */
object EntityResolution {

  /** Repartition to full shuffle width and materialize once — local
    * (executor-storage) by default, reliable when `checkpointDir` is
    * given (the Dedup.bucketedPairSides contract: cluster callers whose
    * executors can be lost mid-query pass an HDFS/S3 root).
    */
  private def materializedOnce(df: DataFrame,
                               checkpointDir: Option[String]): DataFrame = {
    val wide = df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions)
    checkpointDir match {
      case Some(d) =>
        Checkpoints.ensureDir(wide.sparkSession.sparkContext, d)
        wide.checkpoint()
      // LAZY (r17): materialization rides the first consumer's scan
      // (the frequency census / hot-bucket broadcast jobs scan every
      // partition) instead of a dedicated job — at cluster scale that is
      // one fewer full pass over the element-set table.
      case None => wide.localCheckpoint(eager = false)
    }
  }

  /** The blocking key: (extra blocking columns…, first whitespace token,
    * length bucket). Length bucketing folds the cheap length filter into the
    * block key itself: two strings whose lengths differ by more than the
    * bucket width can't share a bucket, and edit distance ≥ length
    * difference prunes them for free.
    */
  def blockKey(text: Column, lenBucket: Int): Column =
    struct(split(text, " ").getItem(0).as("tok"),
      (length(text) / lenBucket).cast("int").as("lb"))

  /** All within-block pairs (id_a < id_b) whose `prefixLen`-bounded edit
    * distance is ≤ `maxDist`, from blocks of size ≤ `blockCap`.
    *
    * Returns `(id_a, id_b, dist)` plus the left row's `carryCols`.
    */
  def blockedFuzzyPairs(df: DataFrame, idCol: String, textCol: String,
                        extraBlockCols: Seq[String], lenBucket: Int,
                        blockCap: Int, prefixLen: Int, maxDist: Int,
                        carryCols: Seq[String] = Nil): DataFrame = {
    val blockCols = extraBlockCols.map(col) :+ blockKey(col(textCol), lenBucket).as("__bk")
    val recs = df.select(
      (Seq(col(idCol), substring(col(textCol), 1, prefixLen).as("__pre")) ++
        carryCols.map(col) ++ blockCols): _*)

    // Block census: partial-aggregated count per block key — one narrow
    // exchange over (blockCols), map-side combined. Purge oversized blocks
    // BEFORE the pair join so no task ever materializes a hot block's pairs.
    val keyNames = extraBlockCols :+ "__bk"
    val kept = recs.join(
      recs.groupBy(keyNames.map(col): _*).agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= blockCap)
        .select(keyNames.map(col): _*),
      keyNames, "left_semi")

    val a = kept.select(
      (Seq(col(idCol).as("id_a"), col("__pre").as("__pre_a")) ++
        carryCols.map(c => col(c)) ++ keyNames.map(col)): _*)
    val b = kept.select(
      (Seq(col(idCol).as("id_b"), col("__pre").as("__pre_b")) ++
        keyNames.map(col)): _*)

    // Threshold-form levenshtein: -1 once the DP exceeds maxDist, so the
    // verify kernel is O(prefixLen·maxDist) per pair and the filter is a
    // single non-negative check.
    val dist = levenshtein(col("__pre_a"), col("__pre_b"), maxDist)
    a.join(b, keyNames)
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", dist)
      .filter(col("dist") >= 0)
      .drop("__pre_a", "__pre_b", "__bk")
  }

  /** AllPairs/PPJoin-style prefix-filtering set-similarity self-join
    * (Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW 2007;
    * Xiao et al. ICDE 2008; distributed form: Vernica et al. SIGMOD 2010).
    *
    * Finds all record pairs whose ELEMENT-SET Jaccard is ≥ tNum/tDen,
    * exactly, without the all-pairs join: order every record's elements by
    * ascending global frequency (rarest first, ties by element value —
    * a total order both engines replay), and keep only each record's
    * PREFIX of the first `s − ceil(t·s) + 1` elements. Two records whose
    * prefixes are disjoint cannot reach the threshold (if they shared
    * nothing in either prefix, their overlap is confined to the two
    * suffixes, which are too short) — so candidates are exactly the pairs
    * sharing ≥ 1 prefix element, a plain equi-join keyed on the element.
    *
    * Scale shape: frequency ranking is one partial-aggregated count plus a
    * keyed join (never a driver-side vocabulary); the candidate join is
    * keyed on PREFIX elements, which are each record's globally rarest —
    * the join's per-key fan-out is the prefix document frequency, which the
    * ordering minimizes by construction (the blocking twin of q31's
    * shingle buckets, but frequency-adaptive: hot elements are pushed out
    * of prefixes instead of needing a purge). Verify is scan-local
    * (`array_intersect` on the two carried sets) with the integer
    * cross-multiplied Jaccard test, plus the length filter
    * (t·|A| ≤ |B| ≤ |A|/t) — implied by the threshold, so it prunes
    * without changing results.
    *
    * `elemsCol` must be a DISTINCT-element array column. Returns
    * `(id_a, id_b, inter, sz_a, sz_b)` plus `carryCols` from the left row.
    */
  /** |A ∩ B| of the verify sides: the codegen'd `array_inter_size` for
    * long element sets (the production shingle-hash path), the portable
    * interpreted `array_intersect` for any other element type.
    */
  private def interSizeExpr(elemsType: org.apache.spark.sql.types.DataType): Column =
    elemsType match {
      // containsNull=false only (ADVICE r17): array_inter_size now rejects
      // nullable-element arrays at analysis; the array_compact upstream
      // yields containsNull=false so the production path always lands here.
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, false) =>
        call_function("array_inter_size", col("__ts_a"), col("__ts_b"))
      case _ =>
        size(array_intersect(col("__ts_a"), col("__ts_b"))).cast("long")
    }

  def prefixFilterPairs(df: DataFrame, idCol: String, elemsCol: Column,
                        tNum: Int, tDen: Int,
                        carryCols: Seq[String] = Nil,
                        checkpointDir: Option[String] = None): DataFrame = {
    require(tNum > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    // The element-set computation feeding this (shingle hashing, an
    // expensive scan-local kernel) has THREE consumers here (frequency
    // census, candidate prefixes, verify sides) — materialize it once at
    // full shuffle width (explicit count: exempt from AQE coalescing; a
    // local single-row-group scan otherwise pins everything to ~2
    // tasks). Rows are (id, hashes, carry) — ids+longs, bounded payload.
    // localCheckpoint lives in executor-local storage (lost with the
    // executor); cluster callers pass `checkpointDir` for a reliable
    // HDFS/S3 checkpoint instead — same contract as
    // Dedup.bucketedPairSides.
    // array_compact: null elements would silently disagree between the
    // token-table paths (explode+equi-join drops nulls) and the verify
    // filter's size(__ts) (counts them) — dropping nulls up front makes
    // every size/prefix/intersect computation see the same set.
    org.apache.spark.sql.GraftFunctions.register(df.sparkSession)
    // The production elemsCol (shingle_hashes output) arrives sorted
    // (r18), so the codegen'd verify kernel skips its per-PAIR sorts via
    // ensureSorted's O(n) check; array_compact preserves order. No
    // sort_array here: it is CodegenFallback and breaks the stage's
    // whole-stage codegen (measured 1.3x worse).
    val r = materializedOnce(df.select((col(idCol).as("__id") +:
      array_compact(elemsCol).as("__ts") +: carryCols.map(col)): _*), checkpointDir)
    val tok = r.select(col("__id"), explode(col("__ts")).as("__t"))
    val freq = tok.groupBy(col("__t")).agg(count(lit(1)).as("__df"))

    // Per-record frequency-sorted element list; prefix length from the
    // integer ceil: p = s − ((tNum·s + tDen − 1) div tDen) + 1 ≥ 1.
    val ordered = tok.join(freq, "__t")
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("__df"), col("__t")))).as("__ord"))
      .withColumn("__sz", size(col("__ord")))
      .withColumn("__p",
        col("__sz") - expr(s"(__sz * $tNum + ${tDen - 1}) div $tDen") + 1)
      .select(col("__id"),
        explode(expr("transform(slice(__ord, 1, int(__p)), x -> x.__t)")).as("__t"))

    // EXPLICIT width on the candidate self-join (r17, the
    // bucketedPairSides lesson): AQE coalesces this exchange from its
    // small INPUT bytes (prefix tokens), but the join's OUTPUT — the
    // candidate expansion — is the quadratic part, invisible to the
    // input-size heuristic; measured at sf0.1 the whole expansion ran in
    // 3 AQE-coalesced tasks. An explicit count is exempt from coalescing.
    val wJoin = df.sparkSession.sessionState.conf.numShufflePartitions
    val cand = ordered.select(col("__id").as("id_a"), col("__t"))
      .repartition(wJoin, col("__t"))
      .join(ordered.select(col("__id").as("id_b"), col("__t"))
        .repartition(wJoin, col("__t")), Seq("__t"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()

    val left = r.select((col("__id").as("id_a") +: col("__ts").as("__ts_a") +:
      carryCols.map(col)): _*)
    val right = r.select(col("__id").as("id_b"), col("__ts").as("__ts_b"))
    cand.join(left, "id_a").join(right, "id_b")
      .withColumn("sz_a", size(col("__ts_a")).cast("long"))
      .withColumn("sz_b", size(col("__ts_b")).cast("long"))
      // Length filter: a pair failing t·|A| ≤ |B| can't pass Jaccard ≥ t.
      .filter(col("sz_a") * tNum <= col("sz_b") * tDen &&
        col("sz_b") * tNum <= col("sz_a") * tDen)
      // codegen'd intersection size for long element sets (r17) —
      // array_intersect is interpreted per pair; exact distinct-count
      // parity spec-pinned. Non-long element types (spec fixtures) keep
      // the portable form.
      .withColumn("inter", interSizeExpr(r.schema("__ts").dataType))
      .filter(col("inter") * tDen >= lit(tNum) * (col("sz_a") + col("sz_b") - col("inter")))
      .drop("__ts_a", "__ts_b")
  }

  /** ASYMMETRIC containment join — find (a, b) pairs where a's element
    * set is mostly inside b's: |A ∩ B| ≥ t·|A| (the "short doc copied
    * into a longer one" relation plain Jaccard can't see: a tweet quoted
    * inside an article has tiny symmetric similarity but containment 1).
    *
    * Prefix filtering adapts: if A∩B avoided all of A's first
    * s − ceil(t·s) + 1 rarest elements, the overlap would fit in A's
    * suffix of ceil(t·s) − 1 < t·s elements — contradiction. So the
    * candidate join is A-PREFIX elements against B's FULL posting list
    * (the asymmetric form: only the probe side gets a prefix). Both join
    * keys are each A's globally rarest elements, and a rare element's
    * posting list is short by definition — per-key fan-out is bounded by
    * rare-element frequency on BOTH sides. Verify is scan-local.
    *
    * Emits each pair once, directionally: (id_a contained-in id_b), with
    * |A| < |B|, or |A| = |B| and id_a < id_b (equal sets qualify both
    * ways; one canonical row).
    *
    * Scale shape (the r14 sf10 probe's one named scale-killer, fixed):
    * the verify join ships full shingle arrays, and a naive layout drags
    * one array per CANDIDATE through the second join's exchange — 4.8 GB
    * at sf10's ~30M candidates. Candidates are therefore pruned with two
    * EXACT filters before any array moves (PPJoin-style, Xiao et al.
    * ICDE 2008, adapted to the asymmetric threshold):
    *
    *   - LENGTH/DIRECTION: the output keeps only |A| < |B| (or equal
    *     sizes, id_a < id_b) — a candidate-level fact, applied per match
    *     row before the pair aggregate instead of after the array join.
    *   - POSITIONAL: both sides' element lists share one total order
    *     (global df, then element value — the order the prefixes are cut
    *     from), so a match at 1-based positions (i, j) bounds the overlap
    *     exactly: common elements below the match sit before i in A AND
    *     before j in B; those above sit after BOTH. Per match row,
    *     overlap ≤ 1 + min(i−1, j−1) + min(|A|−i, |B|−j); at the pair's
    *     EARLIEST match (min i) the left slack is zero — any common
    *     element before it is itself a prefix match and would have been
    *     observed. The pair aggregate keeps min(bound) over its match
    *     rows and drops pairs that cannot reach ceil(t·|A|).
    *   - EXTENDED-PREFIX MATCH COUNT (the one that bites — adaptive
    *     prefix filtering, Wang et al. SIGMOD 2012): probing with A's
    *     first P = min(p + k − 1, |A|) elements, a qualifying pair must
    *     share ≥ P − p + 1 of them — A has at most p − 1 elements
    *     outside the overlap, so fewer shared probe elements puts the
    *     overlap below ceil(t·|A|) by pigeonhole. Measured at sf10, the
    *     positional bound alone pruned only 15.7M → 14.9M match pairs:
    *     A's rarest elements sit EARLY in B's frequency-sorted list too
    *     (same global order), so the B-side slack stays wide. Requiring
    *     k = 3 shared probe elements collapses the accidental
    *     single-rare-token pairs instead.
    *
    * All prunes only remove pairs the verify filter rejects anyway —
    * results are bit-identical; the DuckDB oracle replays the unpruned
    * candidate set. Survivors (≈ true pairs) then pay the array join,
    * with the SMALLER side's array (|A| ≤ |B|) crossing the id_b
    * exchange.
    */
  def containmentPairs(df: DataFrame, idCol: String, elemsCol: Column,
                       tNum: Int, tDen: Int,
                       carryCols: Seq[String] = Nil,
                       checkpointDir: Option[String] = None): DataFrame = {
    require(tNum > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    org.apache.spark.sql.GraftFunctions.register(df.sparkSession)
    // The element-set computation feeding this (shingle hashing, an
    // expensive scan-local kernel) has THREE consumers here (frequency
    // census, candidate prefixes, verify sides) — materialize it once at
    // full shuffle width (explicit count: exempt from AQE coalescing; a
    // local single-row-group scan otherwise pins everything to ~2
    // tasks). Rows are (id, hashes, carry) — ids+longs, bounded payload.
    // Reliable-checkpoint contract as in [[prefixFilterPairs]].
    // array_compact: the candidate-side __sz comes from the token table
    // (explode+equi-join, which drops null elements) while verify uses
    // size(__ts) — compacting up front makes both counts agree for
    // arrays that contain nulls.
    val r = materializedOnce(df.select((col(idCol).as("__id") +:
      array_compact(elemsCol).as("__ts") +: carryCols.map(col)): _*), checkpointDir)
    val tok = r.select(col("__id"), explode(col("__ts")).as("__t"))
    val freq = tok.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    // Per-record frequency-ranked positions — ONE ranked token table
    // feeds both join sides (A-prefix probe and B-full postings), so the
    // rank groupBy runs once, not once per side. Token-stream-sized rows
    // of (id, pos, size, element): bounded payload.
    val posTok = materializedOnce(
      tok.join(freq, "__t")
        .groupBy(col("__id"))
        .agg(sort_array(collect_list(struct(col("__df"), col("__t")))).as("__ord"))
        .select(col("__id"), size(col("__ord")).as("__sz"),
          posexplode(expr("transform(__ord, x -> x.__t)")).as(Seq("__p0", "__t"))),
      checkpointDir)

    // k extra probe elements beyond the minimal prefix p: candidates must
    // share ≥ (probe − p + 1) of A's first probe elements (exact, see
    // scaladoc). k = 3 measured best at sf10 — k = 1 is the classic
    // prefix filter, which left 14.9M accidental candidates.
    val k = 3
    val pl = col("__sz") - expr(s"(__sz * $tNum + ${tDen - 1}) div $tDen") + 1
    val pA = posTok
      .filter(col("__p0") + 1 <= least(pl + (k - 1), col("__sz")))
      .select(col("__id").as("id_a"), col("__t"),
        (col("__p0") + 1).as("__ia"), col("__sz").as("__sa"))
    val pB = posTok.select(col("__id").as("id_b"), col("__t"),
      (col("__p0") + 1).as("__jb"), col("__sz").as("__sb"))

    // (i, j) packed into one long (i < 2³¹ always: it's a position in a
    // document's element list) so the earliest-match aggregate is a plain
    // long min — HashAggregate-able, where min(struct(i, j)) forces a
    // SortAggregate pair (two extra sorts on the candidate stream).
    // explicit width: same candidate-expansion rationale as
    // [[prefixFilterPairs]] (r17)
    val wJoin = df.sparkSession.sessionState.conf.numShufflePartitions
    val cand = pA.repartition(wJoin, col("__t"))
      .join(pB.repartition(wJoin, col("__t")), Seq("__t"))
      .filter(col("__sa") < col("__sb") ||
        (col("__sa") === col("__sb") && col("id_a") < col("id_b")))
      .select(col("id_a"), col("id_b"), col("__sa"), col("__sb"),
        (lit(1) + least(col("__ia") - 1, col("__jb") - 1) +
          least(col("__sa") - col("__ia"), col("__sb") - col("__jb"))).as("__ub"),
        (shiftleft(col("__ia").cast("long"), 32) + col("__jb")).as("__ij"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("__ij")).as("__e"), min(col("__ub")).as("__mn"),
        min(col("__sa")).as("__sa"), min(col("__sb")).as("__sb"),
        count(lit(1)).as("__nm"))
      .withColumn("__bound", least(col("__mn"), lit(1) +
        least(col("__sa") - shiftright(col("__e"), 32).cast("int"),
          col("__sb") - col("__e").bitwiseAND(lit(4294967295L)).cast("int"))))
      .filter(col("__bound") * tDen >= lit(tNum) * col("__sa"))
      // Extended-prefix pigeonhole: shared probe elements must reach
      // probe − p + 1 (both recomputed from |A|; __nm counts match rows,
      // one per shared probe element — elements are distinct per doc).
      .withColumn("__pl",
        col("__sa") - expr(s"(__sa * $tNum + ${tDen - 1}) div $tDen") + 1)
      .filter(col("__nm") >=
        least(col("__pl") + (k - 1), col("__sa")) - col("__pl") + 1)
      .select(col("id_a"), col("id_b"))

    val left = r.select((col("__id").as("id_a") +: col("__ts").as("__ts_a") +:
      carryCols.map(col)): _*)
    val right = r.select(col("__id").as("id_b"), col("__ts").as("__ts_b"))
    cand.join(left, "id_a").join(right, "id_b")
      .withColumn("sz_a", size(col("__ts_a")).cast("long"))
      .withColumn("sz_b", size(col("__ts_b")).cast("long"))
      .withColumn("inter", interSizeExpr(r.schema("__ts").dataType))
      .filter(col("inter") * tDen >= lit(tNum) * col("sz_a"))
      .drop("__ts_a", "__ts_b")
  }
}
