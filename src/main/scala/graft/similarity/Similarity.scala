package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — one broadcast of the (small) query
  * set against the corpus. Scale path: sign-LSH bucketing (and the IVF-style
  * variant in `ivfTopK`) so the candidate set per query is a bucket, not the
  * corpus.
  *
  * Vector math runs in per-partition JVM kernels (`mapPartitions`), not
  * column higher-order functions: HOFs evaluate interpreted outside
  * whole-stage codegen at roughly two orders of magnitude the cost per
  * element, which at 100 TB is the whole budget. The expression forms
  * ([[dot]]/[[cosine]]/[[signBucket]]) are kept for composability and
  * produce bit-identical doubles (same fold order) — the kernels are the
  * hot path, the expressions the spec.
  */
object Similarity {

  /** Dot product of two equal-length numeric arrays as double, folded in
    * index order (deterministic, same order any ANSI engine folds a list).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(0.0)).otherwise(dot(a, b) / nn)
  }

  /** The p-th pseudo-random ±1 hyperplane for `dim`-dim vectors: element i
    * is signum(sin((i+1)·(p+1))) — fixed across engines and runs.
    */
  def planesArr(planes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim)((p, i) =>
      math.signum(math.sin((i + 1).toDouble * (p + 1))))

  /** Sign-LSH bucket id as a column expression (spec form; see kernels). */
  def signBucket(v: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { p =>
      val plane = array(planesArr(planes, dim)(p).map(lit): _*)
      val proj = aggregate(
        zip_with(v, plane, (x, pl) => x.cast("double") * pl),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce[Column]((a, b) => a.bitwiseOR(b))

  // ------------------------------------------------------------- kernels

  /** Per-partition kernel: (idCol, vecCol) → (bucket, id, v, nrm), with the
    * sign-LSH bucket and L2 norm computed in one pass. `planes = 0` skips
    * the bucket (emits 0). Input is repartitioned to default parallelism —
    * small parquet inputs arrive as a single split, and the exchange is an
    * optimizer barrier against projection re-inlining.
    */
  def bucketNorm(df: DataFrame, idCol: String, vecCol: String,
                 planes: Int, dim: Int, extra: Seq[String] = Nil): DataFrame = {
    // Adaptive barrier width (r17): the per-row kernel cost here is a few
    // dim-length float loops (~µs), so the width that matters is bytes
    // per task, not cores — ceil(stats/4 MiB) reaches the full shuffle
    // width on real corpora while a KB-scale serving batch runs in one
    // task instead of paying 32 per-task fixed costs per exchange.
    val in0 = df.select(col(idCol).as("id") +: col(vecCol).as("v") +:
        extra.map(col): _*)
    val in = in0.repartition(graft.ops.CoreOps.adaptiveWidth(in0))
    val idType = df.schema(idCol).dataType
    val outSchema = StructType(Seq(
      StructField("bucket", LongType, nullable = false),
      StructField("id", idType),
      StructField("v", ArrayType(FloatType)),
      StructField("nrm", DoubleType, nullable = false)) ++
      extra.map(c => df.schema(c)))
    val pl = planesArr(planes, dim)
    implicit val enc = Encoders.row(outSchema)
    in.mapPartitions { it =>
      it.map { r =>
        val v = r.getSeq[Float](1)
        var bucket = 0L
        var p = 0
        while (p < planes) {
          var proj = 0.0
          var i = 0
          val n = math.min(v.length, dim)
          while (i < n) { proj += v(i).toDouble * pl(p)(i); i += 1 }
          if (proj > 0) bucket |= (1L << p)
          p += 1
        }
        var sq = 0.0
        var i = 0
        while (i < v.length) { sq += v(i).toDouble * v(i).toDouble; i += 1 }
        Row.fromSeq(Seq(bucket, r.get(0), v, math.sqrt(sq)) ++
          (2 until r.length).map(r.get))
      }
    }(enc)
  }

  /** Per-partition kernel: append cosine(aVec, bVec) (from pre-computed
    * norms, zero-norm → 0.0) as `outName` to every row.
    */
  def appendCosine(df: DataFrame, aVec: String, bVec: String,
                   aNorm: String, bNorm: String, outName: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outName, DoubleType, nullable = false))
    val (ia, ib) = (df.schema.fieldIndex(aVec), df.schema.fieldIndex(bVec))
    val (ina, inb) = (df.schema.fieldIndex(aNorm), df.schema.fieldIndex(bNorm))
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val a = r.getSeq[Float](ia)
        val b = r.getSeq[Float](ib)
        val nn = r.getDouble(ina) * r.getDouble(inb)
        val sim =
          if (nn == 0.0) 0.0
          else {
            var d = 0.0
            var i = 0
            val n = math.min(a.length, b.length)
            while (i < n) { d += a(i).toDouble * b(i).toDouble; i += 1 }
            d / nn
          }
        Row.fromSeq(r.toSeq :+ sim)
      }
    }(enc)
  }

  // ------------------------------------------------------------- queries

  /** Brute-force cosine top-k: for each query vector (small set — gets
    * broadcast), the k nearest corpus vectors. One broadcast-nested-loop of
    * |queries| × |corpus| scored rows, then a per-query top-k window (partial
    * top-k map-side). At 1000 executors this scales linearly in corpus size.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     dim: Int = 64,
                     maxQueryBatch: Int = DefaultMaxQueryBatch): DataFrame = {
    // The query side is broadcast (executor memory, not driver) — still a
    // bounded-serving-batch contract: an unbounded evaluation set would
    // OOM every executor at once. Count is cheap (no data movement).
    val nq = queries.limit(maxQueryBatch + 1).count()
    require(nq <= maxQueryBatch,
      s"query batch exceeds maxQueryBatch=$maxQueryBatch — the broadcast " +
        "nested-loop path ships every query to every executor; use " +
        "bruteForceTopKDistributed for large query sets")
    bruteForceScored(corpus, broadcast(bruteForceQ(queries, idCol, vecCol, dim)),
      idCol, vecCol, k, dim)
  }

  /** [[bruteForceTopK]] for UNBOUNDED query sets: same |Q|×|C| scoring,
    * but as a non-broadcast join (Spark picks a cartesian product whose
    * tasks tile both sides) — no single executor ever holds the whole
    * query set. Output is identical (shared scoring/ranking tail).
    */
  def bruteForceTopKDistributed(corpus: DataFrame, queries: DataFrame,
                                idCol: String, vecCol: String, k: Int,
                                dim: Int = 64): DataFrame =
    bruteForceScored(corpus, bruteForceQ(queries, idCol, vecCol, dim),
      idCol, vecCol, k, dim)

  private def bruteForceQ(queries: DataFrame, idCol: String, vecCol: String,
                          dim: Int): DataFrame =
    bucketNorm(queries, idCol, vecCol, 0, dim)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qnorm"))

  private def bruteForceScored(corpus: DataFrame, q: DataFrame, idCol: String,
                               vecCol: String, k: Int, dim: Int): DataFrame = {
    val c = bucketNorm(corpus, idCol, vecCol, 0, dim)
      .select(col("id").as("corpus_id"), col("v").as("cv"), col("nrm").as("cnorm"))
    val scored = appendCosine(
      c.join(q, col("corpus_id") =!= col("query_id")),
      "cv", "qv", "cnorm", "qnorm", "sim")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "sim")
  }

  /** Hard-negative mining for contrastive training: for each query vector,
    * the k most-similar corpus vectors with a DIFFERENT label (and a
    * different id) — "looks like the positive but isn't" is exactly what a
    * retrieval model needs in its denominator. Same broadcast-nested-loop +
    * per-query top-k shape as [[bruteForceTopK]] (the query set is small;
    * corpus scales linearly across executors); the label rides the
    * [[bucketNorm]] kernel as a pass-through column, so no second join
    * against the corpus to recover it.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, labelCol: String, k: Int,
                    dim: Int = 64): DataFrame = {
    val c = bucketNorm(corpus, idCol, vecCol, 0, dim, Seq(labelCol))
      .select(col("id").as("corpus_id"), col("v").as("cv"),
        col("nrm").as("cnorm"), col(labelCol).as("c_label"))
    val q = bucketNorm(queries, idCol, vecCol, 0, dim, Seq(labelCol))
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnorm"), col(labelCol).as("q_label"))
    val scored = appendCosine(
      c.join(broadcast(q),
        col("corpus_id") =!= col("query_id") &&
          col("c_label") =!= col("q_label")),
      "cv", "qv", "cnorm", "qnorm", "sim")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"),
        col("c_label").as("neg_label"), col("sim"))
  }

  /** Label-coherence audit over an embedding corpus — the mislabel /
    * outlier sweep before contrastive training: per label, every
    * member's cosine to the label CENTROID, rolled up as min/max and an
    * outlier count under `lowTau`. Exact and engine-portable: vectors
    * and centroids live in integer millis (round(x·1000)), the centroid
    * is the per-dimension integer mean (truncating division — bounded
    * regardless of label size, so the norm arithmetic can never
    * overflow), and the only doubles are the final sqrt/divide, computed
    * from identical integers on any engine. Scale shape: one
    * partial-aggregable (label, dim) sum + a broadcast-sized centroid
    * table joined back — no pairwise anything.
    */
  def labelCoherence(df: DataFrame, idCol: String, vecCol: String,
                     labelCol: String, lowTau: Double = 0.1): DataFrame = {
    val milli = transform(col(vecCol), x =>
      round(x.cast("double") * 1000).cast("long"))
    val docs = df.select(col(idCol).as("id"), col(labelCol).as("label"),
      milli.as("du"))
    val cent = docs.select(col("label"), posexplode(col("du")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("col")).as("su"), count(lit(1)).as("n"))
      // Truncating integer division on BOTH engines (Spark `div` ≡
      // DuckDB integer `//`, both toward zero — verified on negatives,
      // which per-dimension sums do hit).
      .withColumn("cu", expr("su div n"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cu")))).as("pc"))
      .select(col("label"), transform(col("pc"), s => s.getField("cu")).as("cu"))
    val joined = docs.join(broadcast(cent), Seq("label"))
    val dot = aggregate(zip_with(col("du"), col("cu"), (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)
    val nd = aggregate(zip_with(col("du"), col("du"), (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)
    val nc = aggregate(zip_with(col("cu"), col("cu"), (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)
    val cos = when(nd === 0L || nc === 0L, lit(0.0))
      .otherwise(dot.cast("double") /
        (sqrt(nd.cast("double")) * sqrt(nc.cast("double"))))
    joined.withColumn("cos", cos)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("cos") < lowTau, 1L).otherwise(0L)).as("n_low"),
        min(col("cos")).as("min_cos"),
        max(col("cos")).as("max_cos"))
  }

  /** Multi-probe sign-LSH top-k (Lv et al. 2007, deterministic probe
    * order): each query scores its own bucket PLUS the buckets at
    * Hamming distance 1 on planes 0..nProbe−2 — recall recovered not by
    * adding tables/planes but by probing near buckets, so the corpus is
    * hashed ONCE and the extra cost is per-query. Candidate sets are
    * nested in nProbe by construction, which is what makes the recall
    * curve structurally monotone.
    */
  def multiProbeTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     planes: Int = 6, nProbe: Int = 1,
                     dim: Int = 64): DataFrame = {
    require(nProbe >= 1 && nProbe <= planes + 1,
      s"nProbe must be in [1, planes + 1 = ${planes + 1}]")
    val c = bucketNorm(corpus, idCol, vecCol, planes, dim)
      .select(col("bucket"), col("id").as("corpus_id"),
        col("v").as("cv"), col("nrm").as("cnorm"))
    val q0 = bucketNorm(queries, idCol, vecCol, planes, dim)
      .select(col("bucket").as("qb"), col("id").as("query_id"),
        col("v").as("qv"), col("nrm").as("qnorm"))
    val probes = (0 until nProbe).map { i =>
      if (i == 0) col("qb")
      else col("qb").bitwiseXOR(lit(1L << (i - 1)))
    }
    val q = q0.withColumn("bucket", explode(array(probes: _*)))
    val scored = appendCosine(
      c.join(q, Seq("bucket")).filter(col("corpus_id") =!= col("query_id")),
      "cv", "qv", "cnorm", "qnorm", "sim")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "sim")
  }

  /** Recall@k of [[multiProbeTopK]] against the brute-force ground
    * truth, per probe count — the probes-vs-recall tuning curve (the
    * sign-LSH twin of [[ivfRecallCurve]]). Monotonicity is structural
    * (nested candidate sets) and still gated.
    */
  def multiProbeRecallCurve(corpus: DataFrame, queries: DataFrame,
                            idCol: String, vecCol: String, k: Int,
                            nProbes: Seq[Int], planes: Int = 6,
                            dim: Int = 64): DataFrame = {
    require(nProbes.nonEmpty && nProbes == nProbes.sorted && nProbes.distinct == nProbes,
      "nProbes must be distinct and ascending")
    val exact = bruteForceTopK(corpus, queries, idCol, vecCol, k, dim)
      .select(col("query_id"), col("corpus_id"))
      .withColumn("hit", lit(1L))
    // ONE hash/probe/score pass at max(nProbes) — the same nested-set
    // collapse as [[ivfRecallCurve]] (r17): a candidate pair matches
    // exactly one probe index rn (probed buckets are distinct), level
    // p's top-k rank is the running count of rn ≤ p candidates in the
    // shared (sim desc, corpus_id asc) window order, and all levels'
    // hit counts come out of one conditional aggregate instead of one
    // multiProbeTopK subplan (corpus re-hash + join + window) per level.
    val maxP = nProbes.max
    require(maxP >= 1 && maxP <= planes + 1,
      s"nProbe must be in [1, planes + 1 = ${planes + 1}]")
    val c = bucketNorm(corpus, idCol, vecCol, planes, dim)
      .select(col("bucket"), col("id").as("corpus_id"),
        col("v").as("cv"), col("nrm").as("cnorm"))
    val q0 = bucketNorm(queries, idCol, vecCol, planes, dim)
      .select(col("bucket").as("qb"), col("id").as("query_id"),
        col("v").as("qv"), col("nrm").as("qnorm"))
    val probeCols = (0 until maxP).map { i =>
      if (i == 0) col("qb")
      else col("qb").bitwiseXOR(lit(1L << (i - 1)))
    }
    val q = q0.select(col("query_id"), col("qv"), col("qnorm"),
        posexplode(array(probeCols: _*)).as(Seq("pos", "bucket")))
      .withColumn("rn", col("pos") + 1)
    val scored = appendCosine(
      c.join(q, Seq("bucket")).filter(col("corpus_id") =!= col("query_id")),
      "cv", "qv", "cnorm", "qnorm", "sim")
    val wOrd = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = nProbes.foldLeft(scored) { (df, p) =>
      df.withColumn(s"__rk_$p",
        sum(when(col("rn") <= p, 1L).otherwise(0L)).over(wOrd))
    }
    val hitsRow = ranked
      .join(broadcast(exact), Seq("query_id", "corpus_id"), "left")
      .agg(nProbes.map(p =>
        sum(when(col("rn") <= p && col(s"__rk_$p") <= k &&
          col("hit").isNotNull, 1L).otherwise(0L)).as(s"__h_$p")).head,
        nProbes.map(p =>
          sum(when(col("rn") <= p && col(s"__rk_$p") <= k &&
            col("hit").isNotNull, 1L).otherwise(0L)).as(s"__h_$p")).tail: _*)
    val perProbe = hitsRow.select(explode(array(nProbes.map(p =>
        struct(lit(p).as("n_probe"),
          coalesce(col(s"__h_$p"), lit(0L)).as("n_hits"))): _*)).as("x"))
      .select(col("x.n_probe").as("n_probe"), col("x.n_hits").as("n_hits"))
    val w = Window.orderBy(col("n_probe"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perProbe.withColumn("monotone_ok",
      coalesce(col("n_hits") >= max(col("n_hits")).over(w), lit(true)))
  }

  /** LSH-bucketed approximate top-k: queries only score corpus vectors in
    * their own sign-bucket. Trades recall for a |corpus|/2^planes candidate
    * set — the 100 TB path (bucket join = hash shuffle, no broadcast of the
    * corpus, no cross join).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              planes: Int = 6, dim: Int = 64): DataFrame = {
    val c = bucketNorm(corpus, idCol, vecCol, planes, dim)
      .select(col("bucket"), col("id").as("corpus_id"), col("v").as("cv"), col("nrm").as("cnorm"))
    val q = bucketNorm(queries, idCol, vecCol, planes, dim)
      .select(col("bucket"), col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qnorm"))
    val scored = appendCosine(
      c.join(q, Seq("bucket")).filter(col("corpus_id") =!= col("query_id")),
      "cv", "qv", "cnorm", "qnorm", "sim")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "sim")
  }

  /** True IVF ANN: one deterministic k-means-lite pass.
    *
    *  1. coarse cells = sign-LSH buckets over log2(nCells) planes;
    *  2. centroid per cell = exact mean via integer micro-unit sums
    *     (order-invariant under any partitioning — the float work happens
    *     once, after the associative long sums);
    *  3. every corpus vector reassigned to its nearest centroid by cosine
    *     (tie → lower cell id);
    *  4. queries probe their `nProbe` nearest centroids and run exact
    *     cosine top-k over just those cells' vectors.
    *
    * All joins are hash joins on the small centroid/cell key; the corpus is
    * never broadcast and never compared all-pairs — the 100 TB path probes
    * |corpus|·nProbe/nCells candidates per query.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nCells: Int = 16, nProbe: Int = 4, dim: Int = 64,
              refinePasses: Int = 1): DataFrame = {
    val (assigned, centroidsN) =
      kmeansAssign(corpus, idCol, vecCol, nCells, dim, refinePasses)
    ivfSearch(assigned, centroidsN, queries, idCol, vecCol, k, nProbe, dim)
  }

  /** Deterministic k-means-lite clustering of an embedding corpus — steps
    * 1-3 of [[ivfTopK]], exposed for cluster-blocked operators (SemDeDup,
    * per-cluster curriculum stats): coarse sign-LSH seeds → exact
    * integer-micro centroid means → `refinePasses` Lloyd reassignments.
    * Returns `(assigned, centroids)`: assigned = (cell, corpus_id,
    * cv2 = the original vector, cnorm2); centroids = (cell, cv, cnrm).
    */
  def kmeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
                   nCells: Int = 16, dim: Int = 64,
                   refinePasses: Int = 1): (DataFrame, DataFrame) = {
    require(nCells > 0 && (nCells & (nCells - 1)) == 0, "nCells must be a power of 2")
    val planes = java.lang.Integer.numberOfTrailingZeros(nCells)
    val spark = corpus.sparkSession

    // Materialized ONCE (r17): base feeds the seed-centroid aggregate plus
    // one full scan per assign pass (1 + refinePasses of them) — without
    // the checkpoint each scan re-ran the parquet read + exchange +
    // bucket/norm kernel (measured 5 recomputations in q143's plan; at
    // cluster scale each is a full corpus pass).
    val base = bucketNorm(corpus, idCol, vecCol, planes, dim)
      .localCheckpoint() // bucket,id,v,nrm

    // Exact centroid mean over (cellCol, vecCol): per-dim long micro-sums
    // (order-invariant at any partitioning), one double division, then the
    // model-sized array is materialized — centroids are a bounded artifact
    // (≤ nCells entries, like a broadcast variable), not data, and
    // computing them lazily would re-run the corpus aggregation per use.
    // Norms use the same index-order fold as the kernels.
    def centroidArray(df: DataFrame, cellCol: String, vecCol2: String): Array[(Long, Array[Float], Double)] = {
      val sumCols = (0 until dim).map(i =>
        sum(round(element_at(col(vecCol2), i + 1).cast("double") * lit(1e6), 0).cast("long")).as(s"s$i"))
      val sums = df.groupBy(col(cellCol)).agg(count(lit(1)).as("cnt"), sumCols: _*)
      val cents = sums.select(col(cellCol).cast("long").as("cell"),
        array((0 until dim).map(i =>
          (col(s"s$i").cast("double") / lit(1e6) / col("cnt")).cast("float")): _*).as("cv"))
      cents.collect().map { r =>
        val cv = r.getSeq[Float](1).toArray
        var sq = 0.0
        var i = 0
        while (i < cv.length) { sq += cv(i).toDouble * cv(i).toDouble; i += 1 }
        (r.getLong(0), cv, math.sqrt(sq))
      }
    }

    def centroidTable(cents: Array[(Long, Array[Float], Double)]): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(cents.map { case (cell, cv, cnrm) =>
          Row(cell, cv.toSeq, cnrm)
        }: _*),
        StructType(Seq(
          StructField("cell", LongType, nullable = false),
          StructField("cv", ArrayType(FloatType)),
          StructField("cnrm", DoubleType, nullable = false))))

    // Nearest centroid per corpus vector — a per-row argmax kernel over the
    // broadcast centroid array: zero row amplification (the previous
    // formulation joined corpus × centroids before aggregating, i.e.
    // materialized nCells rows per vector; at nCells ≈ √n that CPU/memory
    // blow-up dominates). Same float arithmetic as appendCosine (index-order
    // dot, nrm·cnrm), same tie-break (max sim, then lower cell id).
    val assignSchema = StructType(Seq(
      StructField("cell", LongType, nullable = false),
      StructField("corpus_id", corpus.schema(idCol).dataType),
      StructField("cv2", ArrayType(FloatType)),
      StructField("cnorm2", DoubleType, nullable = false)))
    def assign(cents: Array[(Long, Array[Float], Double)]): DataFrame = {
      val bc = spark.sparkContext.broadcast(cents)
      implicit val enc = Encoders.row(assignSchema)
      base.select(col("id"), col("v"), col("nrm")).mapPartitions { it =>
        val cs = bc.value
        it.map { r =>
          val v = r.getSeq[Float](1)
          val nrm = r.getDouble(2)
          var bestCell = 0L
          var bestSim = Double.NegativeInfinity
          var c = 0
          while (c < cs.length) {
            val (cell, cv, cnrm) = cs(c)
            val nn = nrm * cnrm
            val sim =
              if (nn == 0.0) 0.0
              else {
                var d = 0.0
                var i = 0
                val n = math.min(v.length, cv.length)
                while (i < n) { d += v(i).toDouble * cv(i).toDouble; i += 1 }
                d / nn
              }
            if (sim > bestSim || (sim == bestSim && cell < bestCell)) {
              bestSim = sim
              bestCell = cell
            }
            c += 1
          }
          Row(bestCell, r.get(0), v, nrm)
        }
      }(enc)
    }

    // k-means-lite: coarse LSH seeds, then `refinePasses` Lloyd iterations
    // (centroids from the current assignment, reassign). Each centroid
    // array is collected eagerly, so iterations never re-trigger earlier
    // passes.
    var cents = centroidArray(base, "bucket", "v")
    var assigned = assign(cents)
    for (_ <- 1 to refinePasses) {
      cents = centroidArray(assigned, "cell", "cv2")
      assigned = assign(cents)
    }
    (assigned, centroidTable(cents))
  }

  /** Probe + exact-rescore stage of [[ivfTopK]] over a prebuilt
    * clustering from [[kmeansAssign]].
    */
  private def ivfSearch(assigned: DataFrame, centroidsN: DataFrame,
                        queries: DataFrame, idCol: String, vecCol: String,
                        k: Int, nProbe: Int, dim: Int): DataFrame = {
    // nProbe nearest centroids per query
    val queriesN = bucketNorm(queries, idCol, vecCol, 0, dim)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qnorm"))
    val queryX = appendCosine(
      queriesN.join(broadcast(centroidsN), lit(true)),
      "qv", "cv", "qnorm", "cnrm", "csim")
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cell").asc)
    val probes = queryX.withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("cell"), col("query_id"), col("qv"), col("qnorm"))

    // exact cosine over probed cells only, then global top-k per query
    val scored = appendCosine(
      assigned.join(probes, Seq("cell")).filter(col("corpus_id") =!= col("query_id")),
      "cv2", "qv", "cnorm2", "qnorm", "sim")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "sim")
  }

  /** nProbe/recall tuning curve for the IVF index — the harness a real
    * ANN deployment reads before picking its probe budget: for each
    * `nProbes` value, total recall@k hits against the brute-force ground
    * truth, summed over the query set. The clustering and the exact
    * ranking are computed ONCE (pinned — both feed every probe level);
    * only the cheap probe/rescore stage re-runs per level. `monotone_ok`
    * is a structural guarantee, not luck: probing p+1 cells scans a
    * strict superset of p cells' candidates, and any candidate outscoring
    * an exact-top-k member would itself be exact-top-k (same tiebreak
    * order) — so hits can never decrease in nProbe, and the gate pins
    * exactly that.
    */
  def ivfRecallCurve(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     nProbes: Seq[Int], nCells: Int = 16, dim: Int = 64,
                     refinePasses: Int = 1): DataFrame = {
    require(nProbes.nonEmpty && nProbes == nProbes.sorted && nProbes.distinct == nProbes,
      "nProbes must be distinct and ascending")
    val (assigned0, centroidsN) =
      kmeansAssign(corpus, idCol, vecCol, nCells, dim, refinePasses)
    val assigned = assigned0.localCheckpoint()
    val exact = bruteForceTopK(corpus, queries, idCol, vecCol, k, dim)
      .select(col("query_id"), col("corpus_id"))
      .withColumn("hit", lit(1L))
    // ONE probe/score/rank pass at max(nProbes) instead of one ivfSearch
    // subplan per level (r17): candidate sets are nested in the probe
    // rank rn, so level p's top-k rank is a running count of rn ≤ p
    // candidates along the SAME (sim desc, corpus_id asc) order the
    // per-level window used — every level's rank column shares one
    // window sort and one exchange, and the per-level join+agg towers
    // (3× the plan, 3× the jobs, 3× the candidate shuffle) collapse
    // into one conditional aggregate. Hit counts are row-for-row the
    // old ones: rank_p ≤ k over rn ≤ p candidates IS the old
    // row_number ≤ k over the p-cell candidate set, same tiebreak.
    val maxP = nProbes.max
    val queriesN = bucketNorm(queries, idCol, vecCol, 0, dim)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qnorm"))
    val queryX = appendCosine(
      queriesN.join(broadcast(centroidsN), lit(true)),
      "qv", "cv", "qnorm", "cnrm", "csim")
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cell").asc)
    val probes = queryX.withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= maxP)
      .select(col("cell"), col("query_id"), col("qv"), col("qnorm"), col("rn"))
    val scored = appendCosine(
      assigned.join(probes, Seq("cell")).filter(col("corpus_id") =!= col("query_id")),
      "cv2", "qv", "cnorm2", "qnorm", "sim")
    val wOrd = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = nProbes.foldLeft(scored) { (df, p) =>
      df.withColumn(s"__rk_$p",
        sum(when(col("rn") <= p, 1L).otherwise(0L)).over(wOrd))
    }
    val hitsRow = ranked
      .join(broadcast(exact), Seq("query_id", "corpus_id"), "left")
      .agg(nProbes.map(p =>
        sum(when(col("rn") <= p && col(s"__rk_$p") <= k &&
          col("hit").isNotNull, 1L).otherwise(0L)).as(s"__h_$p")).head,
        nProbes.map(p =>
          sum(when(col("rn") <= p && col(s"__rk_$p") <= k &&
            col("hit").isNotNull, 1L).otherwise(0L)).as(s"__h_$p")).tail: _*)
    val perProbe = hitsRow.select(explode(array(nProbes.map(p =>
        struct(lit(p).as("n_probe"),
          coalesce(col(s"__h_$p"), lit(0L)).as("n_hits"))): _*)).as("x"))
      .select(col("x.n_probe").as("n_probe"), col("x.n_hits").as("n_hits"))
    // 1-row-per-level frame: the unpartitioned window is over |nProbes| rows.
    val w = Window.orderBy(col("n_probe"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perProbe.withColumn("monotone_ok",
      coalesce(col("n_hits") >= max(col("n_hits")).over(w), lit(true)))
  }

  /** Int8 SCALAR QUANTIZATION of an embedding corpus — the 4×
    * compression that makes a 100 TB vector store hold in a 25 TB one:
    * per-dimension min/max over the corpus (one aggregate pass, a
    * 2·dim-double bounded artifact like a centroid table), then each
    * value maps to `round((v − mn) · levels / (mx − mn))` ∈ [0, levels].
    * Constant dims (mx = mn) code to 0.
    *
    * Returns per-vector integrity stats rather than the raw codes (exact
    * integers, so a SQL oracle can replay the whole transform):
    * `(id, code_sum, code_min, code_max, cos_ok)` where `cos_ok` checks
    * the reconstruction `mn + c·(mx−mn)/levels` stays within `minCosine`
    * of the original — the quantization-error guarantee a retrieval
    * pipeline actually cares about. Codes + reconstruction + cosine run
    * in ONE kernel pass per row (no per-dim column explosion).
    */
  def scalarQuantize(df: DataFrame, idCol: String, vecCol: String,
                     dim: Int = 64, levels: Int = 255,
                     minCosine: Double = 0.995): DataFrame = {
    val minExprs = (0 until dim).map(i =>
      min(element_at(col(vecCol), i + 1).cast("double")).as(s"mn$i"))
    val maxExprs = (0 until dim).map(i =>
      max(element_at(col(vecCol), i + 1).cast("double")).as(s"mx$i"))
    val statsRow = df.agg(minExprs.head, (minExprs.tail ++ maxExprs): _*).head()
    // Empty corpus → null stats; treat every dim as flat at 0 (all rows —
    // there are none — would code to 0) instead of NPEing in getDouble.
    def statAt(i: Int): Double =
      if (statsRow.isNullAt(i)) 0.0 else statsRow.getDouble(i)
    val mns = Array.tabulate(dim)(i => statAt(i))
    val mxs = Array.tabulate(dim)(i => statAt(dim + i))
    val bc = df.sparkSession.sparkContext.broadcast((mns, mxs))
    val schema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("code_sum", LongType, nullable = false),
      StructField("code_min", LongType, nullable = false),
      StructField("code_max", LongType, nullable = false),
      StructField("cos_ok", BooleanType, nullable = false)))
    implicit val enc = Encoders.row(schema)
    df.select(col(idCol), col(vecCol)).mapPartitions { it =>
      val (mn, mx) = bc.value
      it.map { row =>
        val v0 = row.getSeq[Float](1)
        // null/empty embeddings: flag rather than NPE or vacuously pass —
        // (0,0,0,false) marks a vector the quantizer never touched.
        if (v0 == null || v0.isEmpty) Row(row.get(0), 0L, 0L, 0L, false)
        else {
        val v = v0
        val n = math.min(v.length, mn.length)
        var sum = 0L
        var cmin = Long.MaxValue
        var cmax = Long.MinValue
        var dotOR = 0.0
        var nO = 0.0
        var nR = 0.0
        var i = 0
        while (i < n) {
          val x = v(i).toDouble
          val flat = mx(i) == mn(i)
          val c = if (flat) 0L
            else math.round((x - mn(i)) * levels / (mx(i) - mn(i)))
          val recon = if (flat) mn(i)
            else mn(i) + c.toDouble * (mx(i) - mn(i)) / levels
          sum += c
          if (c < cmin) cmin = c
          if (c > cmax) cmax = c
          dotOR += x * recon
          nO += x * x
          nR += recon * recon
          i += 1
        }
        val cos =
          if (nO == 0.0 || nR == 0.0) if (nO == nR) 1.0 else 0.0
          else dotOR / (math.sqrt(nO) * math.sqrt(nR))
        Row(row.get(0), sum, cmin, cmax, cos >= minCosine)
        }
      }
    }(enc)
  }

  // ------------------------------------------------------ product quantization

  /** Product-quantization codebooks (Jégou et al., TPAMI 2011): split the
    * `dim`-dim space into `m` subspaces of dim/m dims; per subspace, up to
    * 16 centroids in INTEGER MICROS, seeded by the 4-bit sign pattern of
    * the subspace's first four dims (the embeddings are zero-mean, so the
    * seeds split the mass) and finished as the per-dim truncating integer
    * mean over the cell's members. Everything integer: micros via
    * round(x·1e6) (portable HALF_UP on both engines), mean via `div`
    * (toward zero on both engines — per-dim sums DO go negative), so the
    * whole codebook — and every distance downstream — hash-gates exactly,
    * with no float fold order anywhere.
    *
    * Scale shape: one partial-aggregable (s, cell, pos) sum over the
    * exploded corpus; the codebook is a bounded artifact (m·16·(dim/m)
    * longs — a broadcast variable, not data).
    *
    * @return (s, cell, pos, cu): subspace, seed cell, GLOBAL 1-based dim,
    *         centroid micros.
    */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int = 8, dim: Int = 64): DataFrame = {
    val vm = transform(col(vecCol), x =>
      round(x.cast("double") * 1e6).cast("long"))
    pqTrainMicros(corpus.select(col(idCol).as("id"), vm.as("vm")), m, dim)
  }

  /** [[pqTrain]] on an already-micros (id, vm: Array[Long]) frame — the
    * entry point [[ivfPqTopK]] uses to train codebooks on RESIDUALS.
    */
  private[graft] def pqTrainMicros(base: DataFrame, m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    require(sub >= 4, "seed bits read the first 4 dims of each subspace")
    val sCol = floor(col("pos") / sub).cast("long")
    val cellExpr = (0 until 4).map { j =>
      when(element_at(col("vm"),
        (sCol * sub + j + 1).cast("int")) >= 0L, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    base.select(col("id"), col("vm"), posexplode(col("vm")))
      .select(sCol.as("s"), cellExpr.as("cell"),
        (col("pos") + 1).cast("long").as("pos"), col("col").as("x"))
      .groupBy(col("s"), col("cell"), col("pos"))
      .agg(count(lit(1)).as("cnt"), sum(col("x")).as("su"))
      .withColumn("cu", expr("su div cnt"))
      .select(col("s"), col("cell"), col("pos"), col("cu"))
  }

  /** PQ asymmetric-distance top-k (ADC): corpus vectors live as m 4-bit
    * codes (nearest codebook centroid per subspace by integer squared L2,
    * tie → lower cell); each query precomputes its m×16 distance table
    * and approximate distance = Σ_s table[s][code_s]. Integer end to end,
    * so ranks and distances gate exactly.
    *
    * Scale shape: codebook + query tables broadcast (a bounded serving
    * batch, like [[bruteForceTopK]]'s query side); encode + ADC run in ONE
    * kernel pass over the corpus (no per-cell row amplification — the
    * 16-way argmin happens in registers); per-query ranking is the
    * k-bounded partial top-k aggregate, so each map task ships ≤ k
    * candidates per query. The corpus is never broadcast, never joined
    * all-pairs, and its vectors cross the wire as m nibbles, not dim
    * floats — the memory form that makes billion-vector serving fit.
    *
    * @return (query_id, rank, corpus_id, adist) — adist in squared micros.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 8, dim: Int = 64,
             maxQueryBatch: Int = DefaultMaxQueryBatch): DataFrame = {
    import graft.functions.TopKAgg
    val sub = dim / m
    val spark = corpus.sparkSession
    val cb = collectCodebook(pqTrain(corpus, idCol, vecCol, m, dim), m, sub)
    // query ADC tables — micros collected from the PLAN (same round() as
    // the corpus; JVM math.round ties differ from SQL HALF_UP on .5).
    // The collect is limit-bounded BEFORE it reaches the driver.
    val qRows = boundedQueryBatch(queries, idCol, vecCol, maxQueryBatch,
      "pqTopKDistributed")
    val qTables = qRows.map { case (qid, q) => (qid, adcTableFlat(q, cb, sub)) }
    val bc = spark.sparkContext.broadcast((cb, qTables))
    implicit val enc = Encoders.row(pairSchema)
    val corpusVm = corpus.select(col(idCol).cast("long").as("id"),
      microsVec(vecCol).as("vm"))
    val pairs = corpusVm
      .repartition(graft.ops.CoreOps.adaptiveWidth(corpusVm))
      .mapPartitions { it =>
        val (cbv, qts) = bc.value
        val mm = cbv.length
        val subv = if (mm == 0) 0 else cbv(0).map(c => if (c == null) 0 else c.length).max
        it.flatMap { r =>
          val id = r.getLong(0)
          val code = encodeSubspaces(r.getSeq[Long](1).toArray, cbv, subv)
          qts.iterator.filter(_._1 != id).map { case (qid, t) =>
            var ad = 0L
            var s2 = 0
            while (s2 < mm) { ad += t(s2 * 16 + code(s2)); s2 += 1 }
            Row(qid, id, ad)
          }
        }
      }(enc)
    pairsTopK(pairs, k)
  }

  /** [[pqTopK]] for UNBOUNDED query sets — evaluation sweeps, corpus-vs-
    * corpus audits — where collecting per-query ADC tables on the driver
    * (the broadcast path's serving-batch shape) would OOM it. The query
    * tables are built by a distributed kernel and never leave the
    * executors; scoring is the same |Q|×|C| work as the broadcast path,
    * shuffled as a cross join instead of driver-held; ranking stays the
    * k-bounded partial top-k. Output is bit-identical to [[pqTopK]]
    * (shared codebook, encode, and ADC helpers — spec-pinned).
    */
  def pqTopKDistributed(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, k: Int, m: Int = 8,
                        dim: Int = 64): DataFrame = {
    val sub = dim / m
    val spark = corpus.sparkSession
    val cb = collectCodebook(pqTrain(corpus, idCol, vecCol, m, dim), m, sub)
    val bcb = spark.sparkContext.broadcast(cb)
    val codeSchema = StructType(Seq(
      StructField("corpus_id", LongType, nullable = false),
      StructField("code", ArrayType(IntegerType, containsNull = false))))
    val codes = {
      implicit val enc = Encoders.row(codeSchema)
      val corpusVm = corpus.select(col(idCol).cast("long").as("id"),
        microsVec(vecCol).as("vm"))
      corpusVm
        .repartition(graft.ops.CoreOps.adaptiveWidth(corpusVm))
        .mapPartitions { it =>
          val cbv = bcb.value
          val subv = cbv(0).map(c => if (c == null) 0 else c.length).max
          it.map { r =>
            Row(r.getLong(0),
              encodeSubspaces(r.getSeq[Long](1).toArray, cbv, subv).toSeq)
          }
        }(enc)
    }
    val tblSchema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("qt", ArrayType(LongType, containsNull = false))))
    val tables = {
      implicit val enc = Encoders.row(tblSchema)
      queries.select(col(idCol).cast("long").as("id"), microsVec(vecCol).as("vm"))
        .mapPartitions { it =>
          val cbv = bcb.value
          val subv = cbv(0).map(c => if (c == null) 0 else c.length).max
          it.map { r =>
            Row(r.getLong(0),
              adcTableFlat(r.getSeq[Long](1).toArray, cbv, subv).toSeq)
          }
        }(enc)
    }
    implicit val penc = Encoders.row(pairSchema)
    val pairs = codes.crossJoin(tables).mapPartitions { it =>
      it.flatMap { r =>
        val cid = r.getLong(0)
        val qid = r.getLong(2)
        if (qid == cid) Iterator.empty
        else {
          val code = r.getSeq[Int](1)
          val qt = r.getSeq[Long](3)
          var ad = 0L
          var s = 0
          while (s < code.length) { ad += qt(s * 16 + code(s)); s += 1 }
          Iterator(Row(qid, cid, ad))
        }
      }
    }(penc)
    pairsTopK(pairs, k)
  }

  /** Driver-side query-batch bound for the broadcast ANN paths: above
    * this, the collect that builds per-query state is refused (the
    * collect itself is limit-bounded, so the refusal happens BEFORE the
    * driver holds the oversized batch) and the error names the
    * distributed variant to use instead.
    */
  val DefaultMaxQueryBatch: Int = 250000

  private def microsVec(vecCol: String): Column =
    transform(col(vecCol), x => round(x.cast("double") * 1e6).cast("long"))

  /** Collect a trained (s, cell, pos, cu) codebook frame into the
    * [s][cell] = centroid-micros array form (null = empty seed cell) —
    * a bounded artifact: m·16·sub longs.
    */
  private def collectCodebook(trained: DataFrame, m: Int,
                              sub: Int): Array[Array[Array[Long]]] = {
    val cb = Array.fill(m, 16)(null: Array[Long])
    trained.collect().foreach { r =>
      val (s, cell, pos) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toInt)
      if (cb(s)(cell) == null) cb(s)(cell) = new Array[Long](sub)
      cb(s)(cell)((pos - 1) % sub) = r.getLong(3)
    }
    cb
  }

  /** Per-subspace argmin-L2 encode (tie → lower cell). Shared by the
    * broadcast and distributed PQ paths so they cannot drift.
    */
  private def encodeSubspaces(v: Array[Long], cbv: Array[Array[Array[Long]]],
                              sub: Int): Array[Int] = {
    val mm = cbv.length
    val code = new Array[Int](mm)
    var s = 0
    while (s < mm) {
      var best = -1
      var bestD = Long.MaxValue
      var c = 0
      while (c < 16) {
        val cent = cbv(s)(c)
        if (cent != null) {
          var d = 0L
          var j = 0
          while (j < sub) {
            val diff = v(s * sub + j) - cent(j); d += diff * diff; j += 1
          }
          if (d < bestD) { bestD = d; best = c }
        }
        c += 1
      }
      code(s) = best
      s += 1
    }
    code
  }

  /** Flat m·16 ADC table for one query (residual): entry s·16+c is the
    * squared L2 between the query's subspace-s slice and centroid c
    * (Long.MaxValue for empty cells). Shared by both PQ paths.
    */
  private def adcTableFlat(q: Array[Long], cbv: Array[Array[Array[Long]]],
                           sub: Int): Array[Long] = {
    val mm = cbv.length
    val t = Array.fill(mm * 16)(Long.MaxValue)
    var s = 0
    while (s < mm) {
      var c = 0
      while (c < 16) {
        val cent = cbv(s)(c)
        if (cent != null) {
          var d = 0L
          var j = 0
          while (j < sub) {
            val diff = q(s * sub + j) - cent(j); d += diff * diff; j += 1
          }
          t(s * 16 + c) = d
        }
        c += 1
      }
      s += 1
    }
    t
  }

  private val pairSchema = StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("corpus_id", LongType, nullable = false),
    StructField("adist", LongType, nullable = false)))

  /** Shared (query_id, corpus_id, adist) → ranked top-k tail. */
  private def pairsTopK(pairs: DataFrame, k: Int): DataFrame = {
    import graft.functions.TopKAgg
    pairs.groupBy(col("query_id"))
      .agg(TopKAgg.topK(k, -col("adist"), col("corpus_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col.id").as("corpus_id"), (-col("col.v")).as("adist"))
  }

  /** Limit-bounded query-micros collect: refuses batches above
    * `maxQueryBatch` BEFORE the driver holds them, naming the
    * distributed variant in the error.
    */
  private def boundedQueryBatch(queries: DataFrame, idCol: String,
                                vecCol: String, maxQueryBatch: Int,
                                distributedVariant: String): Array[(Long, Array[Long])] = {
    val rows = queries
      .select(col(idCol).cast("long").as("id"), microsVec(vecCol).as("vm"))
      .limit(maxQueryBatch + 1).collect()
    require(rows.length <= maxQueryBatch,
      s"query batch exceeds maxQueryBatch=$maxQueryBatch — the broadcast " +
        s"path collects per-query state on the driver (a bounded serving " +
        s"batch); use $distributedVariant for large query sets")
    rows.map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
  }

  /** IVF+PQ — the canonical billion-vector index (FAISS IVFPQ; Jégou et
    * al. 2011 §V): a coarse quantizer partitions the corpus into cells,
    * each vector stores only the PQ code of its RESIDUAL against its
    * cell centroid, and a query probes its `nProbe` nearest cells,
    * building one ADC table per probed cell from the query's
    * cell-relative residual. Everything after the micros conversion is
    * integer — coarse seeds from leading-dim signs, centroids as
    * truncating means, assignment/encode by integer L2 argmin, ADC sums
    * — so the whole index, probes included, hash-gates exactly.
    *
    * Scale shape: centroids and codebooks are bounded collected
    * artifacts (nCells·dim + m·16·dim/m longs — broadcast-variable
    * class); assignment+residual and encode+ADC each run as ONE kernel
    * pass over the corpus; per-query work is nProbe cells' candidates,
    * not the corpus; per-vector storage is log2(nCells) bits + m
    * nibbles. Ranking is the k-bounded partial top-k.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
                m: Int = 8, dim: Int = 64,
                maxQueryBatch: Int = DefaultMaxQueryBatch): DataFrame = {
    val sub = dim / m
    val spark = corpus.sparkSession
    val (cc, resid, cb) = buildIvfPqIndex(corpus, idCol, vecCol, nCells, m, dim)
    // probes + per-probed-cell ADC tables, from the PLAN's micros; the
    // collect is limit-bounded BEFORE it reaches the driver
    val qRows = boundedQueryBatch(queries, idCol, vecCol, maxQueryBatch,
      "ivfPqTopKDistributed")
    val cellToQueries: Map[Int, Array[(Long, Array[Long])]] = qRows
      .flatMap { case (qid, qv) =>
        probeTables(qv, cc, cb, nCells, nProbe, dim, sub)
          .map { case (c, t) => (c, (qid, t)) }
      }.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
    val bq = spark.sparkContext.broadcast((cb, cellToQueries))
    implicit val penc = Encoders.row(pairSchema)
    val pairs = resid.mapPartitions { it =>
      val (cbv, c2q) = bq.value
      val mm = cbv.length
      it.flatMap { r =>
        val id = r.getLong(0)
        val probers = c2q.getOrElse(r.getLong(1).toInt,
          Array.empty[(Long, Array[Long])])
        if (probers.isEmpty) Iterator.empty
        else {
          val code = encodeSubspaces(r.getSeq[Long](2).toArray, cbv, sub)
          probers.iterator.filter(_._1 != id).map { case (qid, t) =>
            var ad = 0L
            var s2 = 0
            while (s2 < mm) { ad += t(s2 * 16 + code(s2)); s2 += 1 }
            Row(qid, id, ad)
          }
        }
      }
    }(penc)
    pairsTopK(pairs, k)
  }

  /** [[ivfPqTopK]] for UNBOUNDED query sets: per-query probe state is
    * built by a distributed kernel (centroids + codebooks broadcast —
    * they are the bounded artifacts; the QUERIES never leave the
    * executors), and candidates meet their probers through an equi-join
    * on the coarse cell — the shuffle key a cell-partitioned ANN serving
    * layout would use at 100 TB. Output is bit-identical to the
    * broadcast path (shared index build, probe, encode, and ADC helpers
    * — spec-pinned).
    */
  def ivfPqTopKDistributed(corpus: DataFrame, queries: DataFrame,
                           idCol: String, vecCol: String, k: Int,
                           nCells: Int = 16, nProbe: Int = 4,
                           m: Int = 8, dim: Int = 64): DataFrame = {
    val sub = dim / m
    val spark = corpus.sparkSession
    val (cc, resid, cb) = buildIvfPqIndex(corpus, idCol, vecCol, nCells, m, dim)
    val bIdx = spark.sparkContext.broadcast((cc, cb))
    // corpus side: one encode pass over the residuals -> (cell, corpus_id, code)
    val codeSchema = StructType(Seq(
      StructField("cell", LongType, nullable = false),
      StructField("corpus_id", LongType, nullable = false),
      StructField("code", ArrayType(IntegerType, containsNull = false))))
    val codes = {
      implicit val enc = Encoders.row(codeSchema)
      resid.mapPartitions { it =>
        val cbv = bIdx.value._2
        it.map { r =>
          Row(r.getLong(1), r.getLong(0),
            encodeSubspaces(r.getSeq[Long](2).toArray, cbv, sub).toSeq)
        }
      }(enc)
    }
    // query side: nProbe (cell, query_id, table) rows per query, distributed
    val tblSchema = StructType(Seq(
      StructField("cell", LongType, nullable = false),
      StructField("query_id", LongType, nullable = false),
      StructField("qt", ArrayType(LongType, containsNull = false))))
    val probes = {
      implicit val enc = Encoders.row(tblSchema)
      queries.select(col(idCol).cast("long").as("id"), microsVec(vecCol).as("vm"))
        .mapPartitions { it =>
          val (ccv, cbv) = bIdx.value
          it.flatMap { r =>
            val qid = r.getLong(0)
            probeTables(r.getSeq[Long](1).toArray, ccv, cbv,
                ccv.length, nProbe, ccv.filter(_ != null).head.length, sub)
              .iterator.map { case (c, t) => Row(c.toLong, qid, t.toSeq) }
          }
        }(enc)
    }
    implicit val penc = Encoders.row(pairSchema)
    val pairs = codes.join(probes, "cell").mapPartitions { it =>
      it.flatMap { r =>
        val cid = r.getLong(1)
        val qid = r.getLong(3)
        if (qid == cid) Iterator.empty
        else {
          val code = r.getSeq[Int](2)
          val qt = r.getSeq[Long](4)
          var ad = 0L
          var s = 0
          while (s < code.length) { ad += qt(s * 16 + code(s)); s += 1 }
          Iterator(Row(qid, cid, ad))
        }
      }
    }(penc)
    pairsTopK(pairs, k)
  }

  /** Persist a frozen IVF+PQ index as parquet state tables — the
    * nightly-embedding-ingest shape at 100 TB: train once on the standing
    * corpus, then every new batch assigns/encodes against the FROZEN
    * centroids+codebooks ([[ivfPqAssignToState]]) and searches run over
    * the persisted postings ([[ivfPqSearchState]]) without ever
    * re-scanning, let alone re-training on, the historical vectors.
    * (FAISS calls the same split "train once, add forever"; re-training
    * per batch would re-read the whole corpus nightly.)
    *
    * Layout under `stateDir`:
    *  - `centroids`: (cell, cv) — the ≤ nCells coarse centroids (micros);
    *  - `codebooks`: (s, cell, cu) — the m×16 PQ sub-centroids trained on
    *    the corpus residuals;
    *  - `postings`: (cell, corpus_id, code) — every corpus vector as its
    *    coarse cell + m 4-bit residual codes (log2(nCells) bits + m
    *    nibbles per vector, the serving footprint).
    */
  def writeIvfPqState(corpus: DataFrame, idCol: String, vecCol: String,
                      stateDir: String, nCells: Int = 16, m: Int = 8,
                      dim: Int = 64): Unit = {
    val sub = dim / m
    val spark = corpus.sparkSession
    val (cc, resid, cb) = buildIvfPqIndex(corpus, idCol, vecCol, nCells, m, dim)
    spark.createDataFrame(
      java.util.Arrays.asList(cc.zipWithIndex.collect {
        case (cv, cell) if cv != null => Row(cell.toLong, cv.toSeq)
      }: _*),
      StructType(Seq(
        StructField("cell", LongType, nullable = false),
        StructField("cv", ArrayType(LongType, containsNull = false)))))
      .repartition(1).write.mode("overwrite").parquet(stateDir + "/centroids")
    spark.createDataFrame(
      java.util.Arrays.asList((for {
        s <- cb.indices; c <- 0 until 16 if cb(s)(c) != null
      } yield Row(s.toLong, c.toLong, cb(s)(c).toSeq)): _*),
      StructType(Seq(
        StructField("s", LongType, nullable = false),
        StructField("cell", LongType, nullable = false),
        StructField("cu", ArrayType(LongType, containsNull = false)))))
      .repartition(1).write.mode("overwrite").parquet(stateDir + "/codebooks")
    val bcb = spark.sparkContext.broadcast(cb)
    implicit val enc = Encoders.row(postingSchema)
    resid.mapPartitions { it =>
      val cbv = bcb.value
      it.map { r =>
        Row(r.getLong(1), r.getLong(0),
          encodeSubspaces(r.getSeq[Long](2).toArray, cbv, sub).toSeq)
      }
    }(enc).write.mode("overwrite").parquet(stateDir + "/postings")
  }

  private val postingSchema = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("corpus_id", LongType, nullable = false),
    StructField("code", ArrayType(IntegerType, containsNull = false))))

  /** Read the frozen index model back: (centroids by cell, codebook
    * [s][cell], dim, sub) — bounded artifacts (nCells·dim + m·16·sub
    * longs, the broadcast-variable class), collected once per caller.
    *
    * Geometry (nCells, m, dim, sub) is DERIVED from the persisted rows,
    * never trusted from the caller: a parameter smaller than what the
    * state was written with used to surface as a raw
    * ArrayIndexOutOfBounds deep in the kernel. Empty/missing state now
    * fails fast with a named message instead of a kernel
    * NoSuchElementException.
    */
  private def readIvfPqModel(spark: SparkSession, stateDir: String)
      : (Array[Array[Long]], Array[Array[Array[Long]]], Int, Int) = {
    val centRows = spark.read.parquet(stateDir + "/centroids").collect()
    require(centRows.nonEmpty,
      s"ivfpq state at $stateDir/centroids is empty — index was never " +
        "written or the dir is wrong")
    val nCells = centRows.iterator.map(_.getLong(0).toInt).max + 1
    val cc = Array.fill(nCells)(null: Array[Long])
    centRows.foreach { r => cc(r.getLong(0).toInt) = r.getSeq[Long](1).toArray }
    val dim = centRows.head.getSeq[Long](1).length
    val cbRows = spark.read.parquet(stateDir + "/codebooks").collect()
    require(cbRows.nonEmpty,
      s"ivfpq state at $stateDir/codebooks is empty — index was never " +
        "written or the dir is wrong")
    val m = cbRows.iterator.map(_.getLong(0).toInt).max + 1
    val cb = Array.fill(m, 16)(null: Array[Long])
    cbRows.foreach { r =>
      cb(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getSeq[Long](2).toArray
    }
    val sub = cbRows.head.getSeq[Long](2).length
    require(m * sub == dim,
      s"ivfpq state at $stateDir inconsistent: m=$m subspaces of width " +
        s"$sub != centroid dim $dim")
    (cc, cb, dim, sub)
  }

  /** Assign + encode ONLY the new batch against the frozen state: one
    * kernel pass over the batch (nearest frozen centroid → residual →
    * per-subspace argmin codes), with the model broadcast. Returns new
    * postings rows (cell, corpus_id, code) — append them to
    * `stateDir/postings` (or pass straight to [[ivfPqSearchState]]); the
    * historical vectors are never touched. Parameters must match the
    * ones the state was written with.
    */
  def ivfPqAssignToState(batch: DataFrame, stateDir: String, idCol: String,
                         vecCol: String, nCells: Int = 16, m: Int = 8,
                         dim: Int = 64): DataFrame = {
    val spark = batch.sparkSession
    val (cc, cb, dimS, sub) = readIvfPqModel(spark, stateDir)
    require(dimS == dim && cb.length == m,
      s"caller declared dim=$dim m=$m but state at $stateDir was written " +
        s"with dim=$dimS m=${cb.length}")
    val bm = spark.sparkContext.broadcast((cc, cb))
    implicit val enc = Encoders.row(postingSchema)
    batch.select(col(idCol).cast("long").as("id"), microsVec(vecCol).as("vm"))
      .mapPartitions { it =>
        val (ccv, cbv) = bm.value
        it.map { r =>
          val v = r.getSeq[Long](1).toArray
          var best = -1; var bestD = Long.MaxValue; var c = 0
          while (c < ccv.length) {
            if (ccv(c) != null) {
              var d = 0L; var i = 0
              while (i < v.length) { val x = v(i) - ccv(c)(i); d += x * x; i += 1 }
              if (d < bestD) { bestD = d; best = c }
            }
            c += 1
          }
          val cent = ccv(best)
          val rm = new Array[Long](v.length)
          var i = 0
          while (i < v.length) { rm(i) = v(i) - cent(i); i += 1 }
          Row(best.toLong, r.getLong(0), encodeSubspaces(rm, cbv, sub).toSeq)
        }
      }(enc)
  }

  /** ADC top-k over the PERSISTED postings plus optionally a
    * just-ingested batch's postings — the serving read of the
    * incremental index. Probe state is built by a distributed kernel
    * from the frozen model (queries never leave the executors), and
    * candidates meet probers through the coarse-cell equi-join, exactly
    * the [[ivfPqTopKDistributed]] shape — but the corpus side is the m-
    * nibble postings scan, so the plan provably reads batch vectors +
    * state tables and nothing else (plan-asserted in PlanAuditSpec).
    */
  def ivfPqSearchState(queries: DataFrame, stateDir: String,
                       extraPostings: Option[DataFrame], idCol: String,
                       vecCol: String, k: Int, nCells: Int = 16,
                       nProbe: Int = 4, m: Int = 8,
                       dim: Int = 64): DataFrame = {
    val spark = queries.sparkSession
    val (cc, cb, dimS, sub) = readIvfPqModel(spark, stateDir)
    require(dimS == dim && cb.length == m,
      s"caller declared dim=$dim m=$m but state at $stateDir was written " +
        s"with dim=$dimS m=${cb.length}")
    val bm = spark.sparkContext.broadcast((cc, cb, dimS))
    val postings = extraPostings.foldLeft(
      spark.read.parquet(stateDir + "/postings"))(_ unionByName _)
    val tblSchema = StructType(Seq(
      StructField("cell", LongType, nullable = false),
      StructField("query_id", LongType, nullable = false),
      StructField("qt", ArrayType(LongType, containsNull = false))))
    val probes = {
      implicit val enc = Encoders.row(tblSchema)
      queries.select(col(idCol).cast("long").as("id"), microsVec(vecCol).as("vm"))
        .mapPartitions { it =>
          val (ccv, cbv, dimv) = bm.value
          it.flatMap { r =>
            val qid = r.getLong(0)
            probeTables(r.getSeq[Long](1).toArray, ccv, cbv,
                ccv.length, nProbe, dimv, sub)
              .iterator.map { case (c, t) => Row(c.toLong, qid, t.toSeq) }
          }
        }(enc)
    }
    implicit val penc = Encoders.row(pairSchema)
    val pairs = postings.join(probes, "cell").mapPartitions { it =>
      it.flatMap { r =>
        val cid = r.getLong(1)
        val qid = r.getLong(3)
        if (qid == cid) Iterator.empty
        else {
          val code = r.getSeq[Int](2)
          val qt = r.getSeq[Long](4)
          var ad = 0L
          var s = 0
          while (s < code.length) { ad += qt(s * 16 + code(s)); s += 1 }
          Iterator(Row(qid, cid, ad))
        }
      }
    }(penc)
    pairsTopK(pairs, k)
  }

  /** Shared IVF+PQ index build: coarse centroids (seeded by leading-dim
    * signs, one truncating-mean Lloyd step), cell-relative residuals
    * (localCheckpointed — codebook agg and encode both read them), and
    * PQ codebooks trained on the residuals. Centroids and codebooks are
    * bounded collected artifacts (nCells·dim + m·16·sub longs).
    *
    * @return (centroids by cell (null = empty), resid frame
    *         (id, cell, vm=residual micros), codebook [s][cell])
    */
  private def buildIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                              nCells: Int, m: Int, dim: Int):
      (Array[Array[Long]], DataFrame, Array[Array[Array[Long]]]) = {
    require(nCells > 1 && (nCells & (nCells - 1)) == 0, "nCells must be a power of 2")
    val cplanes = java.lang.Integer.numberOfTrailingZeros(nCells)
    require(cplanes <= dim, "more coarse planes than dims")
    val sub = dim / m
    val spark = corpus.sparkSession
    val base = corpus.select(col(idCol).cast("long").as("id"), microsVec(vecCol).as("vm"))
    // coarse seeds: leading-dim signs; centroids: truncating micro means
    val seedCell = (0 until cplanes).map { j =>
      when(element_at(col("vm"), j + 1) >= 0L, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val cc = Array.fill(nCells)(null: Array[Long])
    base.select(seedCell.as("cell"), posexplode(col("vm")))
      .groupBy(col("cell"), col("pos"))
      .agg(count(lit(1)).as("cnt"), sum(col("col")).as("su"))
      .withColumn("cu", expr("su div cnt"))
      .collect().foreach { r =>
        val cell = r.getLong(0).toInt
        if (cc(cell) == null) cc(cell) = new Array[Long](dim)
        cc(cell)(r.getInt(1)) = r.getAs[Long]("cu")
      }
    // one Lloyd step: reassign to nearest centroid, keep residuals
    val bcc = spark.sparkContext.broadcast(cc)
    val residSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("cell", LongType, nullable = false),
      StructField("vm", ArrayType(LongType))))
    implicit val renc = Encoders.row(residSchema)
    val resid = base.mapPartitions { it =>
      val cents = bcc.value
      def near(v: Array[Long]): Int = {
        var best = -1; var bestD = Long.MaxValue; var c = 0
        while (c < cents.length) {
          if (cents(c) != null) {
            var d = 0L; var i = 0
            while (i < v.length) { val x = v(i) - cents(c)(i); d += x * x; i += 1 }
            if (d < bestD) { bestD = d; best = c }
          }
          c += 1
        }
        best
      }
      it.map { r =>
        val v = r.getSeq[Long](1).toArray
        val cell = near(v)
        val cent = cents(cell)
        val rm = new Array[Long](v.length)
        var i = 0
        while (i < v.length) { rm(i) = v(i) - cent(i); i += 1 }
        Row(r.getLong(0), cell.toLong, rm.toSeq)
      }
    }(renc).localCheckpoint() // codebook agg + encode both read it
    val cb = collectCodebook(
      pqTrainMicros(resid.select(col("id"), col("vm")), m, dim), m, sub)
    (cc, resid, cb)
  }

  /** A query's nProbe nearest non-empty cells (tie -> lower cell), each
    * with the flat ADC table of the query's CELL-RELATIVE residual.
    * Shared by the broadcast and distributed IVF+PQ paths.
    */
  private def probeTables(qv: Array[Long], cc: Array[Array[Long]],
                          cb: Array[Array[Array[Long]]], nCells: Int,
                          nProbe: Int, dim: Int,
                          sub: Int): Seq[(Int, Array[Long])] = {
    require(nProbe >= 1 && nProbe <= nCells, "nProbe in [1, nCells]")
    val byDist = (0 until nCells).filter(cc(_) != null).map { c =>
      var d = 0L; var i = 0
      while (i < dim) { val x = qv(i) - cc(c)(i); d += x * x; i += 1 }
      (d, c)
    }.sorted.take(nProbe)
    byDist.map { case (_, c) =>
      val qres = Array.tabulate(dim)(i => qv(i) - cc(c)(i))
      (c, adcTableFlat(qres, cb, sub))
    }
  }

  /** Johnson–Lindenstrauss random projection to `outDims` dimensions with
    * the deterministic ±1 planes of [[planesArr]] (Achlioptas 2003: a
    * Rademacher projection matrix preserves pairwise distances within
    * 1 ± ε at outDims = O(log n / ε²)) — the dimensionality-reduction
    * front-end that makes downstream ANN exchange `outDims` longs per
    * vector instead of `dim` floats. Output components are
    * floor(1e6·Σᵢ vᵢ·±1) longs, so reduced-space L2 is pure integer
    * arithmetic any engine replays bit-for-bit.
    *
    * One mapPartitions kernel pass (outDims·dim multiply-adds per row, no
    * per-component column explosion), carrying `extra` columns through.
    */
  def jlProject(df: DataFrame, idCol: String, vecCol: String,
                outDims: Int, dim: Int = 64,
                extra: Seq[String] = Nil): DataFrame = {
    require(outDims >= 1, "outDims must be positive")
    val in = df.select(col(idCol).as("id") +: col(vecCol).as("v") +:
      extra.map(col): _*)
    val idType = df.schema(idCol).dataType
    val outSchema = StructType(Seq(
      StructField("id", idType),
      StructField("rv", ArrayType(LongType, containsNull = false))) ++
      extra.map(c => df.schema(c)))
    val pl = planesArr(outDims, dim)
    implicit val enc = Encoders.row(outSchema)
    in.mapPartitions { it =>
      it.map { r =>
        val v = r.getSeq[Float](1)
        val rv = new Array[Long](outDims)
        var p = 0
        while (p < outDims) {
          var s = 0.0
          var i = 0
          val n = math.min(v.length, dim)
          while (i < n) { s += v(i).toDouble * pl(p)(i); i += 1 }
          rv(p) = math.floor(s * 1000000.0).toLong
          p += 1
        }
        Row.fromSeq(Seq(r.get(0), rv.toSeq) ++ (2 until r.length).map(r.get))
      }
    }(enc)
  }

  /** k-Center greedy coreset selection (farthest-first traversal; Sener &
    * Savarese, "Active Learning for CNNs: A Core-Set Approach", ICLR
    * 2018): pick `k` vectors such that every corpus vector is close to
    * some pick — each step adds the vector FARTHEST from the current
    * picks (max over corpus of min distance to chosen). The dataset-
    * distillation / diverse-subset primitive, dual to MMR (coverage, not
    * query relevance).
    *
    * Fully distributed: every step is ONE corpus scan with the ≤ k chosen
    * vectors broadcast in the closure + a TakeOrdered(1) — the corpus is
    * never collected and never pairwise-joined, so the cost is O(k·n·dim)
    * scan work, the standard cluster form. Distances are integer L2 over
    * floor-micro components (any engine replays them bit-for-bit); ties
    * break to the smaller id. Seeded at the corpus's smallest id.
    *
    * Returns (step, id, dmin) — dmin the pick's distance to the
    * previously chosen set (0 for the seed).
    */
  def kCenterGreedy(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int, dim: Int = 64): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = corpus.sparkSession
    import spark.implicits._
    val m = corpus
      .select(col(idCol).cast("long").as("id"), microsVec(vecCol).as("vm"))
      .as[(Long, Array[Long])]
    val seed = m.orderBy(col("id")).limit(1).collect().head
    val chosen = scala.collection.mutable.ArrayBuffer[(Long, Array[Long])](seed)
    val picks = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]((1, seed._1, 0L))
    for (step <- 2 to k) {
      val cb = spark.sparkContext.broadcast(chosen.toArray)
      // Exclude already-chosen ids: when every remaining point duplicates a
      // chosen one (max dmin = 0) the scan must still pick a FRESH id, the
      // same NOT IN semantics the oracle uses.
      val chosenIds = chosen.map(_._1).toSet
      val far = m.filter(r => !chosenIds.contains(r._1)).map { case (id, vm) =>
        var best = Long.MaxValue
        val cs = cb.value
        var c = 0
        while (c < cs.length) {
          var d = 0L
          var i = 0
          val cv = cs(c)._2
          val n = math.min(vm.length, cv.length)
          while (i < n) { val x = vm(i) - cv(i); d += x * x; i += 1 }
          if (d < best) best = d
          c += 1
        }
        (id, vm, best)
      }.toDF("id", "vm", "dmin")
        .orderBy(col("dmin").desc, col("id"))
        .limit(1).as[(Long, Array[Long], Long)].collect().head
      chosen += ((far._1, far._2))
      picks += ((step, far._1, far._3))
      cb.destroy()
    }
    picks.toSeq.toDF("step", "id", "dmin")
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
    * 1998): pick `k` results greedily from the `topN` most-relevant
    * candidates, each step maximizing
    * `relW·rel − divW·max(sim to already-chosen)` — the standard
    * relevance/diversity trade-off behind RAG context selection and
    * diversified search (relW/divW is λ/(1−λ) scaled to integers).
    *
    * Scale shape: relevance is ONE distributed kernel pass over the corpus
    * (query vector broadcast in the closure) + a TakeOrdered top-`topN` —
    * the corpus is never collected or pairwise-joined. Only the `topN`
    * candidates (a bounded serving artifact, `require`d ≤ 4096 like the
    * other broadcast-path guards) reach the driver, where the O(topN²)
    * pairwise similarities and the O(k·topN) greedy loop run on ≤ 4096
    * rows. All scores are floor(cosine·1e6) longs with the same fold order
    * as a list_reduce, so any ANSI engine replays every pick bit-for-bit;
    * ties break to the smaller id via the `score·1e6 − id` composite key.
    *
    * Returns (step, id, rel) for steps 1..k in pick order.
    */
  def mmrRerank(corpus: DataFrame, queryVec: Array[Float], idCol: String,
                vecCol: String, topN: Int, k: Int,
                relW: Long, divW: Long): DataFrame = {
    require(topN >= k && k >= 1, "need topN >= k >= 1")
    require(topN <= 4096, "topN is a driver-held candidate batch; keep it bounded")
    val spark = corpus.sparkSession
    import spark.implicits._

    def cosMicros(a: Seq[Float], b: Seq[Float]): Long = {
      // Three separate index-order folds + one divide, exactly the SQL
      // cosine's shape — never a fused/reordered accumulation.
      var d = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { d += a(i).toDouble * b(i).toDouble; i += 1 }
      var na = 0.0; i = 0
      while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
      var nb = 0.0; i = 0
      while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
      val nn = math.sqrt(na) * math.sqrt(nb)
      val c = if (nn == 0.0) 0.0 else d / nn
      math.floor(c * 1000000.0).toLong
    }

    val q = spark.sparkContext.broadcast(queryVec)
    val cand = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .as[(Long, Seq[Float])]
      .map { case (id, v) => (id, v, cosMicros(v, q.value.toSeq)) }
      .toDF("id", "v", "rel")
      .orderBy(col("rel").desc, col("id"))
      .limit(topN)
      .as[(Long, Seq[Float], Long)].collect()

    val ids = cand.map(_._1)
    val rels = cand.map(_._3)
    val vecs = cand.map(_._2)
    val nC = cand.length
    val sims = Array.tabulate(nC, nC)((i, j) =>
      if (i == j) Long.MinValue else cosMicros(vecs(i), vecs(j)))

    val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
    val picks = (1 to math.min(k, nC)).map { step =>
      val best =
        if (chosen.isEmpty) {
          // step 1: pure relevance, ties to the smaller id
          (0 until nC).maxBy(i => (rels(i), -ids(i)))
        } else {
          (0 until nC).filterNot(chosen.contains).maxBy { i =>
            val maxSim = chosen.map(j => sims(i)(j)).max
            (relW * rels(i) - divW * maxSim) * 1000000L - ids(i)
          }
        }
      chosen += best
      (step, ids(best), rels(best))
    }
    picks.toDF("step", "id", "rel")
  }
}

