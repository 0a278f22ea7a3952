package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{CoreOps, EntityResolution}
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

    // AllPairs/PPJoin prefix-filtering similarity self-join over trigram
    // shingle sets at Jaccard ≥ 0.7: candidates must share one of each
    // doc's RAREST trigrams (global-frequency order), so the candidate
    // join fans out by rare-token df instead of hot-token df — 28
    // candidate pairs at sf0.01 where all-pairs would be 12.5M. Exact
    // verify via integer cross-multiplied Jaccard; per-lang rollup.
    "q187_prefix_simjoin" -> ((s, dir) => {
      val r = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
        .withColumn("ts", when(size(col("toks")) >= 3, array_distinct(expr(
          "transform(sequence(1, size(toks) - 2)," +
          " i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1)," +
          " element_at(toks, i + 2)))"))).otherwise(expr("array()")))
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
    }))

  /** q27's portable rolling-hash fingerprint as DuckDB SQL. */
  private def fpSql(s: String) =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split($s, ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (acc, c) -> (acc * 31 + c) % 1000000007)""".stripMargin

  val oracles: Map[String, String] = Map(

    // Replays the prefix filter from first principles: trigram sets,
    // global (df, token) order, integer-ceil prefix length, candidate =
    // shared prefix token, exact Jaccard ≥ 7/10 by cross-multiplication.
    "q187_prefix_simjoin" ->
      """WITH t0 AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
        |            FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    list_distinct(list_transform(range(1, len(toks)-1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ts
        |  FROM t0),
        |r2 AS (SELECT * FROM r WHERE len(ts) >= 1),
        |tok AS (SELECT doc_id, unnest(ts) AS t FROM r2),
        |freq AS (SELECT t, count(*) AS df FROM tok GROUP BY 1),
        |ord AS (
        |  SELECT tok.doc_id, tok.t,
        |    row_number() OVER (PARTITION BY tok.doc_id ORDER BY df, tok.t) AS rn,
        |    count(*) OVER (PARTITION BY tok.doc_id) AS s
        |  FROM tok JOIN freq USING (t)),
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
