package graft.enrich

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Enrichment operators — the heart of the reference pipeline (SURVEY.md
  * §2.11): translate (U1), sentiment (U2, Comprehend batch-25 protocol),
  * claim-worthiness (U3, per-row with error→0.0). The sandbox has no network,
  * so scorers are deterministic pure functions behind the [[TextScorer]]
  * trait; a real HTTP client drops in without touching the plan shape.
  *
  * Two execution styles, both executor-side (the reference's `toPandas()`
  * driver collapse — `glue/twitter_glue.py:161` — is exactly what we refuse
  * to reproduce):
  *  - column expressions for scorers expressible in SQL (oracle-checkable);
  *  - [[batchEnrich]]: `mapPartitions` with `grouped(batchSize)` preserving
  *    the reference's batch-of-25 call economics (`glue/reddit_glue.py:162`)
  *    and structural row alignment — no positional re-join (J1 hazard).
  */
object Enrich {

  /** U1 — translate-to-English stand-in: deterministic character
    * transliteration (identity for ASCII). `translate` is codegen'd.
    */
  def translateCol(text: Column): Column =
    translate(text, "áàâäéèêëíìîïóòôöúùûüñç", "aaaaeeeeiiiioooouuuunc")

  /** U2 — lexicon sentiment as pure expressions: four scores in [0,1] from
    * positive/negative marker-token counts over whitespace tokens.
    * positive = p/(p+n+1), negative = n/(p+n+1), the rest normalized so the
    * four sum to 1 like Comprehend's output (`glue/twitter_glue.py:127-133`).
    */
  def sentimentScores(text: Column, positive: Seq[String], negative: Seq[String])
      : Seq[(String, Column)] = {
    val toks = split(text, " ")
    def count(words: Seq[String]): Column = {
      val isIn = words.map(w => (t: Column) => t === lit(w))
        .reduce((f, g) => (t: Column) => f(t) || g(t))
      size(filter(toks, isIn)).cast("double")
    }
    val p = count(positive)
    val n = count(negative)
    val denom = p + n + lit(1.0)
    Seq(
      "Positive" -> (p / denom),
      "Negative" -> (n / denom),
      "Neutral" -> (lit(1.0) / denom),
      "Mixed" -> lit(0.0))
  }

  /** U3 — claim-worthiness stand-in: deterministic text statistic in [0,1)
    * (char-length mix mod 1000 / 1000), error/empty → 0.0 like the
    * reference's try/except (`glue/reddit_glue.py:187-196`).
    */
  def claimScore(text: Column): Column =
    when(text.isNull || length(text) === 0, lit(0.0))
      .otherwise(((length(text) * lit(31L) + size(split(text, " ")) * lit(7L)) % 1000L)
        .cast("double") / lit(1000.0))

  /** Pluggable batch scorer: one call scores a batch of texts, returning one
    * row of doubles per input (order-preserving). Mirrors the Comprehend
    * batch API shape.
    */
  trait TextScorer extends Serializable {
    def fieldNames: Seq[String]
    def scoreBatch(texts: Seq[String]): Seq[Seq[Double]]
  }

  /** Deterministic lexicon scorer (offline stand-in for Comprehend). */
  class LexiconScorer(positive: Set[String], negative: Set[String]) extends TextScorer {
    val fieldNames = Seq("Positive", "Negative", "Neutral", "Mixed")
    def scoreBatch(texts: Seq[String]): Seq[Seq[Double]] = texts.map { t =>
      val toks = Option(t).getOrElse("").split(" ")
      val p = toks.count(positive).toDouble
      val n = toks.count(negative).toDouble
      val d = p + n + 1.0
      Seq(p / d, n / d, 1.0 / d, 0.0)
    }
  }

  /** Batched enrichment via mapPartitions: groups `batchSize` rows per scorer
    * call (the reference's 25-doc Comprehend batching), appends the scorer's
    * fields to each row. Rows never leave their partition, so alignment is
    * structural — the positional-sort hazard of `glue/reddit_glue.py:180`
    * cannot occur. Scales to any partition count; state is per-batch only.
    */
  def batchEnrich(df: DataFrame, textCol: String, scorer: TextScorer,
                  batchSize: Int = 25): DataFrame = {
    val outSchema = StructType(df.schema.fields ++
      scorer.fieldNames.map(f => StructField(f, DoubleType, nullable = false)))
    val textIdx = df.schema.fieldIndex(textCol)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val scores = scorer.scoreBatch(batch.map(r => r.getString(textIdx)))
        batch.iterator.zip(scores.iterator).map { case (r, s) =>
          Row.fromSeq(r.toSeq ++ s)
        }
      }
    }(enc)
  }
}
