package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass scorer backing [[QualityScore]]: computes, in a single scan
  * over the string, the four counts the composite quality formula needs —
  * code points, punctuation code points, whitespace-split tokens, stopword
  * tokens — then combines them with EXACTLY the double arithmetic of the
  * original column formula (`TextOps.qualityScoreHof`), so results are
  * bit-identical and every existing DuckDB oracle replays unchanged.
  *
  * Replicated semantics, pinned by TextOpsSpec's parity property:
  *   - tokens: `split(text, " ")` with Java's -1 limit — consecutive
  *     spaces yield empty tokens, a trailing space yields a trailing empty
  *     token, "" splits to [""] (so the token count is never 0 and the
  *     zero-guard branch of the HOF form is dead there too);
  *   - stopword test: exact case-sensitive equality;
  *   - punctuation: code points outside [A-Za-z0-9 ] (the regex class is
  *     per-code-point, as is Spark's length()).
  */
final class QualityScorer(stopwords: Seq[String]) extends Serializable {
  private val stops = new java.util.HashSet[String](stopwords.size * 2)
  stopwords.foreach(stops.add)
  private val maxStopLen =
    if (stopwords.isEmpty) 0 else stopwords.map(_.length).max

  def score(u: UTF8String): Double = {
    val str = u.toString
    var nCp = 0        // code points = Spark length()
    var nPunct = 0     // code points not in [A-Za-z0-9 ]
    var nTok = 0       // whitespace-split segments (limit -1 semantics)
    var nStop = 0
    var tokStart = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      nCp += 1
      if (cp == ' ') {
        nTok += 1
        if (i - tokStart <= maxStopLen &&
            stops.contains(str.substring(tokStart, i))) nStop += 1
        tokStart = i + 1
      } else if (!((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
          (cp >= '0' && cp <= '9'))) {
        nPunct += 1
      }
      i += Character.charCount(cp)
    }
    nTok += 1 // final segment (possibly empty)
    if (str.length - tokStart <= maxStopLen &&
        stops.contains(str.substring(tokStart))) nStop += 1

    // The EXACT double ops of the column form, in its left-assoc order.
    val lenScore = math.min(nCp.toDouble / 500.0, 1.0)
    val stopRatio =
      if (nTok == 0) 0.0 else nStop.toDouble / nTok.toDouble // nTok >= 1
    val stopScore = 1.0 - math.abs(stopRatio - 0.3)
    val punctRatio = if (nCp == 0) 0.0 else nPunct.toDouble / nCp.toDouble
    val punctPenalty = 1.0 - punctRatio
    lenScore * 0.4 + stopScore * 0.4 + punctPenalty * 0.2
  }
}

/** `quality_score(text, 'stop1', 'stop2', ...)` — the composite document
  * quality score in [0,1] (length / stopword-ratio / punctuation-density
  * mix) as ONE codegen'd pass.
  *
  * Why a custom expression (SURVEY.md §7.3, same argument as [[CharHash]]):
  * the column form materializes three token arrays per row and evaluates
  * its `filter` lambda interpreted (higher-order functions never enter
  * whole-stage codegen), plus a regex engine pass for the punctuation
  * class — measured ~1.2 ms/doc at sf1, which made quality scoring the
  * bottleneck of every curation query it feeds. This form is one
  * allocation-free scan, ~30× cheaper, and null-intolerant so filters
  * push around it.
  */
case class QualityScore(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  @transient private lazy val scorer = new QualityScorer(stopwords)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quality_score requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quality_score"

  override protected def nullSafeEval(input: Any): Any =
    scorer.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qualityScorer", scorer,
      classOf[QualityScorer].getName)
    defineCodeGen(ctx, ev, c => s"$ref.score($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityScore =
    copy(child = newChild)
}
