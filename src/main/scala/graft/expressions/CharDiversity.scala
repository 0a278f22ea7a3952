package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-code-point histogram stats backing [[CharDiversity]]:
  * code-point count, distinct code points, the collision sum Σc² (the
  * numerator of the Simpson index Σp² = Σc²/n² — "probability two random
  * characters match", the log-free stand-in for character entropy that
  * stays integer-exact), and the max single-character count.
  *
  * ASCII counts land in a flat 128-slot array (the hot path for web/corpus
  * text); anything above 127 falls back to a lazily-allocated hash map, so
  * CJK/emoji documents are correct without taxing the ASCII case.
  * Surrogate pairs count as ONE code point — the same unit as DuckDB's
  * per-code-point `string_split(text, '')` replay.
  */
final class CharDiversityKernel extends Serializable {
  def stats(u: UTF8String): InternalRow = {
    val str = u.toString
    val ascii = new Array[Int](128)
    var over: java.util.HashMap[Integer, Integer] = null
    var nCp = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      nCp += 1
      if (cp < 128) ascii(cp) += 1
      else {
        if (over == null) over = new java.util.HashMap[Integer, Integer]()
        val prev = over.get(cp)
        over.put(cp, if (prev == null) 1 else prev + 1)
      }
      i += Character.charCount(cp)
    }
    var distinct = 0L
    var coll = 0L
    var maxC = 0L
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 0) {
        distinct += 1; coll += c.toLong * c; if (c > maxC) maxC = c
      }
      j += 1
    }
    if (over != null) {
      val it = over.values().iterator()
      while (it.hasNext) {
        val c = it.next().toLong
        distinct += 1; coll += c * c; if (c > maxC) maxC = c
      }
    }
    InternalRow(nCp, distinct, coll, maxC)
  }
}

/** `char_diversity(text)` → struct(n_cp, distinct_cp, collision_sum,
  * max_count) — the character-level diversity profile of a document in one
  * codegen'd allocation-light scan. Feeds the low-diversity junk filter
  * (q255): keyboard mashing, repeated-character padding, and binary-ish
  * noise all show a high Simpson collision index or a tiny alphabet, which
  * the consumer derives as exact integer ratios of these counts.
  *
  * Why a custom expression (SURVEY.md §7.3, same argument as [[CharHash]] /
  * [[QualityScore]]): the column form is an explode-of-characters into a
  * per-(doc, char) shuffle — a |text|-row exchange per document for what is
  * a scan-local histogram. This form never leaves the scan.
  */
case class CharDiversity(child: Expression) extends UnaryExpression {

  @transient private lazy val kernel = new CharDiversityKernel

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_diversity requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_cp", LongType, nullable = false),
    StructField("distinct_cp", LongType, nullable = false),
    StructField("collision_sum", LongType, nullable = false),
    StructField("max_count", LongType, nullable = false)))

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_diversity"

  override protected def nullSafeEval(input: Any): Any =
    kernel.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charDiversityKernel", kernel,
      classOf[CharDiversityKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.stats($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CharDiversity =
    copy(child = newChild)
}
