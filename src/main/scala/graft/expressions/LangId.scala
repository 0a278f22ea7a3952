package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass marker-voting language classifier backing [[LangId]]:
  * token → lang-bitmask lookup while scanning (no token arrays, no
  * per-language filter pass), then the exact decision rule of the column
  * form (`TextOps.langIdHof`): the language with the highest marker count
  * wins, ties to the FIRST language in `markers` order, no hit → "und".
  */
final class LangIdClassifier(markers: Seq[(String, Seq[String])])
    extends Serializable {
  require(markers.size <= 64, "at most 64 languages per classifier")
  private val langs: Array[UTF8String] =
    markers.map(m => UTF8String.fromString(m._1)).toArray
  private val nLangs = markers.size
  private val mask = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    markers.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val prev = m.get(w)
        m.put(w, java.lang.Long.valueOf(
          (if (prev == null) 0L else prev.longValue) | (1L << i)))
      }
    }
    m
  }
  private val maxMarkerLen =
    markers.flatMap(_._2.map(_.length)).foldLeft(0)(math.max)
  private val undT = UTF8String.fromString("und")

  /** The column form's null result: CASE chains over a null score fall
    * through every branch to the "und" seed. */
  def und: UTF8String = undT

  def classify(u: UTF8String): UTF8String = {
    val str = u.toString
    val counts = new Array[Int](nLangs)
    var tokStart = 0
    var i = 0
    // scan by UTF-16 units: the ' ' delimiter can't be a surrogate half
    while (i <= str.length) {
      if (i == str.length || str.charAt(i) == ' ') {
        if (i - tokStart <= maxMarkerLen) {
          val m = mask.get(str.substring(tokStart, i))
          if (m != null) {
            var b = m.longValue
            while (b != 0) {
              counts(java.lang.Long.numberOfTrailingZeros(b)) += 1
              b &= b - 1
            }
          }
        }
        tokStart = i + 1
      }
      i += 1
    }
    var best = 0
    var j = 0
    while (j < nLangs) { if (counts(j) > best) best = counts(j); j += 1 }
    if (best == 0) undT
    else {
      var k = 0
      while (counts(k) != best) k += 1
      langs(k)
    }
  }
}

/** Native language-ID by marker-token voting — the codegen'd twin of
  * `TextOps.langIdHof` (same [[CharHash]]/[[QualityScore]] argument: the
  * column form materializes a token array and runs one interpreted
  * `filter` pass PER LANGUAGE). Column-API only (markers don't encode as
  * SQL varargs); construct via `TextOps.langId`.
  *
  * NOT null-intolerant: the column form's CASE chain resolves a null text
  * to the "und" seed, so this expression is total (nullable = false) and
  * maps null → "und" identically.
  */
case class LangId(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression {

  @transient private lazy val classifier = new LangIdClassifier(markers)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_id requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "lang_id"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) classifier.und
    else classifier.classify(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdClassifier", classifier,
      classOf[LangIdClassifier].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        UTF8String ${ev.value} = ${c.isNull} ? $ref.und()
          : $ref.classify(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}
