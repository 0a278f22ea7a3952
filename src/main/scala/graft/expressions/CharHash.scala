package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable rolling hash:
  * fold (acc*31 + charCode) mod 1e9+7 over the string — the spec shared by
  * `Dedup.charHash` (column HOF form), `Dedup.charHashStr` (kernel form)
  * and the DuckDB oracle SQL.
  *
  * Why a custom expression (SURVEY.md §7.3): the HOF form
  * `aggregate(split(s,""), ...)` cannot participate in whole-stage codegen —
  * higher-order functions evaluate interpreted, at ~100× the per-char cost
  * and with an O(n) array allocation. This expression stays inside the
  * generated code: one virtual call per row into a static JVM loop, no
  * allocation, null-intolerant so filters can still push around it.
  */
case class CharHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_hash requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_hash"

  override protected def nullSafeEval(input: Any): Any =
    CharHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CharHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): CharHash =
    copy(child = newChild)
}

object CharHash {
  /** Static entry point referenced from generated Java. UTF-16 unit fold —
    * identical to Dedup.charHashStr; equal to the per-character ascii() fold
    * for all BMP text.
    */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) { acc = (acc * 31L + str.charAt(i).toLong) % 1000000007L; i += 1 }
    acc
  }
}
