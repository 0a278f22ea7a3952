package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key, sketchBytes)` — membership test against a
  * serialized `org.apache.spark.util.sketch.BloomFilter` (the sketch
  * `df.stat.bloomFilter` builds).
  *
  * The sketch arrives as a foldable binary argument: it is deserialized
  * ONCE at codegen/eval setup, inlined into the plan (so it ships to every
  * executor with the serialized plan, exactly like a broadcast of a few
  * hundred KB), and the generated code makes one virtual call per row —
  * the expression stays inside whole-stage codegen, unlike a UDF closing
  * over the sketch.
  *
  * This is the executor half of the semi-join reduction in
  * [[graft.ops.BloomJoin]]: false positives pass (by design, the exact
  * join removes them), false negatives cannot happen, null keys are null
  * (dropped by a filter) — matching the semantics of the exact semi-join
  * it stands in front of.
  */
case class BloomMightContain(child: Expression, bloomBytes: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = bloomBytes

  override def checkInputDataTypes(): TypeCheckResult =
    if (!bloomBytes.foldable || bloomBytes.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain sketch must be a binary literal")
    else if (child.dataType != LongType && child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain key must be BIGINT or STRING, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter = {
    val bytes = bloomBytes.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(key: Any, ignored: Any): Any = child.dataType match {
    case LongType => bloom.mightContainLong(key.asInstanceOf[Long])
    case StringType => bloom.mightContainString(key.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The deserialized sketch is the codegen reference object; the "eval"
    // of the bytes argument in generated code is a dead reference load.
    val ref = ctx.addReferenceObj("bloomSketch", bloom, classOf[BloomFilter].getName)
    child.dataType match {
      case LongType =>
        defineCodeGen(ctx, ev, (c, _) => s"$ref.mightContainLong($c)")
      case StringType =>
        defineCodeGen(ctx, ev, (c, _) => s"$ref.mightContainString($c.toString())")
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BloomMightContain =
    copy(child = newLeft, bloomBytes = newRight)
}
