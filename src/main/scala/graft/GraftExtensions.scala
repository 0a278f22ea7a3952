package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{CharHash, ContainsAnyTerm}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — after which
  * `char_hash(str)` / `contains_any_term(str, 't1', 't2', ...)` are
  * available in SQL and via `expr`/`call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("char_hash"),
      new ExpressionInfo(classOf[CharHash].getName, "char_hash"),
      (children: Seq[Expression]) => CharHash(children.head)),
    (FunctionIdentifier("contains_any_term"),
      new ExpressionInfo(classOf[ContainsAnyTerm].getName, "contains_any_term"),
      (children: Seq[Expression]) => ContainsAnyTerm(
        children.head,
        children.tail.map(_.eval(null).toString))))
}
