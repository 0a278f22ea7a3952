package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.expressions.CharHash

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — after which
  * `char_hash(str)` is available in SQL and via `expr`/`call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("char_hash"),
      new ExpressionInfo(classOf[CharHash].getName, "char_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CharHash(children.head)))
  }
}
