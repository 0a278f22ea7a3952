package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-substring matcher over a case-normalized automaton.
  * One pass over the text regardless of dictionary size — the reference's
  * ~750-term wordfilter blacklist (`reddit/lambda_function_initial.py:29-31`)
  * costs O(len(text)) here versus O(len(text) · 750) for a `contains` chain
  * (and a 750-way regex alternation doesn't codegen well either). This is
  * SURVEY.md §4's "custom Catalyst work actually warranted" candidate.
  */
final class AhoCorasick(terms: Seq[String]) extends Serializable {
  // Locale.ROOT everywhere: default-locale toLowerCase would turn ASCII
  // "I" into dotless ı under tr/az JVMs, diverging from Spark's
  // locale-independent lower() (UTF8String uses Locale.ROOT).
  private val lower = terms.map(_.toLowerCase(java.util.Locale.ROOT))
    .filter(_.nonEmpty).distinct
  // goto/fail/output tables over a dense trie
  private val (gotoMap, fail, isTerminal) = {
    val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val terminal = scala.collection.mutable.ArrayBuffer(false)
    for (t <- lower) {
      var s = 0
      for (c <- t) {
        s = children(s).getOrElseUpdate(c, {
          children += scala.collection.mutable.Map.empty[Char, Int]
          terminal += false
          children.size - 1
        })
      }
      terminal(s) = true
    }
    val failArr = new Array[Int](children.size)
    val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).values.foreach { s => failArr(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      for ((c, v) <- children(u)) {
        queue += v
        var f = failArr(u)
        while (f != 0 && !children(f).contains(c)) f = failArr(f)
        val cand = children(f).getOrElse(c, 0)
        failArr(v) = if (cand != v) cand else 0
        terminal(v) = terminal(v) || terminal(failArr(v))
      }
    }
    (children.map(_.toMap).toArray, failArr, terminal.toArray)
  }

  def containsAny(s: UTF8String): Boolean = {
    if (lower.isEmpty) return false
    // Full-STRING lowercase with Locale.ROOT, not per-char: full case
    // mappings (İ → i̇, two chars) are what `contains(lower(col), term)`
    // computes, and CollapseContainsChain rewrites one into the other —
    // the two must agree on every input, under any JVM default locale.
    val text = s.toString.toLowerCase(java.util.Locale.ROOT)
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (state != 0 && !gotoMap(state).contains(c)) state = fail(state)
      state = gotoMap(state).getOrElse(c, 0)
      if (isTerminal(state)) return true
      i += 1
    }
    false
  }
}

/** `contains_any_term(text, 'term1', 'term2', ...)` — true when any term
  * occurs as a case-insensitive substring (wordfilter semantics, F4/U4).
  * The automaton is built once per plan and shipped as a codegen reference
  * object, so generated code makes one virtual call per row.
  */
case class ContainsAnyTerm(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  @transient private lazy val automaton = new AhoCorasick(terms)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"contains_any_term requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "contains_any_term"

  override protected def nullSafeEval(input: Any): Any =
    automaton.containsAny(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$ref.containsAny($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): ContainsAnyTerm =
    copy(child = newChild)
}
