package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) per group — "the customers no one beats on
  * BOTH balance and order count", the multi-criteria top-N that rank-based
  * top-k can't express.
  *
  * Dominance (maximize both): a dominates b iff a.x ≥ b.x ∧ a.y ≥ b.y with
  * at least one strict. The skyline is the set of non-dominated points.
  *
  * The naive formulation is a quadratic anti-join (`NOT EXISTS (dominator)`),
  * which at 100 TB is a disaster. In 2-D the frontier is computable in one
  * sorted pass (Börzsönyi et al., "The Skyline Operator", ICDE 2001 §3 —
  * the sort-filter skyline): sort distinct points by (x DESC, y DESC); a
  * point is on the frontier iff its y strictly exceeds the running max of y
  * over all preceding points. Every preceding point has x ≥ current.x, so a
  * preceding y ≥ current.y is exactly a dominator; ties on the full (x, y)
  * pair are collapsed by the distinct so identical points don't eliminate
  * each other.
  *
  * Scale shape: one hash-distinct (partial-aggregable) and one
  * group-partitioned window sort — the same single-exchange cost as any
  * per-group ranking; no self-join. Parallelism = group cardinality; a 2-D
  * skyline inside one group is inherently a sorted scan, which is exactly
  * what the window provides.
  */
object Skyline {

  /** Frontier of distinct `(x, y)` points per `groupCols`, maximizing both.
    * `x`/`y` must be exact (integer/decimal) columns under the hash gate —
    * callers convert doubles via [[CoreOps.cents]] first.
    */
  def frontier2D(df: DataFrame, groupCols: Seq[String], x: Column, y: Column)
      : DataFrame = {
    val pts = df.groupBy((groupCols.map(col) :+ x.as("x") :+ y.as("y")): _*)
      .agg(count(lit(1)).as("n_points"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("x").desc, col("y").desc)
    val prevMaxY = max(col("y")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    pts.withColumn("__pm", prevMaxY)
      .filter(col("__pm").isNull || col("__pm") < col("y"))
      .drop("__pm")
  }
}
