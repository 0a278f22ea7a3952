package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive flatten of a parent-pointer forest (comment trees).
  *
  * The reference never walks the tree itself — praw pre-flattens Reddit
  * comments before landing (`reddit/lambda_function.py:56-59`) and keeps
  * only `parent_id` — but any consumer of the comment graph eventually
  * asks for depth and root attribution. A naive per-level loop is
  * O(maxDepth) self-joins; this is pointer doubling: each pass, every
  * node's known ancestor pointer jumps to THAT ancestor's pointer and the
  * walked distance accumulates, so a depth-D forest settles in ⌈log₂ D⌉
  * passes (a 1M-deep chain = 20 shuffles, not 1M).
  */
object TreeOps {

  /** Flatten `nodes` (one row per node: `idCol`, nullable `parentCol`;
    * roots have NULL parent) to (id, root_id, depth).
    *
    * Each pass is one hash self-join on the jump pointer; the state is
    * localCheckpoint-ed per pass to truncate lineage (on a real cluster
    * with lineage-sensitive retry requirements, swap for
    * `checkpoint()` against a reliable dir). Fixpoint detection: a node's
    * depth strictly grows while its pointer is off-root, so the state is
    * settled exactly when sum(depth) stops moving — one cheap aggregate
    * on the already-materialized pass output.
    */
  def treeFlatten(nodes: DataFrame, idCol: String, parentCol: String,
                  maxIters: Int = 40): DataFrame = {
    var state = nodes.select(
      col(idCol).as("id"),
      coalesce(col(parentCol), col(idCol)).as("jump"),
      when(col(parentCol).isNull, lit(0L)).otherwise(lit(1L)).as("depth"))
      .localCheckpoint()
    var prevSum = -1L
    var iter = 0
    var curSum = sumDepth(state)
    while (curSum != prevSum) {
      // A cycle (or depth > 2^maxIters) never settles — fail loudly
      // instead of returning a partially-resolved forest.
      if (iter >= maxIters) throw new IllegalStateException(
        s"treeFlatten: not settled after $maxIters passes — " +
          "cycle in parent pointers or depth exceeds 2^maxIters")
      val t = state.select(col("id").as("t_id"), col("jump").as("t_jump"),
        col("depth").as("t_depth"))
      // LEFT join: a jump normally resolves to some node's row (roots
      // self-point with depth 0, so settled rows no-op), but scraped data
      // has DANGLING parents — comments whose parent never landed. Those
      // settle where they are (root_id = the missing ancestor's id) instead
      // of silently vanishing from the output, as an inner join would make
      // them.
      state = state.join(t, col("jump") === col("t_id"), "left")
        .select(col("id"),
          coalesce(col("t_jump"), col("jump")).as("jump"),
          (col("depth") + coalesce(col("t_depth"), lit(0L))).as("depth"))
        .localCheckpoint()
      prevSum = curSum
      curSum = sumDepth(state)
      iter += 1
    }
    state.select(col("id"), col("jump").as("root_id"), col("depth"))
  }

  private def sumDepth(state: DataFrame): Long =
    state.agg(coalesce(sum(col("depth")), lit(0L))).collect()(0).getLong(0)
}
