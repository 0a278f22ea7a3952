package graft.ops

import org.apache.spark.SparkContext

/** Shared reliable-checkpoint configuration for iterative operators
  * (Dedup.bucketedPairSides, TextOps.bpeTrain, GraphAlgos.truncate).
  *
  * `SparkContext.setCheckpointDir` is global mutable state: two concurrent
  * library calls passing different dirs would race, and re-setting it per
  * iteration creates a fresh UUID subdirectory every round. So the rule is
  * set-once: the first caller wins, later callers requesting a different
  * dir fail fast with a clear message instead of silently redirecting
  * someone else's in-flight checkpoints. (Spark appends a random UUID
  * child to the configured path, so equality is prefix-based.)
  */
object Checkpoints {

  def ensureDir(sc: SparkContext, dir: String): Unit = synchronized {
    sc.getCheckpointDir match {
      case None => sc.setCheckpointDir(dir)
      case Some(existing) =>
        // getCheckpointDir returns a Hadoop-qualified URI (file:/tmp/..)
        // with Spark's random UUID child appended — normalize the scheme
        // away and prefix-compare against the requested root.
        def norm(p: String) =
          p.replaceFirst("^[A-Za-z][A-Za-z0-9+.-]*:(//)?", "/")
            .replaceAll("/+", "/").stripSuffix("/")
        val have = norm(existing)
        val want = norm(dir)
        require(have == want || have.startsWith(want + "/"),
          s"SparkContext checkpoint dir already set to '$existing'; " +
            s"refusing to redirect it to '$dir' mid-session — pick one " +
            "checkpoint root per application")
    }
  }
}
