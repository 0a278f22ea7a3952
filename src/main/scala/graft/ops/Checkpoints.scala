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
        require(compatible(existing, dir, sc.hadoopConfiguration),
          s"SparkContext checkpoint dir already set to '$existing'; " +
            s"refusing to redirect it to '$dir' mid-session — pick one " +
            "checkpoint root per application")
    }
  }

  /** Whether the already-set checkpoint dir `existing` (Hadoop-qualified,
    * possibly with Spark's UUID child appended) lives under the requested
    * root `dir`. Scheme-less paths are qualified against the default
    * filesystem exactly as `setCheckpointDir` would; then scheme,
    * authority, and path prefix must all agree. The earlier form stripped
    * the scheme before comparing, so 'hdfs:/ckpt' vs a requested
    * 'file:/ckpt' — two different filesystems — passed silently.
    */
  private[graft] def compatible(existing: String, dir: String,
      conf: org.apache.hadoop.conf.Configuration): Boolean = {
    def qualify(p: String): java.net.URI = {
      val path = new org.apache.hadoop.fs.Path(p)
      val u = path.toUri
      if (u.getScheme != null) u
      else {
        // only a scheme-less path needs the default filesystem; an
        // explicit-scheme URI is compared as written (no fs class load)
        val fs = path.getFileSystem(conf)
        path.makeQualified(fs.getUri, fs.getWorkingDirectory).toUri
      }
    }
    val (have, want) = (qualify(existing), qualify(dir))
    def nPath(u: java.net.URI) =
      u.getPath.replaceAll("/+", "/").stripSuffix("/")
    val (hp, wp) = (nPath(have), nPath(want))
    have.getScheme == want.getScheme &&
      Option(have.getAuthority) == Option(want.getAuthority) &&
      (hp == wp || hp.startsWith(wp + "/"))
  }
}
