package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Checkpoints

/** Scheme-aware checkpoint-root compatibility (ADVICE r9/r10: the old
  * normalizer stripped scheme+authority, so a cross-FILESYSTEM redirect
  * passed the set-once guard silently). `ensureDir` itself mutates global
  * SparkContext state, so the comparison is specced directly.
  */
class CheckpointsSpec extends AnyFunSuite {
  private val conf = TestSpark.spark.sparkContext.hadoopConfiguration

  test("same root accepted: qualified existing vs scheme-less request") {
    // getCheckpointDir returns file:/… with a UUID child; callers pass
    // the bare local root
    assert(Checkpoints.compatible("file:/tmp/ck/uuid-1234", "/tmp/ck", conf))
    assert(Checkpoints.compatible("file:/tmp/ck", "/tmp/ck", conf))
    // path spelling noise (doubled/trailing slashes) is normalized
    assert(Checkpoints.compatible("file:/tmp//ck/", "/tmp/ck", conf))
  }

  test("cross-scheme redirect rejected even with identical paths") {
    assert(!Checkpoints.compatible("hdfs:/ckpt", "file:/ckpt", conf))
    assert(!Checkpoints.compatible("file:/ckpt", "hdfs:/ckpt", conf))
  }

  test("cross-authority (different namenode/bucket) rejected") {
    assert(!Checkpoints.compatible(
      "hdfs://nn-a/ckpt/uuid", "hdfs://nn-b/ckpt", conf))
    assert(Checkpoints.compatible(
      "hdfs://nn-a/ckpt/uuid", "hdfs://nn-a/ckpt", conf))
  }

  test("sibling root still rejected (prefix is path-segment-aware)") {
    assert(!Checkpoints.compatible("file:/tmp/ck2", "/tmp/ck", conf))
    assert(!Checkpoints.compatible("file:/tmp/ckpt-other", "/tmp/ckpt", conf))
  }
}
