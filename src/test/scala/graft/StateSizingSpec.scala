package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StateSizing

/** The stream-state width rule (VERDICT r12 item 6): partitions scale with
  * keyspace × bytes-per-key against a per-task budget, clamped — and are
  * decoupled from the batch side's shuffle width (the r11 width A/B showed
  * 3.4× per-batch commit cost when state width blindly followed a 32-wide
  * batch conf on a few-hundred-key stream).
  */
class StateSizingSpec extends AnyFunSuite {

  test("fixture-scale keyspaces land on the measured 4-partition floor") {
    assert(StateSizing.statePartitions(estimatedKeys = 0) == 4)
    assert(StateSizing.statePartitions(estimatedKeys = 300) == 4)
    assert(StateSizing.statePartitions(estimatedKeys = 100000) == 4)
  }

  test("cluster-scale keyspace: 2e9 keys x 128 B / 256 MiB -> 954 parts") {
    assert(StateSizing.statePartitions(estimatedKeys = 2000000000L) == 954)
  }

  test("monotone in keys and bytes, inverse in budget") {
    val base = StateSizing.statePartitions(1L << 30)
    assert(StateSizing.statePartitions(1L << 32) >= base)
    assert(StateSizing.statePartitions(1L << 30, bytesPerKey = 512) >= base)
    assert(StateSizing.statePartitions(1L << 30,
      partitionStateBudgetBytes = 1L << 30) <= base)
  }

  test("ceil semantics: one byte over the budget adds a partition") {
    val b = 1L << 20
    assert(StateSizing.statePartitions(b, bytesPerKey = 1,
      partitionStateBudgetBytes = b, minParts = 1) == 1)
    assert(StateSizing.statePartitions(b + 1, bytesPerKey = 1,
      partitionStateBudgetBytes = b, minParts = 1) == 2)
  }

  test("clamps hold at the extremes; no long wraparound") {
    // 1e15 keys x 1e5 bytes = 1e20 state bytes: far past Long.MaxValue
    // when multiplied naively; must clamp to maxParts, not go negative.
    assert(StateSizing.statePartitions(1000000000000000L,
      bytesPerKey = 100000L) == (1 << 15))
    assert(StateSizing.statePartitions(Long.MaxValue,
      bytesPerKey = Long.MaxValue) == (1 << 15))
  }

  test("rejects nonsense inputs") {
    intercept[IllegalArgumentException](StateSizing.statePartitions(-1))
    intercept[IllegalArgumentException](
      StateSizing.statePartitions(1, bytesPerKey = 0))
    intercept[IllegalArgumentException](
      StateSizing.statePartitions(1, partitionStateBudgetBytes = 0))
    intercept[IllegalArgumentException](
      StateSizing.statePartitions(1, minParts = 5, maxParts = 4))
  }

  test("decoupled from batch width: logged form returns the same answer") {
    assert(StateSizing.statePartitionsLogged(300, batchShuffleWidth = 32) == 4)
    assert(StateSizing.statePartitionsLogged(2000000000L,
      batchShuffleWidth = 200) == 954)
  }
}
