package graft.streaming

/** Sizing rule for stateful-streaming state partitions, promoted from the
  * r11/r12 width A/B (NOTES "Shuffle-width robustness leg",
  * BENCH_WIDTH32_r11.json): every state partition is one state-store file
  * committed (fsync + snapshot bookkeeping) PER micro-batch PER stateful
  * operator, so width is a per-batch fixed cost — q98_stream_join ran 3.4×
  * slower at width 32 than width 4 on a keyspace of hundreds. State width
  * is therefore a KEYSPACE-sized knob, set independently of the batch
  * side's shuffle width:
  *
  *   parts = clamp( ceil(keys·bytesPerKey / partitionStateBudget), min, max )
  *
  * - `partitionStateBudgetBytes` is how much state one task may hold;
  *   default 256 MiB — comfortably inside a 4–8 GiB executor heap next to
  *   shuffle + scan buffers for the HDFS-backed provider, and a sane
  *   RocksDB working set otherwise.
  * - `minParts` default 4 keeps a floor of parallelism for the state scan
  *   even when state is tiny (and matches the measured optimum for the
  *   bench fixtures' few-hundred-key streams).
  * - At 100 TB: 2e9 session keys × 128 B = 256 GB of state → 954
  *   partitions, regardless of whether the batch side shuffles at 200 or
  *   2000. Spark pins state width at the FIRST run of a query (the
  *   checkpoint's shuffle partitioning is frozen), which is why getting
  *   this right up front matters — resizing later means a new checkpoint.
  */
object StateSizing {

  def statePartitions(estimatedKeys: Long,
                      bytesPerKey: Long = 128L,
                      partitionStateBudgetBytes: Long = 256L << 20,
                      minParts: Int = 4,
                      maxParts: Int = 1 << 15): Int = {
    require(estimatedKeys >= 0, s"estimatedKeys < 0: $estimatedKeys")
    require(bytesPerKey > 0, s"bytesPerKey <= 0: $bytesPerKey")
    require(partitionStateBudgetBytes > 0,
      s"partitionStateBudgetBytes <= 0: $partitionStateBudgetBytes")
    require(minParts >= 1 && maxParts >= minParts,
      s"bad clamp [$minParts, $maxParts]")
    // BigInt: 1e15 keys × 1e5 bytes/key must not wrap a long.
    val stateBytes = BigInt(estimatedKeys) * BigInt(bytesPerKey)
    val budget = BigInt(partitionStateBudgetBytes)
    val needed = ((stateBytes + budget - 1) / budget).max(1)
    needed.min(BigInt(maxParts)).max(BigInt(minParts)).toInt
  }

  /** [[statePartitions]] plus a loud one-line rationale to stderr when the
    * chosen state width differs from the session's batch shuffle width —
    * the silent-footgun this helper exists to prevent is "state width
    * defaulted to spark.sql.shuffle.partitions".
    */
  def statePartitionsLogged(estimatedKeys: Long,
                            batchShuffleWidth: Int,
                            bytesPerKey: Long = 128L,
                            partitionStateBudgetBytes: Long = 256L << 20,
                            minParts: Int = 4,
                            maxParts: Int = 1 << 15): Int = {
    val p = statePartitions(estimatedKeys, bytesPerKey,
      partitionStateBudgetBytes, minParts, maxParts)
    if (p != batchShuffleWidth)
      System.err.println(
        s"[graft.streaming] state partitions = $p for ~$estimatedKeys keys " +
          s"x ${bytesPerKey}B (budget ${partitionStateBudgetBytes >> 20} MiB" +
          s"/task), INDEPENDENT of batch shuffle width $batchShuffleWidth - " +
          "each state partition is one store commit per micro-batch per " +
          "stateful op; width is frozen into the checkpoint at first run")
    p
  }
}
