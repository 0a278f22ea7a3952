package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction: shrink the fact side of a selective
  * join BEFORE its shuffle.
  *
  * At 100 TB the dominant cost of `fact JOIN dim' ` (dim' = a filtered
  * dimension) is exchanging the whole fact table when only a sliver of it
  * will survive the join. The classic fix: build a Bloom sketch of dim's
  * join keys (tiny — it's a model artifact like the IVF centroid table),
  * ship it with the plan, and filter fact rows by `might_contain(key)`
  * before the exchange. False positives ride through and are removed by
  * the exact join that follows; false negatives cannot happen, so results
  * are EXACTLY those of the plain join — the sketch only moves work.
  *
  * Spark's own runtime bloom filter (`InjectRuntimeFilter`) does this
  * automatically for some shapes; this operator is the explicit form for
  * when the optimizer can't see it (derived dims, computed keys, sketch
  * reuse across many queries, or a sketch built from another system).
  *
  * The sketch build is one aggregation over dim' (`df.stat.bloomFilter`);
  * its driver-side result is `bits/8` bytes, sized by `expectedItems` and
  * `fpp` — 1M keys at 3% fpp ≈ 0.9 MB, well inside plan-shipping budget.
  */
object BloomJoin {

  /** Serialized Bloom sketch of `dim`'s `keyCol` values. */
  def buildSketch(dim: DataFrame, keyCol: String, expectedItems: Long,
                  fpp: Double = 0.03): Array[Byte] = {
    val bf =
      try dim.stat.bloomFilter(keyCol, expectedItems, fpp)
      catch {
        // stat.bloomFilter NPEs on an EMPTY dim (its internal aggregate
        // yields null bytes). An empty sketch — contains nothing, rejects
        // every probe — is precisely the right reduction for an empty join
        // side, so the plan degenerates to scanning zero fact rows.
        case _: NullPointerException =>
          org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)
      }
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `might_contain(key)` column against a serialized sketch (codegen'd
    * native expression; registers the SQL function if absent).
    */
  def mightContain(df: DataFrame, key: Column, sketch: Array[Byte]): Column = {
    org.apache.spark.sql.GraftFunctions.register(df.sparkSession)
    call_function("bloom_might_contain", key, lit(sketch))
  }

  /** `fact JOIN dim` on `factKey === dimKey`, with the fact side
    * pre-filtered by a Bloom sketch of dim's keys so the fact exchange
    * carries ~selectivity·|fact| rows instead of all of them. Result is
    * identical to the plain inner join.
    */
  def reducedJoin(fact: DataFrame, factKey: String, dim: DataFrame,
                  dimKey: String, expectedItems: Long,
                  fpp: Double = 0.03): DataFrame = {
    val sketch = buildSketch(dim, dimKey, expectedItems, fpp)
    val filtered = fact.filter(mightContain(fact, fact(factKey), sketch))
    // dataframe-qualified keys: unqualified col(factKey) is ambiguous
    // whenever fact and dim share the key column name
    filtered.join(dim, filtered(factKey) === dim(dimKey))
  }
}
