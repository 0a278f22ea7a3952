package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{KmvAgg, KmvSketch}

/** Pins the KMV bottom-k sketch (q158's engine): the buffer is a pure
  * function of the input SET — duplicates collapse, arrival order and
  * partitioning are invisible — and the integer estimator is exact in the
  * sub-k regime and the (k-1)·M / h_k order statistic above it.
  */
class KmvAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def direct(k: Int, xs: Seq[Long]): Seq[Long] = {
    val a = new KmvSketch(k)
    xs.foldLeft(a.zero)(a.reduce)
  }

  test("reduce keeps the k smallest distinct values, sorted") {
    val xs = Seq(50L, 10L, 30L, 10L, 20L, 40L, 5L, 50L)
    assert(direct(4, xs) == Seq(5L, 10L, 20L, 30L))
    // sub-k: the sketch IS the distinct set
    assert(direct(16, xs) == Seq(5L, 10L, 20L, 30L, 40L, 50L))
  }

  test("negative inputs are skipped (the filtered-sketch protocol)") {
    assert(direct(4, Seq(-1L, 7L, -1L, 3L)) == Seq(3L, 7L))
  }

  test("merge(a, b) == sketch of the union; arrival order is invisible") {
    val k = 8
    val a = Seq(1L, 9L, 17L, 25L, 33L, 41L)
    val b = Seq(2L, 9L, 18L, 26L, 34L, 42L, 50L)
    val agg = new KmvSketch(k)
    val merged = agg.merge(direct(k, a), direct(k, b))
    assert(merged == direct(k, (a ++ b).distinct.sorted))
    assert(merged == direct(k, scala.util.Random.shuffle((a ++ b).toList)))
  }

  test("group-by sketch is partition-invariant (map-side partial merge)") {
    val k = 16
    val rows = (0L until 500L).map(i => (i % 3, (i * i + i) % 1000003L))
    val one = rows.toDF("g", "h").repartition(1)
      .groupBy($"g").agg(KmvAgg.kmv(k)($"h").as("sk"))
      .orderBy($"g").as[(Long, Seq[Long])].collect()
    val many = rows.toDF("g", "h").repartition(13)
      .groupBy($"g").agg(KmvAgg.kmv(k)($"h").as("sk"))
      .orderBy($"g").as[(Long, Seq[Long])].collect()
    assert(one.toSeq == many.toSeq)
    // and each group matches the single-threaded reference
    one.foreach { case (g, sk) =>
      val expect = direct(k, rows.filter(_._1 == g).map(_._2))
      assert(sk == expect, s"group $g")
    }
  }

  test("estimate: exact below k, (k-1)·M div h_k at k") {
    val k = 4
    // sub-k: 3 distinct values → estimate 3
    val sub = Seq(direct(k, Seq(10L, 20L, 10L, 30L))).toDF("sk")
      .select(KmvAgg.estimate(k, $"sk")).head().getLong(0)
    assert(sub == 3L)
    // full: h_k = 40 → (3 · 1000000007) / 40, integer division
    val full = Seq(direct(k, Seq(10L, 20L, 30L, 40L, 50L))).toDF("sk")
      .select(KmvAgg.estimate(k, $"sk")).head().getLong(0)
    assert(full == 3L * KmvAgg.M / 40L)
  }

  test("estimator lands within 4σ on a uniform-hash population") {
    val k = 64
    val n = 20000
    // charHash-like spread: multiplicative hash into [0, M)
    val hs = (1 to n).map(i => (i.toLong * 2654435761L) % KmvAgg.M)
    val distinct = hs.distinct.size.toLong
    val est = Seq(direct(k, hs)).toDF("sk")
      .select(KmvAgg.estimate(k, $"sk")).head().getLong(0)
    // SE ≈ n/√(k−2) ≈ 12.7% at k=64; 4σ ≈ 51%
    assert(math.abs(est - distinct) * 100 <= distinct * 51,
      s"est $est vs $distinct")
  }
}
