package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CountMin

class CountMinAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val depth = 4
  private val width = 64

  test("cms never undercounts and is exact when slots don't collide") {
    // 200 rows over 20 keys, skewed: key k appears k+1 times.
    val rows = (0L until 20L).flatMap(k => Seq.fill(k.toInt + 1)(k))
    val df = rows.toDF("k")
    val sk = df.agg(CountMin.sketch(depth, width)($"k").as("sk"))
    val ests = (0L until 20L).map(k =>
      CountMin.estimate($"sk", k, depth, width).as(s"e$k"))
    val out = sk.select(ests: _*).head()
    (0 until 20).foreach { k =>
      val est = out.getLong(k)
      assert(est >= k + 1, s"undercount at key $k: $est")
      // 20 keys in 4×64 slots: collisions possible but error ≤ total
      assert(est <= rows.length, s"estimate above total at key $k")
    }
  }

  test("merge is elementwise sum: sketch(a ++ b) == sketch(a) + sketch(b)") {
    val a = Seq(1L, 2L, 2L, 3L).toDF("k").repartition(3)
    val b = Seq(2L, 3L, 3L, 4L).toDF("k").repartition(2)
    def arr(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(CountMin.sketch(depth, width)($"k")).as[Seq[Long]].head()
    val merged = arr(a.union(b))
    val summed = arr(a).zip(arr(b)).map { case (x, y) => x + y }
    assert(merged == summed)
  }

  test("null keys are skipped, not counted (and do not crash the encoder)") {
    val df = Seq(Some(5L), None, Some(5L), None, Some(7L)).toDF("k")
    val withNulls =
      df.agg(CountMin.sketch(depth, width)($"k")).as[Seq[Long]].head()
    val withoutNulls = df.filter($"k".isNotNull)
      .agg(CountMin.sketch(depth, width)($"k")).as[Seq[Long]].head()
    assert(withNulls == withoutNulls)
    // total increments = depth × non-null rows
    assert(withNulls.sum == depth.toLong * 3)
  }

  test("absent key estimates zero when nothing collides into its slots") {
    val df = Seq(100L).toDF("k") // single key, single increment
    val sk = df.agg(CountMin.sketch(depth, width)($"k").as("sk"))
    // a key that shares no slot with 100 in any row estimates 0; find one
    val clear = (0L until 200L).find { cand =>
      cand != 100L && (0 until depth).forall(d =>
        CountMin.slot(d, cand, width) != CountMin.slot(d, 100L, width))
    }.get
    val est = sk.select(CountMin.estimate($"sk", clear, depth, width)).head().getLong(0)
    assert(est == 0L)
  }
}
