package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{AnalyticsQueries, EvalQueries}

/** r12 overflow audit (VERDICT r11 items 1+3): every data-dependent
  * product with a large literal either carries a documented int64 bound
  * (window-bounded or count×small-literal: q270, q265, q218, q202) or
  * runs in DECIMAL(38,0) — and the decimal family is DRIVEN HERE at
  * magnitudes ≥ 100× sf1, where the old int64 forms deterministically
  * threw ARITHMETIC_OVERFLOW (q271 at sf1 was the r11 live failure).
  * Expected values are recomputed independently with BigInt, so these
  * specs pin correctness at scale, not just absence of a throw.
  */
class OverflowBoundsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val Lcm = 2329089562800L // LCM(1..29)

  test("theil-sen slope key survives daily sums ~2.7e7x sf1 (r11 sf1 overflow repro)") {
    // sf1's max daily-cents delta is ~9.05e6 — already past the ~3.9e6
    // int64 budget at gap 1. These values sit at |v| ~ 1e15, num up to
    // ~2e15, key up to ~4.7e27: far beyond 100x sf1, and hash-exact.
    val vs = Seq.tabulate(10)(d => ((d * 7919) % 13 - 6).toLong * 100000000000000L + d.toLong * 1000000007L)
    val daily = vs.zipWithIndex
      .map { case (v, d) => ("k", d.toLong, v) }
      .toDF("grp", "rel", "v")

    // Independent BigInt replay of the exact median-slope definition.
    val slopes = for {
      i <- 0 until 10; j <- (i + 1) until 10
    } yield (BigInt(vs(j) - vs(i)) * (Lcm / (j - i)), i, j, vs(j) - vs(i), (j - i).toLong)
    val sorted = slopes.sortBy { case (k, di, dj, _, _) => (k, di, dj) }
    val med = sorted((sorted.size + 1) / 2 - 1)

    val row = AnalyticsQueries.theilSenFromDaily(daily, "grp").collect()
    assert(row.length === 1)
    assert(row(0).getAs[Long]("n_pairs") === 45L)
    assert(row(0).getAs[Long]("med_slope_num") === med._4)
    assert(row(0).getAs[Long]("med_slope_den") === med._5)
  }

  test("midrank AUC numerator survives 8e6 rows (1e6*2U = 3.2e19 > Long.MAX)") {
    // Perfect separation at N = 8e6 (P = N/2): 2U = 2*P*N = 3.2e13, and
    // the *1e6 numerator is 3.2e19 — past Long.MAX, so this row count is
    // exactly where the pre-decimal form threw. AUC must be exactly 1.
    val e = spark.range(8000000L).select(
      col("id").as("sc"),
      when(col("id") >= 4000000L, 1L).otherwise(0L).as("y"),
      col("id").as("event_id"))
    val r = EvalQueries.midrankAuc(e, Seq.empty).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_pos") === 4000000L)
    assert(r(0).getAs[Long]("n_neg") === 4000000L)
    assert(r(0).getAs[Long]("auc_micros") === 1000000L)
  }

  test("midrank AUC inverted separation at 8e6 rows is exactly 0") {
    val e = spark.range(8000000L).select(
      col("id").as("sc"),
      when(col("id") < 4000000L, 1L).otherwise(0L).as("y"),
      col("id").as("event_id"))
    val r = EvalQueries.midrankAuc(e, Seq.empty).collect()
    assert(r(0).getAs[Long]("auc_micros") === 0L)
  }

  test("gini numerator survives per-user sums ~1e9x sf1 (numerator*1e4 = 1.7e22)") {
    // x_i = i*1e13 cents keeps sum_rx (a LONG sum) at 3.4e18 < Long.MAX
    // while the decimal numerator*1e4 is 1.7e22 — the decimal seam is
    // exercised exactly where int64 dies. Expected value via BigInt.
    val n = 100
    val xs = Seq.tabulate(n)(i => (i + 1).toLong * 10000000000000L)
    val u = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("grp", "user_id", "x")
    val sumX = xs.map(BigInt(_)).sum
    val sumRx = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val expected = ((2 * sumRx - BigInt(n + 1) * sumX) * 10000) / (BigInt(n) * sumX)
    val r = AnalyticsQueries.giniByKey(u, "grp", "user_id").collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_users") === n.toLong)
    assert(r(0).getAs[Long]("gini_bp") === expected.toLong)
  }

  test("IntegralDivide on DECIMAL(38,0) returns BIGINT with floor semantics on nonnegatives") {
    // The whole decimal family leans on `div`: decimal dividend, int64
    // divisor, BIGINT result, truncation = floor because every operand
    // is nonnegative by construction (q217/q253/midrankAuc invariants).
    val df = spark.sql(
      "SELECT CAST(12345678901234567890123 AS DECIMAL(38,0)) div 10000000000 AS r")
    assert(df.schema("r").dataType === org.apache.spark.sql.types.LongType)
    assert(df.first().getLong(0) === 1234567890123L)
  }

  test("exactIsqrt is exact above 2^64 where float casts diverge (q283 r13)") {
    // Perfect squares k² and their neighbors k²±1 at magnitudes from the
    // q283 envelope (vnum ~ 1e24) up past 2^64, where DuckDB's
    // HUGEINT→DOUBLE double-rounded cast can flip a bare
    // floor(sqrt(double)) by 1. Expected roots recomputed with BigInt.
    val ks = Seq(3L, 4294967296L /* 2^32: k² = 2^64 */, 4294967311L,
      999999999999L, 1000000000000L /* k² = 1e24 */, 987654321987L)
    val cases = ks.flatMap { k =>
      val sq = BigInt(k) * BigInt(k)
      Seq(sq - 1, sq, sq + 1)
    } :+ BigInt(0) :+ BigInt(1) :+ BigInt(2)
    val expected = cases.map { x =>
      // BigInt isqrt by Newton (stop when the iterate stops DECREASING —
      // Newton on integers oscillates between the two values bracketing
      // the root, so `g != prev` alone never terminates there)
      def isqrt(n: BigInt): BigInt = {
        if (n < 2) n
        else {
          var g = BigInt(1) << ((n.bitLength + 1) / 2)
          var next = (g + n / g) >> 1
          while (next < g) { g = next; next = (g + n / g) >> 1 }
          while (g * g > n) g -= 1
          while ((g + 1) * (g + 1) <= n) g += 1
          g
        }
      }
      isqrt(x)
    }
    val df = cases.map(_.toString).toDF("xs")
      .select(graft.ops.CoreOps.exactIsqrt(
        col("xs").cast("decimal(38,0)")).as("r"))
    val got = df.collect().map(_.getLong(0))
    got.zip(expected).zip(cases).foreach { case ((g, e), x) =>
      assert(BigInt(g) === e, s"isqrt($x)")
    }
  }

  test("exactIsqrt fails LOUDLY outside its envelope, stays NULL on NULL") {
    // ADVICE r13: out-of-envelope inputs previously fell through the
    // candidate coalesce to a silent NULL that propagated as a wrong-by-
    // omission weight. A contract-breaking negative input deterministically
    // exhausts every candidate (k ≥ 0 can't square to ≤ a negative), so it
    // exercises the raise branch without needing a float seed that happens
    // to land > 2 off.
    val neg = Seq("-1").toDF("xs")
      .select(graft.ops.CoreOps.exactIsqrt(col("xs").cast("decimal(38,0)")))
    val ex = intercept[Exception] { neg.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("exactIsqrt BOUNDS")),
      s"expected the BOUNDS raise; got: ${msgs(ex).mkString(" | ")}")
    // NULL input is not a bounds violation — it must stay NULL.
    val r = Seq(Option.empty[String]).toDF("xs")
      .select(graft.ops.CoreOps.exactIsqrt(col("xs").cast("decimal(38,0)")))
      .collect()
    assert(r.length == 1 && r(0).isNullAt(0))
  }
}
