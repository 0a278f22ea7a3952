package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val right = Seq(
    (1L, 10L, "a"), (1L, 20L, "b"), // key 1: state a from t=10, b from t=20
    (2L, 5L, "z")                   // key 2: state z from t=5
  ).toDF("k", "rts", "v")

  test("each left row gets the newest right state at-or-before its time") {
    val left = Seq((1L, 5L, 100L), (1L, 10L, 101L), (1L, 15L, 102L),
      (1L, 25L, 103L), (2L, 6L, 104L), (3L, 50L, 105L))
      .toDF("k", "lts", "id")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "lts", "rts")
      .select($"id", $"v", $"asof_rts").collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(out(100L) == (None, None))            // before any state
    assert(out(101L) == (Some("a"), Some(10L)))  // exactly-at matches (≤)
    assert(out(102L) == (Some("a"), Some(10L)))
    assert(out(103L) == (Some("b"), Some(20L)))  // newest wins, not first
    assert(out(104L) == (Some("z"), Some(5L)))   // keys do not bleed
    assert(out(105L) == (None, None))            // key with no right rows
  }

  test("tolerance voids too-stale matches (feature-store TTL)") {
    val left = Seq((1L, 12L, 1L), (1L, 30L, 2L)).toDF("k", "lts", "id")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "lts", "rts",
        toleranceMicros = Some(5L))
      .select($"id", $"v").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) == Some("a"))  // lag 2 ≤ 5
    assert(out(2L) == None)       // lag 10 > 5: state too old → absent
  }

  test("multi-column keys and multi-column payload carry together") {
    val r2 = Seq((1L, "x", 10L, "p1", 7L), (1L, "x", 20L, "p2", 8L))
      .toDF("k1", "k2", "rts", "p", "q")
    val l2 = Seq((1L, "x", 15L), (1L, "y", 15L)).toDF("k1", "k2", "lts")
    val out = AsofJoin.asofJoin(l2, r2, Seq("k1", "k2"), "lts", "rts")
      .select($"k2", $"p", $"q").collect()
      .map(r => r.getString(0) -> (Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(out("x") == (Some("p1"), Some(7L)))
    assert(out("y") == (None, None))
  }

  test("a NULL payload in the newest right row stays null (no older-row papering)") {
    // DuckDB ASOF semantics: the match is a ROW, so if the newest
    // at-or-before row carries null, the result is null — an older
    // non-null value must NOT leak through, and with a tolerance the
    // staleness check applies to that same row.
    val r = Seq((1L, 5L, Some("old")), (1L, 10L, None))
      .toDF("k", "rts", "v")
    val l = Seq((1L, 12L, 1L)).toDF("k", "lts", "id")
    val out = AsofJoin.asofJoin(l, r, Seq("k"), "lts", "rts")
      .select($"v", $"asof_rts").head()
    assert(out.isNullAt(0) && out.getLong(1) == 10L) // matched row IS ts=10
    // tolerance 3: the newest row (lag 2) is in-horizon; its null stands.
    // The ts=5 row (lag 7, out of horizon) must not resurface.
    val tol = AsofJoin.asofJoin(l, r, Seq("k"), "lts", "rts",
        toleranceMicros = Some(3L))
      .select($"v", $"asof_rts").head()
    assert(tol.isNullAt(0) && tol.getLong(1) == 10L)
  }

  test("multi-column payload always comes from ONE right row") {
    // Row at ts=10 has (p=null, q=8); row at ts=5 has (p="x", q=7). A
    // per-column carry would stitch (p="x", q=8) — a row that never
    // existed. The struct carry must return (null, 8).
    val r = Seq((1L, 5L, Some("x"), 7L), (1L, 10L, None, 8L))
      .toDF("k", "rts", "p", "q")
    val l = Seq((1L, 11L)).toDF("k", "lts")
    val out = AsofJoin.asofJoin(l, r, Seq("k"), "lts", "rts").head()
    val (p, q) = (out.getAs[String]("p"), out.getAs[Long]("q"))
    assert(p == null && q == 8L)
  }

  test("rightOrder breaks (key, ts) ties deterministically — greatest wins") {
    val r = Seq((1L, 10L, 100L, "low"), (1L, 10L, 200L, "high"))
      .toDF("k", "rts", "rid", "v")
    val l = Seq((1L, 15L)).toDF("k", "lts")
    val out = AsofJoin.asofJoin(l, r, Seq("k"), "lts", "rts",
        rightCols = Seq("v"), rightOrder = Seq("rid"))
      .select($"v").head().getString(0)
    assert(out == "high")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(l, r, Seq("k"), "lts", "rts",
        rightCols = Seq("v"), rightOrder = Seq("no_such_col"))
    }
  }

  test("a NULL right timestamp matches nothing (never a baseline carry)") {
    // ts >= NULL is never true (DuckDB ASOF agrees): the null-ts row must
    // not sort to the front of the window and become every left row's
    // fallback state.
    val r = Seq((1L, None: Option[Long], "dirty"), (1L, Some(100L), "real"))
      .toDF("k", "rts", "v")
    val l = Seq((1L, 50L, 1L), (1L, 150L, 2L)).toDF("k", "lts", "id")
    val out = AsofJoin.asofJoin(l, r, Seq("k"), "lts", "rts")
      .select($"id", $"v").collect()
      .map(row => row.getLong(0) -> Option(row.getString(1))).toMap
    assert(out(1L) == None)          // before the only real state: no match
    assert(out(2L) == Some("real"))  // the null-ts row never surfaces
  }

  test("payload name collisions with the left side are rejected") {
    val l = Seq((1L, 5L, "clash")).toDF("k", "lts", "v")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(l, right, Seq("k"), "lts", "rts")
    }
  }

  test("reserved internal names are rejected, not silently clobbered") {
    // The plan owns __ts/__side/__r/__c/__rts/__o_*; an input column with
    // one of those names would be overwritten mid-plan. And a left column
    // named asof_<rightTs> would duplicate the appended output column.
    val l = Seq((1L, 5L, "x")).toDF("k", "lts", "__side")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(l, right, Seq("k"), "lts", "rts")
    }
    val l2 = Seq((1L, 5L, "x")).toDF("k", "lts", "asof_rts")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(l2, right, Seq("k"), "lts", "rts")
    }
    val r2 = Seq((1L, 10L, "v")).toDF("k", "rts", "__o_z")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(Seq((1L, 5L)).toDF("k", "lts"), r2, Seq("k"), "lts", "rts")
    }
  }

  test("CoreOps wrapper: a NULL tiebreak loses to any non-null (pinned)") {
    // Round-5 rewrite changed NULL-tiebreak semantics (old: last() over
    // asc_nulls_last made NULL win; new: nulls-first ordering makes it
    // lose). This pins the NEW behavior so the change stays deliberate.
    val r = Seq((1L, 10L, Some(5L), "nonnull"), (1L, 10L, None, "nullrow"))
      .toDF("k", "rts", "tb", "v")
    val l = Seq((1L, 15L)).toDF("k", "lts")
    val out = graft.ops.CoreOps.asofJoin(l, r, Seq("k"), "lts", "rts",
        rightCols = Seq("v"), rightTiebreak = "tb")
      .select($"asof_v").head().getString(0)
    assert(out == "nonnull")
  }

  test("plan shape: one exchange on the key, no join node, no cross product") {
    val left = (0L until 1000L).map(i => (i % 10, i, i)).toDF("k", "lts", "id")
    val r3 = (0L until 100L).map(i => (i % 10, i * 7, i)).toDF("k", "rts", "payload")
    val df = AsofJoin.asofJoin(left, r3, Seq("k"), "lts", "rts")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must not plan a join (range-explosion shape)")
    assert(plan.contains("Window"), "carry-forward window missing")
  }
}
