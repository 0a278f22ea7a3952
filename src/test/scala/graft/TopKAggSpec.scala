package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TopKAgg, TopKByValue, TopKEntry}

/** Bounded-buffer top-k aggregate: parity with the window idiom, tie
  * determinism, map-side partial aggregation in the plan.
  */
class TopKAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("buffer ops: reduce keeps k best sorted; merge is an ordered k-merge") {
    val agg = new TopKByValue(3)
    val b = Seq(10L, 5L, 20L, 5L, 1L, 30L).zipWithIndex
      .foldLeft(agg.zero) { case (buf, (v, i)) => agg.reduce(buf, TopKEntry(v, i.toLong)) }
    assert(b == Seq(TopKEntry(30, 5), TopKEntry(20, 2), TopKEntry(10, 0)))
    val other = Seq(TopKEntry(25, 9), TopKEntry(20, 1))
    assert(agg.merge(b, other) ==
      Seq(TopKEntry(30, 5), TopKEntry(25, 9), TopKEntry(20, 1)))
    // ties resolve to the smaller id, everywhere
    assert(agg.merge(Seq(TopKEntry(7, 4)), Seq(TopKEntry(7, 2))).head.id == 2)
  }

  test("matches the window row_number idiom on a multi-partition frame") {
    val df = (1L to 5000L).map(i => (s"g${i % 7}", (i * 2654435761L) % 1000, i))
      .toDF("g", "v", "id").repartition(8)
    val viaAgg = df.groupBy($"g").agg(TopKAgg.topK(5, $"v", $"id").as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).as("rank"), $"col.v".as("v"), $"col.id".as("id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"g")
      .orderBy($"v".desc, $"id".asc)
    val viaWindow = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"g", $"rank".cast("int").as("rank"), $"v", $"id")
    assert(viaAgg.collect().toSet == viaWindow.collect().toSet)
  }

  test("groups smaller than k return all rows, never pad") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 9L, 3L)).toDF("g", "v", "id")
    val out = df.groupBy($"g").agg(TopKAgg.topK(10, $"v", $"id").as("top"))
      .select($"g", size($"top").as("n")).as[(String, Int)].collect().toMap
    assert(out == Map("a" -> 2, "b" -> 1))
  }

  test("plan aggregates partially (map-side top-k before the exchange)") {
    val df = (1L to 1000L).map(i => (s"g${i % 3}", i, i)).toDF("g", "v", "id")
      .repartition(4)
    val q = df.groupBy($"g").agg(TopKAgg.topK(3, $"v", $"id").as("top"))
    q.collect()
    val s = q.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    val plan = if (cut >= 0) s.substring(0, cut) else s
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    assert(plan.toLowerCase.contains("partial_topkbyvalue"),
      s"no partial aggregation phase in plan:\n$plan")
  }
}
