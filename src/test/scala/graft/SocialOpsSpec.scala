package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SocialOps

class SocialOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("contentGate drops over-length and blacklisted rows") {
    val df = Seq("short ok", "has spamword here", "x" * 50).toDF("text")
    val out = SocialOps.contentGate(df, 20, Seq("spamword"), Seq("text"))
    assert(out.as[String].collect().toSeq == Seq("short ok"))
  }

  test("authorFilter drops AutoModerator and null authors") {
    val df = Seq(Some("alice"), Some("AutoModerator"), None).toDF("username")
    assert(SocialOps.authorFilter(df).count() == 1)
  }

  test("nullScrub null-ifies sentinels then drops those rows") {
    val df = Seq(
      ("fine", "alice"), ("", "bob"), ("[deleted]", "carol"), ("ok", "None"))
      .toDF("content", "username")
    val out = SocialOps.nullScrub(df)
    assert(out.count() == 1)
    assert(out.head().getString(0) == "fine")
  }

  test("normalizeDates parses date and dataload formats") {
    val df = Seq(("2023-03-25 10:30:00", "25-03-2023")).toDF("date", "dataload")
    val out = SocialOps.normalizeDates(df)
    assert(out.schema("date").dataType.typeName == "timestamp")
    assert(out.select(date_format($"dataload_date", "yyyy-MM-dd")).head().getString(0)
      == "2023-03-25")
  }

  test("mentionEdges explodes the CSV list, null-safe") {
    val df = Seq((1L, "u1,u2"), (2L, null), (3L, "")).toDF("id", "mentionedUsers")
    val out = SocialOps.mentionEdges(df)
    assert(out.count() == 2)
    assert(out.filter($"id" === 1L).count() == 2)
  }

  test("commentPostJoin attaches post attrs; orphanComments finds FK violations") {
    val posts = Seq(("p1", "worldnews"), ("p2", "europe")).toDF("id", "subreddit")
    val comments = Seq(("c1", "p1"), ("c2", "p1"), ("c3", "pX")).toDF("id", "post_id")
    val joined = SocialOps.commentPostJoin(comments, posts, Seq("subreddit"))
    assert(joined.count() == 2)
    assert(joined.filter($"post_subreddit" === "worldnews").count() == 2)
    val orphans = SocialOps.orphanComments(comments, posts)
    assert(orphans.select("id").as[String].collect().toSeq == Seq("c3"))
  }
}
