package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.GraphBuilder

class GraphBuilderSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def posts = Seq(
    ("p1", "alice", "worldnews"), ("p2", "bob", "europe"), ("p3", "alice", "europe"))
    .toDF("id", "username", "subreddit")
  private def comments = Seq(
    ("c1", "carol", "p1"), ("c2", "alice", "p1"))
    .toDF("id", "username", "post_id")
  private def tweets = Seq(
    (100L, "dave", "alice,bob"), (101L, "erin", null))
    .toDF("id", "username", "mentionedUsers")

  test("vertices: one node per id+label, users/subreddits deduped across sources") {
    val v = GraphBuilder.vertices(posts, comments, tweets)
    assert(v.filter($"label" === "Post").count() == 3)
    assert(v.filter($"label" === "Comment").count() == 2)
    assert(v.filter($"label" === "Tweet").count() == 2)
    // alice appears as poster+commenter → one User node
    assert(v.filter($"label" === "User").count() == 5) // alice bob carol dave erin
    assert(v.filter($"label" === "Subreddit").count() == 2)
  }

  test("edges: all five relations, mention fan-out, null-safe") {
    val e = GraphBuilder.edges(posts, comments, tweets)
    assert(e.filter($"rel" === "POSTED_IN").count() == 3)
    assert(e.filter($"rel" === "POSTED_BY").count() == 3)
    assert(e.filter($"rel" === "COMMENTED_ON").count() == 2)
    assert(e.filter($"rel" === "COMMENTED_BY").count() == 2)
    assert(e.filter($"rel" === "MENTIONS").count() == 2) // 101L has null mentions
  }

  test("degree counts incoming edges per node") {
    val e = GraphBuilder.edges(posts, comments, tweets)
    val d = GraphBuilder.degree(e, "POSTED_IN")
    assert(d.filter($"dst" === "europe").head().getLong(1) == 2L)
  }

  test("userUserEdges mirrors the dev script's four-way null branching") {
    // neo4j_twitter_insert.py:60-82: both present / mentions only /
    // reply only / neither; empty string is Python-falsy (line 66)
    val t = Seq(
      ("alice", "bob,carol", "dave"),  // both → 2 mentioned + 1 reply
      ("erin", "bob", null),           // mentions only
      ("frank", null, "alice"),        // reply only
      ("gina", null, null),            // neither → node only, no edges
      ("hank", "", "bob"),             // '' mentions is falsy → reply only
      ("alice", "bob", "dave")         // MERGE dedup: repeats collapse
    ).toDF("username", "mentionedUsers", "inReplyToUser")
    val e = GraphBuilder.userUserEdges(t)
      .as[(String, String, String)].collect().toSet
    assert(e == Set(
      ("alice", "bob", "mentioned"), ("alice", "carol", "mentioned"),
      ("alice", "dave", "inReplyToUser"),
      ("erin", "bob", "mentioned"),
      ("frank", "alice", "inReplyToUser"),
      ("hank", "bob", "inReplyToUser")))
  }

  test("graph write/read round-trips as parquet tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft-graph").toString
    GraphBuilder.write(
      GraphBuilder.vertices(posts, comments, tweets),
      GraphBuilder.edges(posts, comments, tweets), dir)
    assert(spark.read.parquet(s"$dir/vertices.parquet").count() > 0)
    assert(spark.read.parquet(s"$dir/edges.parquet").count() > 0)
  }
}
