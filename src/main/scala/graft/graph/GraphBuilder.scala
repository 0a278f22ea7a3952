package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-as-tables builders (SURVEY.md §2.12 K3): the reference's Neo4j
  * MERGE serving layer (`glue/reddit_glue.py:70-125`,
  * `glue/twitter_glue.py:74-105`) re-expressed as `vertices`/`edges`
  * DataFrames in GraphFrames convention (`id`, `label` + attrs; `src`,
  * `dst`, `rel`). Cypher MERGE = dedup-on-key, so every node table is a
  * `dropDuplicates` on the merge key and every edge table a projection of
  * the fact tables — idempotent, distributable, no per-row transactions.
  */
object GraphBuilder {

  /** Node tables from posts/comments/tweets:
    * Post, Comment, Tweet facts; User and Subreddit dims via distinct.
    */
  def vertices(posts: DataFrame, comments: DataFrame, tweets: DataFrame): DataFrame = {
    val postV = posts.select(col("id").cast("string").as("id"), lit("Post").as("label"))
    val commentV = comments.select(col("id").cast("string").as("id"), lit("Comment").as("label"))
    val tweetV = tweets.select(col("id").cast("string").as("id"), lit("Tweet").as("label"))
    val userV = posts.select(col("username"))
      .unionByName(comments.select(col("username")))
      .unionByName(tweets.select(col("username")))
      .filter(col("username").isNotNull).distinct()
      .select(col("username").as("id"), lit("User").as("label"))
    val subV = posts.select(col("subreddit")).filter(col("subreddit").isNotNull)
      .distinct().select(col("subreddit").as("id"), lit("Subreddit").as("label"))
    postV.unionByName(commentV).unionByName(tweetV).unionByName(userV).unionByName(subV)
      .dropDuplicates("id", "label")
  }

  /** Edge tables: POSTED_IN, POSTED_BY, COMMENTED_ON, COMMENTED_BY, MENTIONS
    * (`glue/reddit_glue.py:70-98`, `glue/twitter_glue.py:74-97`).
    */
  def edges(posts: DataFrame, comments: DataFrame, tweets: DataFrame): DataFrame = {
    val postedIn = posts.select(col("id").cast("string").as("src"),
      col("subreddit").as("dst"), lit("POSTED_IN").as("rel"))
    val postedBy = posts.select(col("id").cast("string").as("src"),
      col("username").as("dst"), lit("POSTED_BY").as("rel"))
    val commentedOn = comments.select(col("id").cast("string").as("src"),
      col("post_id").cast("string").as("dst"), lit("COMMENTED_ON").as("rel"))
    val commentedBy = comments.select(col("id").cast("string").as("src"),
      col("username").as("dst"), lit("COMMENTED_BY").as("rel"))
    val mentions = graft.ops.SocialOps.mentionEdges(tweets)
      .select(col("id").cast("string").as("src"), col("mentioned").as("dst"),
        lit("MENTIONS").as("rel"))
    postedIn.unionByName(postedBy).unionByName(commentedOn).unionByName(commentedBy)
      .unionByName(mentions)
      .filter(col("dst").isNotNull)
      .dropDuplicates("src", "dst", "rel")
  }

  /** Dev-path user↔user tweet graph
    * (`neo4j_insert/neo4j_twitter_insert.py:6-41,60-82`): edges between
    * the TWEETING user and each mentioned user (`mentioned`), plus
    * tweeter → inReplyToUser (`inReplyToUser`). The script's four-way
    * if/elif branching (both present / mentions only / reply only /
    * neither) collapses under MERGE semantics to two null-safe
    * projections + dedup — each edge type is emitted exactly when its
    * field is present, independent of the other. Python truthiness:
    * null AND empty-string both mean "absent" (`if tweet[...]` at
    * `neo4j_twitter_insert.py:66,71,76`). This is the user↔user shape
    * the production Glue path does NOT build (it makes tweet→user
    * MENTIONS instead — [[edges]]); mirrored here for parity with the
    * local insert script.
    */
  def userUserEdges(tweets: DataFrame): DataFrame = {
    val hasMentions = col("mentionedUsers").isNotNull && col("mentionedUsers") =!= ""
    val mentioned = tweets.filter(hasMentions)
      .select(col("username").as("src"),
        explode(split(col("mentionedUsers"), ",")).as("dst"),
        lit("mentioned").as("rel"))
    val hasReply = col("inReplyToUser").isNotNull && col("inReplyToUser") =!= ""
    val replies = tweets.filter(hasReply)
      .select(col("username").as("src"), col("inReplyToUser").as("dst"),
        lit("inReplyToUser").as("rel"))
    mentioned.unionByName(replies)
      .filter(col("src").isNotNull) // Cypher MERGE on a null key throws
      .dropDuplicates("src", "dst", "rel")
  }

  /** K3 sink: graph tables to parquet, overwrite = the reference's
    * wipe-and-reload dev flow (`neo4j_insert/neo4j_reddit_insert.py:56-68`).
    */
  def write(vertices: DataFrame, edges: DataFrame, dir: String): Unit = {
    vertices.write.mode("overwrite").parquet(s"$dir/vertices.parquet")
    edges.write.mode("overwrite").parquet(s"$dir/edges.parquet")
  }

  /** A7 — mention-degree / top-k influencers from the edges table. */
  def degree(edges: DataFrame, rel: String): DataFrame =
    edges.filter(col("rel") === rel).groupBy(col("dst")).agg(count(lit(1)).as("degree"))
}
