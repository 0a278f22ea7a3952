package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.enrich.Enrich
import graft.graph.GraphBuilder
import graft.ops.{CoreOps, SocialOps}

/** The reference's daily Glue ETL (SURVEY.md §3) as one distributed plan —
  * no `toPandas` driver collapse (`glue/twitter_glue.py:161`), no per-row
  * sink transactions (`glue/reddit_glue.py:112-125`). Stages:
  *
  *   scan(partition-pruned) → clean → enrich → graph tables + rollups
  *
  * Partition layout mirrors the reference's S3 key scheme
  * `topic=<q>/dataload=<dd-mm-yyyy>/` (`reddit/lambda_function_initial.py:45`);
  * `spark.read.parquet(root)` surfaces `topic`/`dataload` as partition
  * columns and Catalyst prunes them (`PruneFileSourcePartitions`) exactly
  * like the Glue push_down_predicate (`glue/reddit_glue.py:207-213`).
  *
  * Note on the reference bug `glue/reddit_glue.py:124` (comment rows
  * enriched with the *post's* sentiment): we enrich comments from their own
  * content — capability, not the bug.
  */
object SocialPipeline {

  /** K1 — partitioned landing sink (append, hive layout). `format` = parquet
    * for the engine's own layout or json to mirror the reference's landing
    * files byte-compatibly (`reddit/lambda_function_initial.py:45,62-63`).
    */
  def writeLanding(df: DataFrame, root: String, format: String = "parquet"): Unit =
    df.write.partitionBy("topic", "dataload").mode(SaveMode.Append)
      .format(format).save(root)

  /** K2 — CSV snapshot debug/audit sink (`glue/reddit_glue.py:225-226,271-273`). */
  def writeCsvSnapshot(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** S7 — catalog-style scan with partition pushdown. */
  def scanPartition(spark: SparkSession, root: String,
                    topic: String, dataload: String): DataFrame =
    spark.read.parquet(root)
      .where(col("topic") === topic && col("dataload") === dataload)

  /** Clean stage for posts: sentinel scrub + dropna (F8), author filters
    * (F5/F6), length gate + profanity blacklist (F3/F4, reference order),
    * date normalization (P7/P8).
    */
  def cleanPosts(df: DataFrame, blacklist: Seq[String], maxLen: Int = 1000): DataFrame = {
    val scrubbed = SocialOps.nullScrub(df)
    val authored = SocialOps.authorFilter(scrubbed)
    val gated = SocialOps.contentGate(authored, maxLen, blacklist, Seq("title", "content"))
    SocialOps.normalizeDates(gated)
  }

  /** Clean stage for comments (single text column). */
  def cleanComments(df: DataFrame, blacklist: Seq[String], maxLen: Int = 1000): DataFrame = {
    val scrubbed = SocialOps.nullScrub(df)
    val authored = SocialOps.authorFilter(scrubbed)
    val gated = SocialOps.contentGate(authored, maxLen, blacklist, Seq("content"))
    SocialOps.normalizeDates(gated)
  }

  /** Enrich stage (U1→U2→U3 in reference order): translate in-place, then
    * batched sentiment (25-row Comprehend protocol), then claim score.
    * Everything executor-side.
    */
  def enrich(df: DataFrame, textCol: String, scorer: Enrich.TextScorer): DataFrame = {
    val translated = df.withColumn(textCol, Enrich.translateCol(col(textCol)))
    Enrich.batchEnrich(translated, textCol, scorer, batchSize = 25)
      .withColumn("claimScore", Enrich.claimScore(col(textCol)))
  }

  /** Aggregate serving tables (A4/A5/A7): engagement per subreddit and
    * sentiment distribution per topic.
    */
  def engagementBySubreddit(posts: DataFrame): DataFrame =
    posts.groupBy(col("subreddit"))
      .agg(count(lit(1)).as("n_posts"),
        sum(col("score").cast("long")).as("sum_score"),
        sum(col("commentCount").cast("long")).as("sum_comments"))

  def sentimentByTopic(enriched: DataFrame): DataFrame =
    enriched.groupBy(col("topic"))
      .agg(count(lit(1)).as("n"),
        sum(CoreOps.cents(col("Positive"), 6)).as("sum_pos_u"),
        sum(CoreOps.cents(col("Negative"), 6)).as("sum_neg_u"),
        sum(CoreOps.cents(col("claimScore"), 6)).as("sum_claim_u"))

  /** Full daily batch: returns (cleanPosts, cleanComments, vertices, edges)
    * and writes graph + rollup tables under `outDir`.
    */
  def runDaily(spark: SparkSession, postsRoot: String, commentsRoot: String,
               tweetsRoot: String, topic: String, dataload: String,
               outDir: String, blacklist: Seq[String],
               scorer: Enrich.TextScorer): Unit = {
    val posts = enrich(
      cleanPosts(scanPartition(spark, postsRoot, topic, dataload), blacklist),
      "content", scorer)
    val comments = enrich(
      cleanComments(scanPartition(spark, commentsRoot, topic, dataload), blacklist),
      "content", scorer)
    val tweets = enrich(
      cleanComments(scanPartition(spark, tweetsRoot, topic, dataload), blacklist),
      "content", scorer)
    val vertices = GraphBuilder.vertices(posts, comments, tweets)
    val edges = GraphBuilder.edges(posts, comments, tweets)
    GraphBuilder.write(vertices, edges, outDir)
    engagementBySubreddit(posts).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/engagement_by_subreddit.parquet")
    sentimentByTopic(posts.unionByName(comments.drop("post_id", "parent_id"), allowMissingColumns = true)
        .unionByName(tweets, allowMissingColumns = true))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/sentiment_by_topic.parquet")
  }
}
