package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference pipeline's cleaning + projection operators (SURVEY.md §2.2,
  * §2.3), phrased as reusable plan fragments over the social schemas. Filter
  * ORDER matches the reference (length before profanity, both before
  * enrichment — `reddit/lambda_function_initial.py:49-52`) for semantic
  * fidelity; all predicates are deterministic Columns so Catalyst may still
  * fuse/push them safely.
  */
object SocialOps {

  /** ~750-term wordfilter blacklist stand-in (the real list is data, not
    * code; semantics are what matter: case-insensitive substring ANY-match,
    * `reddit/lambda_function_initial.py:29-31`).
    */
  val defaultBlacklist: Seq[String] = Seq("spamword", "badterm", "slur1", "slur2")

  /** F3+F4 — the initial-crawl content gate: length cap then profanity.
    * (`reddit/lambda_function_initial.py:49-52`).
    *
    * Small blacklists compile to a codegen'd `contains` chain; past
    * `nativeThreshold` terms the native Aho-Corasick expression takes over
    * (one O(len) automaton pass per row instead of one scan per term — at
    * the reference's ~750 terms that's the difference between scan-speed
    * and 750× scan).
    */
  def contentGate(df: DataFrame, maxLen: Int, blacklist: Seq[String],
                  textCols: Seq[String], nativeThreshold: Int = 8): DataFrame = {
    val cols = textCols.map(col)
    val lenOk = CoreOps.lengthFilter(maxLen, cols: _*)
    val clean =
      if (blacklist.size > nativeThreshold) {
        org.apache.spark.sql.GraftFunctions.register(df.sparkSession)
        cols.map(c => !call_function("contains_any_term",
          (c +: blacklist.map(lit)): _*)).reduce(_ && _)
      } else cols.map(c => !CoreOps.containsAnyTerm(c, blacklist)).reduce(_ && _)
    df.filter(lenOk && clean)
  }

  /** F5/F6 — bot + null author drop (`reddit/lambda_function_aggregate.py:76-79`). */
  def authorFilter(df: DataFrame, userCol: String = "username"): DataFrame =
    df.filter(col(userCol).isNotNull && col(userCol) =!= "AutoModerator")

  /** F8 — sentinel scrub + dropna on content/username
    * (`glue/reddit_glue.py:227-252`): `""`/`"[deleted]"` content and
    * `"None"` username become null, then rows missing either are dropped.
    */
  def nullScrub(df: DataFrame): DataFrame =
    df.withColumn("content", CoreOps.nullifySentinels(col("content"), Seq("", "[deleted]")))
      .withColumn("username", CoreOps.nullifySentinels(col("username"), Seq("", "None")))
      .na.drop(Seq("content", "username"))

  /** P7/P8 — normalize the reference's string dates to TimestampType
    * (`"YYYY-MM-DD HH:MM:SS"`, `reddit/lambda_function.py:48`) and the
    * `dd-mm-yyyy` dataload partition string to DateType so pruning and
    * comparisons sort correctly (SURVEY.md §7.4 date-format trap).
    */
  def normalizeDates(df: DataFrame): DataFrame = {
    val withDate =
      if (df.columns.contains("date"))
        df.withColumn("date", to_timestamp(col("date"), "yyyy-MM-dd HH:mm:ss"))
      else df
    if (withDate.columns.contains("dataload"))
      withDate.withColumn("dataload_date", to_date(col("dataload"), "dd-MM-yyyy"))
    else withDate
  }

  /** J4 — mention fan-out: one (tweet, mentioned user) row per element of the
    * comma-joined `mentionedUsers` string; null-safe empty array like the
    * Cypher conditional variant (`neo4j_insert/neo4j_twitter_insert.py:60-82`).
    */
  def mentionEdges(tweets: DataFrame): DataFrame =
    tweets.select(col("id"),
      explode(when(col("mentionedUsers").isNull || col("mentionedUsers") === "", array())
        .otherwise(split(col("mentionedUsers"), ","))).as("mentioned"))

  /** J2 — comment→post FK join; left_semi validates the FK, inner attaches
    * post attributes (`glue/reddit_glue.py:92-99`). Posts-side is usually the
    * smaller relation → broadcast when it fits.
    */
  def commentPostJoin(comments: DataFrame, posts: DataFrame,
                      postCols: Seq[String]): DataFrame = {
    val p = posts.select((Seq(col("id").as("post_id")) ++
      postCols.map(c => col(c).as(s"post_$c"))): _*)
    comments.join(p, Seq("post_id"))
  }

  /** J2-orphans — comments whose post never landed (anti join). */
  def orphanComments(comments: DataFrame, posts: DataFrame): DataFrame =
    comments.join(posts.select(col("id").as("post_id")), Seq("post_id"), "left_anti")

  /** F7 — comment-expansion guard: only posts with comments feed the
    * expansion join (`reddit/lambda_function.py:56`).
    */
  def commentGuard(posts: DataFrame, countCol: String = "commentCount"): DataFrame =
    posts.filter(col(countCol) > 0)

  /** P6 — schema-directed rebuild: apply `f` to exactly the columns selected
    * by `isText`, copy the rest — the reference iterates catalog columns and
    * translates only content/title (`translate/translate.py:56-62,88-94`).
    */
  def mapTextColumns(df: DataFrame, isText: String => Boolean,
                     f: Column => Column): DataFrame =
    df.select(df.columns.map(c => (if (isText(c)) f(col(c)) else col(c)).as(c)): _*)
}
