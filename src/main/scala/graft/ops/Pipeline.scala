package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's whole application as four composable engine phases
  * (reddit_etl_proj/etl_pipeline.py; SURVEY.md §3) — a user of the
  * reference can run their entire pipeline through these four calls.
  *
  * Phase boundaries and semantics follow the reference exactly; the
  * physical execution is Spark-shaped: the extract loop's serial
  * HTTP+set-dedup becomes scan → multi-pattern filter → window dedup;
  * the five eager pandas `apply` passes fuse into one projection; the
  * per-row MySQL dim loads become ranked-distinct broadcast dims; the
  * ship-all-rows-to-pandas analytics becomes distributed aggregation.
  */
object Pipeline {

  /** Extract (etl.py:40-70): multi-keyword search + per-subreddit top-N by
    * recency + keep-first dedup on post id + row projection.
    *
    * `raw` carries the pre-projection fields (id, title, selftext,
    * created_utc epoch seconds, url, subreddit). The 119-search Cartesian
    * loop collapses into one multi-pattern predicate; `limitPerSubreddit`
    * mirrors the reference's `limit=1000` per search (top-N by `sort=new`).
    */
  def extract(raw: DataFrame, keywords: Seq[String],
              limitPerSubreddit: Int): DataFrame = {
    require(keywords.nonEmpty,
      "extract requires at least one keyword (an empty list would build " +
        "the match-everything pattern '(?i)')")
    val pattern = "(?i)" + keywords.map(java.util.regex.Pattern.quote)
      .mkString("|")
    val projected = raw.select(
      col("id"),
      concat_ws(" ", col("title"), col("selftext")).as("content"),
      timestamp_seconds(col("created_utc")).as("date"),
      col("url"), col("subreddit"))
    val matched = projected
      .where(Text.regexFlag(col("content"), pattern))
    val deduped = Dedup.keepFirst(matched, Seq("id"),
      Seq(col("date").desc, col("subreddit").asc))
    Agg.topNPerGroup(deduped, Seq("subreddit"),
        Seq(col("date").desc, col("id").asc), limitPerSubreddit)
      .drop("rk")
  }

  /** Transform (etl.py:72-81): the five derived columns in ONE projection
    * (the reference runs five full-column eager passes — §3.2).
    */
  def transform(posts: DataFrame): DataFrame =
    posts
      .withColumn("clean_content", Text.cleanText(col("content")))
      .withColumn("sentiment", Sentiment.score(col("clean_content")))
      .withColumn("sentiment_label", Text.sentimentLabel(col("sentiment")))
      .withColumn("dropout_mentioned",
        Text.regexFlag(col("clean_content")))
      .withColumn("year", year(col("date")))

  /** Fact rows: enriched posts with both dim keys resolved (shared by
    * [[load]] and [[loadIncremental]]).
    */
  private def buildFact(enriched: DataFrame, dimSubreddit: DataFrame,
                        dimTime: DataFrame): DataFrame =
    Star.lookup(
        Star.lookup(enriched,
          dimSubreddit.withColumnRenamed("name", "subreddit"), "subreddit"),
        dimTime, "year")
      .select(col("id").as("post_id"), col("clean_content").as("content"),
        col("url"), col("sentiment"), col("dropout_mentioned"),
        col("subreddit_id"), col("time_id"))

  /** Load (etl.py:84-129): star schema with deterministic surrogate keys
    * and upsert-ignore semantics. Returns (dimSubreddit, dimTime, fact).
    */
  def load(enriched: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val dimSubreddit = Star.dim(enriched, "subreddit", "subreddit_id")
      .withColumnRenamed("subreddit", "name")
    val dimTime = Star.dim(enriched, "year", "time_id")
    (dimSubreddit, dimTime, buildFact(enriched, dimSubreddit, dimTime))
  }

  /** Incremental load with INSERT IGNORE semantics (etl.py:97,106,122):
    * dims grow via dimUpsert, fact rows already present are dropped.
    */
  def loadIncremental(existing: (DataFrame, DataFrame, DataFrame),
                      enriched: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val (exDimSub, exDimTime, exFact) = existing
    val dimSubreddit = Star.dimUpsert(
      exDimSub.withColumnRenamed("name", "subreddit"), enriched,
      "subreddit", "subreddit_id").withColumnRenamed("subreddit", "name")
    val dimTime = Star.dimUpsert(exDimTime, enriched, "year", "time_id")
    // dedup the incoming batch against ITSELF too — a PK (INSERT IGNORE)
    // admits one row per post_id even when the batch carries duplicates;
    // deterministic winner via content/url order
    val newFact = Dedup.keepFirst(
      buildFact(enriched, dimSubreddit, dimTime), Seq("post_id"),
      Seq(col("content").asc_nulls_last, col("url").asc_nulls_last))
    val fact = exFact.unionByName(
      Star.upsertIgnore(exFact, newFact, Seq("post_id")))
    (dimSubreddit, dimTime, fact)
  }

  /** Analytics view (etl.py:139-158): fact ⋈ dims projecting exactly the
    * reference's four columns, sentiment label re-derived (etl.py:152-154
    * recomputes it rather than loading it).
    */
  def analyticsView(dimSubreddit: DataFrame, dimTime: DataFrame,
                    fact: DataFrame): DataFrame =
    Star.starJoin(fact,
        Seq((dimSubreddit, "subreddit_id"), (dimTime, "time_id")))
      .select(col("sentiment"), col("dropout_mentioned"), col("year"),
        col("name").as("subreddit"))
      .withColumn("sentiment_label", Text.sentimentLabel(col("sentiment")))

  /** Chart 1 (etl.py:163): sentiment distribution. */
  def sentimentDistribution(view: DataFrame): DataFrame =
    view.groupBy("sentiment_label").agg(count(lit(1)).as("n"))
      .orderBy("sentiment_label")

  /** Chart 2 (etl.py:173): posts per year × dropout flag, year-ordered. */
  def postsPerYear(view: DataFrame): DataFrame =
    view.groupBy("year", "dropout_mentioned").agg(count(lit(1)).as("n"))
      .orderBy(col("year"), col("dropout_mentioned"))

  /** Chart 3 (etl.py:183): subreddit × label pivot with zero fill. */
  def subredditHeatmap(view: DataFrame): DataFrame =
    Agg.pivotCounts(view, "subreddit", "sentiment_label",
      Seq("negative", "neutral", "positive")).orderBy("subreddit")

  /** Insights block (etl.py:194-205): the five printed scalars, one row.
    * Argmaxes tie-break on the smaller key (pandas idxmax first-wins).
    */
  def insights(view: DataFrame): DataFrame = {
    val top = (k: String) => Agg.argmaxByCount(view, k).select(col(k))
    view.agg(
        count(lit(1)).as("total_posts"),
        sum(col("dropout_mentioned").cast("long")).as("dropout_mentions"),
        // floor((10000*k)/n)/100 over exact integer counts — avg() of 0/1
        // doubles is engine-order-sensitive in the last ulp (see q19)
        (floor(lit(10000.0) *
            sum((col("sentiment_label") === "neutral").cast("long")) /
            count(lit(1))) / 100).as("pct_neutral"))
      .crossJoin(top("year").withColumnRenamed("year", "most_active_year"))
      .crossJoin(top("subreddit")
        .withColumnRenamed("subreddit", "top_subreddit"))
  }
}
