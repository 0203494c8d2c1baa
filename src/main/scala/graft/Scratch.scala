package graft
import org.apache.spark.sql.functions._
import graft.ops._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // reference-shaped raw posts derived from the documents fixture
    val raw = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id").cast("string").as("id"),
        col("text").as("title"), lit(null).cast("string").as("selftext"),
        (lit(1700000000L) + col("doc_id") * 86400).as("created_utc"),
        concat(lit("u/"), col("doc_id")).as("url"),
        col("source").as("subreddit"))
    val posts = Pipeline.extract(raw, Seq("stream", "merge", "window"), 100)
    println("extracted: " + posts.count())
    val enriched = Pipeline.transform(posts)
    val (dimSub, dimTime, fact) = Pipeline.load(enriched)
    println("dims: " + dimSub.count() + " subreddits, " +
      dimTime.count() + " years; fact: " + fact.count())
    val view = Pipeline.analyticsView(dimSub, dimTime, fact)
    println("--- sentiment distribution ---")
    Pipeline.sentimentDistribution(view).show(false)
    println("--- heatmap ---")
    Pipeline.subredditHeatmap(view).show(5, false)
    println("--- insights ---")
    Pipeline.insights(view).show(false)
    spark.stop()
  }
}
