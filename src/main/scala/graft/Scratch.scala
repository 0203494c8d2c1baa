package graft
import org.apache.spark.sql.functions._
import graft.ops._
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    time("warmup")(Tables.load(spark, dir, "documents").count())
    for (q <- Seq("q32_minhash_pairs", "q33_jaccard_pairs", "q34_simhash",
        "q70_media_features"))
      time(q)(noop(SparkEntry.queries(q)(spark, dir)))
    spark.stop()
  }
}
