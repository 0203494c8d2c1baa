package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    Seq("q60_tumbling_counts", "q61_sliding_counts", "q62_sessionize",
      "q63_asof_join").foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        println(s"== $n rows=" + df.count())
      } catch { case e: Throwable =>
        println(s"== $n FAILED: ${e}")
      }
    }
    spark.stop()
  }
}
