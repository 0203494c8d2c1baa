package graft
import org.apache.spark.sql.functions._
object Probe233b {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.load(spark, dir, "lineitem")
    def time(name: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"$name%-12s ${ts.sorted.apply(1)}%6.2f s (median of 3)")
    }
    time("preflight") {
      ops.Agg.spearmanEngine(li, "l_returnflag", "l_quantity",
        "l_extendedprice", 32L)
    }
    time("windowed") {
      ops.Agg.spearmanCorr(li, "l_returnflag", "l_quantity",
          "l_extendedprice")
        .orderBy("l_returnflag")
        .write.format("noop").mode("overwrite").save()
    }
    time("auto") {
      ops.Agg.spearmanAuto(li, "l_returnflag", "l_quantity",
          "l_extendedprice")
        .orderBy("l_returnflag")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
