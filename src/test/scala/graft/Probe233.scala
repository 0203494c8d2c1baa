package graft

import org.apache.spark.sql.functions._
import graft.ops.Agg

/** Dev probe: the q233 dispatch decision re-measured on the real
  * fixture — windowed vs domain wall-clock on lineitem sf0.1, plus
  * the tie-density ratio (distinct (key,x)+(key,y) over 2·rows) the
  * round-10 ScaleProbe finding says should co-drive the routing.
  */
object Probe233 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.load(spark, dir, "lineitem")
    val (key, x, y) = ("l_returnflag", "l_quantity", "l_extendedprice")
    val r = li.agg(
      count(lit(1)).as("n"),
      approx_count_distinct(col(key)).as("nk"),
      approx_count_distinct(struct(col(key), col(x))).as("nkx"),
      approx_count_distinct(struct(col(key), col(y))).as("nky")).head()
    val (n, nk, nkx, nky) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    println(s"n=$n nk=$nk nkx=$nkx nky=$nky " +
      f"ratio=${(nkx + nky).toDouble / (2.0 * n)}%.4f")
    def time(name: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-10s ${ts.sorted.apply(1)}%6.2f s (median of 3)")
    }
    time("windowed") {
      Agg.spearmanCorr(li, key, x, y)
        .write.format("noop").mode("overwrite").save()
    }
    time("domain") {
      Agg.spearmanCorrDomain(li, key, x, y)
        .write.format("noop").mode("overwrite").save()
    }
    time("preflight") {
      li.agg(approx_count_distinct(col(key)),
          approx_count_distinct(struct(col(key), col(x))),
          approx_count_distinct(struct(col(key), col(y))))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
