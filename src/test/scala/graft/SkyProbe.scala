package graft

import org.apache.spark.sql.functions._

import graft.ops.Agg

/** Dev utility: measure skyline one-level vs two-level on synthetic
  * WIDE x domains (every x distinct — the adversarial shape for the
  * single-task global window), to find where the one-level plan bends.
  *
  *   sbt "Test/runMain graft.SkyProbe 1000000,10000000"
  */
object SkyProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("1000000")
      .split(",").map(_.trim.toLong).toSeq
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("WARN")
    sizes.foreach { n =>
      // deterministic scatter: y correlates negatively with x plus a
      // hash ripple, so the frontier is non-trivial (~thousands of pts)
      val df = spark.range(n).select(col("id").as("x"),
        (lit(n) - col("id") +
          pmod(hash(col("id")), lit(1000000)).cast("long")).as("y"))
        .repartition(32)
      def time(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val c = f
        println(f"== n=$n $label: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
          s" ($c frontier rows)")
      }
      time("one-level ")(Agg.skyline(df, "x", "y").count())
      time("two-level ")(Agg.skylineTwoLevel(df, "x", "y", 32).count())
    }
    spark.stop()
  }
}
