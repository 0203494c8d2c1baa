package graft

import org.apache.spark.sql.functions._
import graft.ops.Agg

/** Dev probe: q265's run-to-run spread (r13 driver reps ranged
  * 1.8–7.5 s on identical state). Times 8 back-to-back reps in ONE
  * JVM and decomposes one rep into its stages, so the variance can be
  * attributed to a stage (scan / explode+md5 / window) or to the JVM
  * (JIT, GC).
  */
object Probe265 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.load(spark, dir, "events")
    println(s"events rows: ${ev.count()}")
    def once(): Double = {
      val t0 = System.nanoTime()
      Agg.bootstrapMeanCi(ev, "event_type", "event_id", "value")
        .orderBy("event_type")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val reps = (1 to 8).map { i =>
      System.gc()
      val t = once()
      println(f"rep $i%2d  $t%6.2f s")
      t
    }
    println(f"min ${reps.min}%.2f  median ${reps.sorted.apply(3)}%.2f  " +
      f"max ${reps.max}%.2f")
    // stage decomposition: the b-way expansion + md5 weights alone
    val b = 40
    val t1 = System.nanoTime()
    ev.select(col("event_type"), col("event_id"), col("value"))
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("__rep", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("__u", conv(substring(
          md5(concat(col("event_id").cast("string"), lit(":"),
            col("__rep").cast("string"))), 1, 4), 16, 10)
        .cast("double") / 65536.0)
      .groupBy(col("event_type"), col("__rep"))
      .agg(sum(col("__u")).as("s"))
      .write.format("noop").mode("overwrite").save()
    println(f"explode+md5+agg stage alone: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
