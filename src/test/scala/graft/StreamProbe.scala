package graft

import org.apache.spark.sql.functions._

/** Dev utility: run one stream-stream join gate and print per-batch
  * durations from the streaming progress log, to see where the gate's
  * wall time actually goes.
  *
  *   sbt "Test/runMain graft.StreamProbe /root/testdata/sf0.1"
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val stage = graft.streaming.StreamOps.stageEvents(spark, dir, 3)
    println(f"stage: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val ns = spark.newSession()
    ns.conf.set("spark.sql.shuffle.partitions", "2")
    val l = graft.streaming.StreamOps.eventsStream(ns, stage)
    val r = graft.streaming.StreamOps.eventsStream(ns, stage)
    val df = graft.streaming.StreamOps.streamStreamJoin(
      l, r, windowSeconds = 900, watermark = "36500 days")
    val t1 = System.nanoTime()
    val name = "probe_join"
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    println(f"run: ${(System.nanoTime() - t1) / 1e9}%.2f s, " +
      s"rows=${ns.table(name).count()}")
    q.recentProgress.foreach { p =>
      val d = p.durationMs
      println(s"batch ${p.batchId}: total=${p.batchDuration} " +
        s"addBatch=${d.get("addBatch")} getBatch=${d.get("getBatch")} " +
        s"commit=${d.get("commitBatch")} " +
        s"planning=${d.get("queryPlanning")} " +
        s"walCommit=${d.get("walCommit")} " +
        s"trigger=${d.get("triggerExecution")}")
    }
    spark.stop()
  }
}
