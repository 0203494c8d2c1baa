package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.{Dedup, Text}

/** Dev probe: stage-by-stage timing of the q121 prefix-filter pipeline. */
object Probe121 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val df = Tables.load(spark, dir, "documents")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val w = 3; val minJaccard = 0.8
    val toks = df.select(col("doc_id").as("id"),
      Text.cleanTokens(col("text")).as("t"))
    val sh = toks.select(col("id"),
      explode(array_distinct(Dedup.hashedShingles(col("t"), w))).as("sh"))
    time("shingle explode count")(println(sh.count()))
    val ordsh = sh
      .withColumn("d", count(lit(1)).over(Window.partitionBy("sh")))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("d"), col("sh")))).as("ord"))
      .select(col("id"), transform(col("ord"), e => e("sh")).as("ordsh"))
    val prefix = ordsh
      .select(col("id"), explode(slice(col("ordsh"), lit(1),
        (size(col("ordsh")) -
          ceil(size(col("ordsh")) * minJaccard) + 1).cast("int")))
        .as("sh"))
    time("prefix rows")(println(prefix.count()))
    val cands = prefix.as("a").hint("shuffle_hash")
      .join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    time("raw candidate rows")(println(cands.count()))
    val dcands = time("distinct cands + checkpoint")(
      cands.distinct().localCheckpoint())
    println(dcands.count())
    time("full q121 count")(println(
      Dedup.prefixFilterPairs(df, "doc_id", "text", 3, 0.8).count()))
    val stages =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val si = sc.stageInfo
          val dur = (for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s).getOrElse(-1L)
          val tm = si.taskMetrics
          val info = f"run ${tm.executorRunTime / 1000.0}%.1f cpu ${tm.executorCpuTime / 1e9}%.1f " +
            f"spillM ${tm.memoryBytesSpilled / 1e6}%.0f spillD ${tm.diskBytesSpilled / 1e6}%.0f " +
            f"tasks ${si.numTasks} rdd=${si.rddInfos.map(_.name).mkString("/").take(40)}"
          stages.add((si.stageId, dur, tm.jvmGCTime, info))
        }
      })
    import scala.jdk.CollectionConverters._
    def pools(): String =
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(p => p.getName.contains("CodeHeap") ||
          p.getName.contains("Metaspace") || p.getName.contains("Old"))
        .map(p => f"${p.getName.replace("CodeHeap ", "")}=" +
          f"${p.getUsage.getUsed / 1e6}%.0fM")
        .mkString(" ")
    val unpersist = sys.env.get("PROBE_UNPERSIST").contains("1")
    // age the JVM like a bench run; PROBE_AGE = reps per aging query
    // (bench runs 3, so 3 here reproduces its ~330 executions)
    val ageReps = sys.env.get("PROBE_AGE").map(_.toInt).getOrElse(0)
    if (ageReps > 0) {
      val t0 = System.nanoTime()
      SparkEntry.queries.keys.filterNot(_ == "q121_prefix_filter_pairs")
        .foreach { n =>
          for (_ <- 1 to ageReps) {
            System.gc()
            try SparkEntry.queries(n)(spark, dir)
              .write.format("noop").mode("overwrite").save()
            catch { case e: Throwable => println(s"   [age] $n failed: $e") }
            if (unpersist)
              spark.sparkContext.getPersistentRDDs.values
                .foreach(_.unpersist(blocking = false))
          }
        }
      println(f"== aged JVM, ${ageReps}x all other queries: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      println(s"   pools: ${pools()}")
    }
    for (i <- 1 to 4) {
      System.gc()
      if (unpersist)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      println(s"   pools: ${pools()}")
      stages.clear()
      time(s"q121 noop write (bench shape) rep $i")(
        SparkEntry.queries("q121_prefix_filter_pairs")(spark, dir)
          .write.format("noop").mode("overwrite").save())
      Thread.sleep(500)
      val top = stages.toArray(Array.empty[(Int, Long, Long, String)])
        .sortBy(-_._2).take(5)
      top.foreach { case (id, dur, gc, name) =>
        println(f"   stage $id%5d ${dur / 1000.0}%7.2f s  gc ${gc / 1000.0}%5.2f s  $name")
      }
    }
    spark.stop()
  }
}
