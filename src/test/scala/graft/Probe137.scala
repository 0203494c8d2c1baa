package graft

import org.apache.spark.sql.functions._

/** Dev probe: phase-by-phase timing of the q137 PageRank pipeline. */
object Probe137 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def t(n: String) = Tables.load(spark, dir, n)

    val e0 = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("src"),
        (col("l_suppkey").cast("long") * 2 + 1).as("dst"),
        lit(1L).as("w"))
    val edges0 = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))

    // replicate pageRankFixed body with timing
    val scale = 1000000000000L; val dampPct = 85
    val edges = time("edges groupBy+checkpoint")(
      edges0.groupBy("src", "dst").agg(sum(col("w")).as("w"))
        .localCheckpoint())
    println(s"   edge rows: ${edges.count()}")
    val outw = edges.groupBy("src").agg(sum(col("w")).as("outw"))
    val ew = time("ew join+checkpoint")(edges.join(outw, "src").localCheckpoint())
    val nodes = time("nodes distinct+checkpoint")(
      edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node")))
        .distinct().localCheckpoint())
    val n = time("node count")(nodes.count())
    println(s"   nodes: $n")
    val base = (scale - scale * dampPct / 100) / n
    var ranks = nodes.select(col("node"), lit(scale / n).as("r"))
    for (i <- 1 to 3) {
      ranks = time(s"iter $i") {
        val inflow = ew.join(ranks, ew("src") === ranks("node"))
          .select(col("dst"), expr("r * w div outw").as("share"))
          .groupBy("dst").agg(sum(col("share")).as("inflow"))
        nodes.join(inflow, nodes("node") === inflow("dst"), "left")
          .select(col("node"),
            (lit(base) +
              expr(s"$dampPct * coalesce(inflow, 0L) div 100")).as("r"))
          .localCheckpoint()
      }
    }
    time("final orderBy/limit collect")(
      ranks.orderBy(col("r").desc, col("node").asc).limit(25).collect()
        .foreach(_ => ()))
    println("== iter-3 plan ==")
    println(ranks.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
