package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Dev probe: phase timing of q130's componentsBigStar loop. */
object Probe130 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (rep <- 0 to 1) {
      println(s"--- rep $rep")
      graft.ops.Artifacts.clear()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val pairs = time("nearDupPairs artifact")(
        graft.ops.Artifacts.nearDupPairs(spark, dir, k = 8, bands = 4,
          minJaccard = 0.2))
      val p = time("p ckpt")(
        pairs.select(col("id_a"), col("id_b")).localCheckpoint())
      val nodes = time("nodes ckpt")(
        p.select(explode(array(col("id_a"), col("id_b"))).as("id"))
          .distinct().localCheckpoint())
      def star(edges: DataFrame, large: Boolean): DataFrame = {
        val mins = edges.groupBy("u").agg(min(col("v")).as("mn"))
          .select(col("u"), least(col("u"), col("mn")).as("m"))
        val joined = edges.join(mins, Seq("u"))
        val rehung =
          if (large) joined.where(col("v") > col("u"))
            .select(col("m").as("u"), col("v"))
          else joined.where(col("v") <= col("u") && col("v") =!= col("m"))
            .select(col("m").as("u"), col("v"))
            .union(mins.where(col("u") =!= col("m"))
              .select(col("m").as("u"), col("u").as("v")))
        rehung.where(col("v") =!= col("u")).distinct()
      }
      def sym(e: DataFrame): DataFrame =
        e.union(e.select(col("v").as("u"), col("u").as("v"))).distinct()
      def allSame(a: DataFrame, b: DataFrame, c: DataFrame): Boolean =
        a.select(col("u"), col("v"), lit(1).as("__t"))
          .unionAll(b.select(col("u"), col("v"), lit(2).as("__t")))
          .unionAll(c.select(col("u"), col("v"), lit(4).as("__t")))
          .groupBy("u", "v").agg(sum(col("__t")).as("__m"))
          .where(col("__m") =!= 7).isEmpty
      var edges = time("sym0 ckpt")(
        sym(p.select(col("id_a").as("u"), col("id_b").as("v")))
          .localCheckpoint())
      var round = 0; var done = false
      while (!done && round < 30) {
        val aL = time(s"r$round large ckpt")(
          sym(star(edges, large = true)).localCheckpoint())
        val aS = time(s"r$round small ckpt")(
          sym(star(aL, large = false)).localCheckpoint())
        done = time(s"r$round allSame")(allSame(edges, aL, aS))
        edges = aS; round += 1
      }
      println(s"rounds: $round")
    }
    spark.stop()
  }
}
