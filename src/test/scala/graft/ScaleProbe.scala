package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev main: MEASURED scaling curves for the headline dedup/CC/graph
  * queries (SCALE.md's "would the slope hold?" rows, previously
  * analysis-only).
  *
  * Self-replicates a fixture dir ×R with disjoint id spaces and a
  * TOKEN-BIJECTIVE text rewrite per copy (every token prefixed with a
  * copy tag): a bijection on tokens preserves every within-copy
  * shingle-set Jaccard exactly and makes cross-copy token sets
  * disjoint, so the ×R corpus is R independent copies of the original
  * pair graph — the ground-truth expectation for a linear-work
  * operator is wall-time ∝ R on fixed cores, and any superlinear bend
  * is the operator's own (shuffle growth, skew, driver state), not an
  * artifact of replication-induced cross-copy dups.
  *
  * Usage: Test/runMain graft.ScaleProbe [baseDir] [scales] [queries]
  * Prints one JSON line per (scale, query) with cold wall seconds.
  */
object ScaleProbe {

  private val Off = 100000000L

  private def scaledDocs(docs: DataFrame, r: Int): DataFrame =
    (0 until r).map { i =>
      if (i == 0) docs
      else {
        // one regex pass per copy, build-time only (not timed): tokens
        // t -> "z<letter>t" — bijective, so within-copy Jaccard is
        // preserved and cross-copy shingle sets are disjoint. The tag
        // must be LETTERS ONLY: cleanTokens strips digits, so a "z1"
        // tag would collapse every copy to the same post-clean tokens
        // and manufacture R-1 exact twins per doc — the first probe
        // run did exactly that and measured its own artifact (q121
        // 5.5 s -> 122 s at x4 from the quadratic cross-copy graph)
        val tag = ('a' + (i - 1)).toChar
        require(r <= 26, s"copy tag is a single letter; got r=$r")
        docs
          .withColumn("doc_id", col("doc_id") + lit(i * Off))
          .withColumn("text",
            regexp_replace(col("text"), "([A-Za-z0-9]+)", s"z$tag$$1"))
      }
    }.reduce(_ unionByName _)

  private def scaledKeyed(df: DataFrame, keys: Seq[String], r: Int)
      : DataFrame =
    (0 until r).map { i =>
      keys.foldLeft(df)((d, k) =>
        d.withColumn(k, col(k) + lit(i * Off)))
    }.reduce(_ unionByName _)

  /** Lineitem with per-copy VALUE-DOMAIN variation on the Spearman
    * measure columns: copy i shifts l_quantity/l_extendedprice by
    * i·10⁻³ — a within-copy rank-preserving bijection (rho unchanged)
    * that makes the copies' value sets DISJOINT, so the per-group
    * joint domain grows ∝ R like real near-unique measures do. Closes
    * the round-9 probe caveat (SCALE.md): plain replication repeats
    * values, silently fixing the domain engine's domain-side work at
    * ×1. The shift is applied (as +0.0) to copy 0 too so every copy
    * unions with one double type.
    */
  private def scaledLineitemDomain(df: DataFrame, r: Int): DataFrame =
    (0 until r).map { i =>
      Seq("l_orderkey", "l_partkey", "l_suppkey")
        .foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * Off)))
        .withColumn("l_quantity",
          col("l_quantity").cast("double") + lit(i * 1e-3))
        .withColumn("l_extendedprice",
          col("l_extendedprice").cast("double") + lit(i * 1e-3))
    }.reduce(_ unionByName _)

  /** Embeddings ×R: disjoint id spaces, vectors/labels kept — each
    * query's candidate cells and buckets grow ∝ R (the per-query scan
    * cost the ANN probes measure) while the q228-q232 query set stays
    * the 10 vec_id < 10 rows of copy 0.
    */
  private def scaledEmbeddings(df: DataFrame, r: Int): DataFrame =
    (0 until r).map { i =>
      df.withColumn("vec_id", col("vec_id") + lit(i * Off))
    }.reduce(_ unionByName _)

  private def buildScaled(spark: SparkSession, base: String, dir: String,
                          r: Int): Unit = {
    Files.createDirectories(Paths.get(dir))
    scaledDocs(Tables.load(spark, base, "documents"), r)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    scaledLineitemDomain(Tables.load(spark, base, "lineitem"), r)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    scaledKeyed(Tables.load(spark, base, "orders"),
        Seq("o_orderkey", "o_custkey"), r)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    scaledEmbeddings(Tables.load(spark, base, "embeddings"), r)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // events ×R with disjoint event/user ids and the time range kept:
    // per-user session state and per-window row counts grow ∝ R — the
    // state-scaling stress the streaming-gate probes (q235/q240/q241)
    // measure (round 10; previously symlinked unscaled)
    scaledKeyed(Tables.load(spark, base, "events"),
        Seq("event_id", "user_id"), r)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // remaining tables: symlink the originals (dimensions don't scale
    // in this probe; none of the probed queries read them anyway)
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach { t =>
      val link = Paths.get(s"$dir/$t.parquet")
      if (!Files.exists(link))
        Files.createSymbolicLink(link,
          Paths.get(s"$base/$t.parquet"))
    }
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val scales = (if (args.length > 1) args(1) else "1,4,16")
      .split(",").map(_.trim.toInt).toSeq
    val queries = (if (args.length > 2) args(2) else
      "q111_lsh_verified_pairs,q121_prefix_filter_pairs," +
        "q128_cc_converged,q137_pagerank,q78_prep_pipeline")
      .split(",").map(_.trim).toSeq
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_SCALE_DIR pins the replica root so several probe
    // processes (e.g. the r18 8-vs-32-core parallelism evidence) share
    // ONE build instead of re-replicating per process; a dir that
    // already has the last-written table is reused as-is
    val root = sys.env.get("SPARK_GRAFT_SCALE_DIR").getOrElse(
      Files.createTempDirectory("graft-scale").toString)
    for (r <- scales) {
      val dir = s"$root/x$r"
      if (!Files.exists(Paths.get(s"$dir/events.parquet")))
        buildScaled(spark, base, dir, r)
      for (q <- queries) {
        // Bench's methodology: one UNTIMED warm-up rep (codegen,
        // parquet footers), then timed reps with the artifact memo
        // CLEARED each time so artifact-building queries (q111/q128)
        // measure the build, not a cache hit; median reported.
        val times = (0 to 3).flatMap { rep =>
          graft.ops.Artifacts.clear()
          spark.sparkContext.getPersistentRDDs
            .values.foreach(_.unpersist(blocking = false))
          System.gc()
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          if (rep > 0) Some((System.nanoTime() - t0) / 1e9) else None
        }
        val med = times.sorted.apply(times.size / 2)
        println(f"""{"scale":$r,"query":"$q","sec":$med%.2f,"raw":[${
          times.map(t => f"$t%.2f").mkString(",")}]}""")
      }
    }
    spark.stop()
  }
}
