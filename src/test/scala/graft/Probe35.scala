package graft

import org.apache.spark.sql.functions._

/** Dev probe: q35 simhash near-dup pair phases at sf0.1. */
object Probe35 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")
    def time(name: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"$name%-28s ${ts.sorted.apply(1)}%6.2f s (median of 3)")
    }
    val sigs = docs.select(col("doc_id").as("id"),
      graft.ops.Text.cleanTokens(col("text")).as("t"))
      .select(col("id"), graft.ops.Dedup.simhash16Native(col("t")).as("sh"))
    time("sigs only")(
      sigs.write.format("noop").mode("overwrite").save())
    val banded = sigs.select(col("id"), col("sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sh"), 4 * b).bitwiseAND(15).as("nib"))): _*))
        .as("bn"))
      .select(col("id"), col("sh"),
        col("bn.band").as("band"), col("bn.nib").as("nib"))
    time("banded only")(
      banded.write.format("noop").mode("overwrite").save())
    val joined = banded.as("a").hint("shuffle_hash").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.nib") === col("b.nib") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
    time("join+hamming count")(
      println("  pairs: " + joined.count()))
    time("join+hamming noop")(
      joined.write.format("noop").mode("overwrite").save())
    val filt = joined.where(col("hamming") <= 3)
    time("join+filter")(
      filt.write.format("noop").mode("overwrite").save())
    time("full (with distinct)")(
      filt.distinct().write.format("noop").mode("overwrite").save())
    time("q35 as registered")(
      SparkEntry.queries("q35_simhash_dups")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
