package graft

/** Dev probe (round 17): how much does one `spark.read.parquet` cost
  * at PLAN time (file listing + footer schema inference) for the tiny
  * store files, and how much of it does an explicit `.schema(...)`
  * remove? Prints per-call medians for inferred vs explicit-schema vs
  * multi-path reads of a published lex-history root.
  */
object ProbeRead {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // ensure the history exists, take its roots
    val roots = graft.ops.LexIndex.ensureAppendHistory(spark, dir, "c4")
    val paths = roots.map(r => s"$r/tf")
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def time(label: String, n: Int)(f: => Unit): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"== $label: med ${med(ts)}%.4f s (n=$n)")
    }
    val sch = spark.read.parquet(paths.head).schema
    time("read.parquet (schema inferred), 1 path", 20)(
      spark.read.parquet(paths.head))
    time("read.schema(...).parquet, 1 path", 20)(
      spark.read.schema(sch).parquet(paths.head))
    time(s"read.parquet inferred, ${paths.size} paths separately", 10)(
      paths.foreach(p => spark.read.parquet(p)))
    time(s"read.parquet inferred, ${paths.size} paths one call", 10)(
      spark.read.parquet(paths: _*))
    time(s"read.schema one call, ${paths.size} paths", 10)(
      spark.read.schema(sch).parquet(paths: _*))
    // and the union-of-reads vs one multi-path read, ANALYZED
    time("unionByName of separate reads, analyzed", 10)(
      paths.map(p => spark.read.parquet(p))
        .reduce(_.unionByName(_)).queryExecution.analyzed)
    time("one multi-path read, analyzed", 10)(
      spark.read.schema(sch).parquet(paths: _*).queryExecution.analyzed)
    spark.stop()
  }
}
