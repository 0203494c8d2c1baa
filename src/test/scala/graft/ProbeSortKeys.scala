package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.grafttest.PlanRewrite

/** Dev probe (round 17): for each named query whose root is a global
  * Sort, report whether the final sort keys are a TOTAL order (no two
  * rows share a key tuple) at the given sf — the precondition under
  * which replacing the range sort with a single-partition local sort
  * provably preserves the exact output order.
  *
  *   sbt "Test/runMain graft.ProbeSortKeys /root/testdata/sf0.1 qA,qB"
  */
object ProbeSortKeys {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        PlanRewrite.rootSortChildKeys(df) match {
          case Some((child, keys)) =>
            val dups = child
              .groupBy(keys: _*).agg(count(lit(1)).as("n"))
              .where(col("n") > 1).limit(1).count()
            val total = child.count()
            println(s"== $n: ${if (dups == 0) "TOTAL" else "DUPS"}" +
              s" (rows $total, keys ${keys.size})")
          case None => println(s"== $n: NO-ROOT-SORT")
        }
      } catch { case e: Throwable =>
        println(s"== $n: ERROR ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
