package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Present._

/** Present.presentBy — the r17 presentation-sort rewrite (guide §2.4:
  * an orderBy used only for output determinism; its range-sampling
  * pass recomputes the sort's child). The contract: IDENTICAL rows in
  * IDENTICAL order to `orderBy` whenever the sort keys are a total
  * order — which every converted query's keys are (unique-id keys;
  * audited with ProbeSortKeys at sf0.1 before conversion).
  */
class PresentSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local("4")
  private lazy val dir = "/root/testdata/sf0.001"

  test("presentBy == orderBy (rows AND order) on generated frames " +
      "with total keys — including desc order and null keys") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // deterministic generated frame: unique key, shuffled input order,
    // nulls in a secondary column, repeated values in the payload
    val rng = new scala.util.Random(17)
    val rows = rng.shuffle((0 until 997).toList).map { i =>
      (i.toLong, if (i % 7 == 0) null else s"g${i % 13}", i % 5)
    }
    val df = rows.toDF("id", "grp", "v").repartition(7)
    val a = df.orderBy(col("grp").desc_nulls_last, col("id")).collect()
    val b = df.presentByCols(col("grp").desc_nulls_last, col("id"))
      .collect()
    assert(a.toSeq === b.toSeq) // order-sensitive Seq equality
    val c = df.orderBy("id").collect()
    val d = df.presentBy("id").collect()
    assert(c.toSeq === d.toSeq)
  }

  test("a converted query's plan has NO range exchange and exactly " +
      "one result-sized presentation exchange (the sampling pass is " +
      "gone)") {
    spark.sparkContext.setLogLevel("WARN")
    val p = SparkEntry.queries("q50_text_stats")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("rangepartitioning"), p.take(1200))
    assert("Exchange SinglePartition, REPARTITION_BY_NUM".r
      .findAllIn(p).size === 1, p.take(1200))
  }
}
