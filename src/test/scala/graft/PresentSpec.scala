package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Present._

/** Present.presentBy / presentLargeBy — the presentation-sort shapes.
  *
  * r17 (presentBy): an orderBy used only for output determinism pays a
  * range-sampling pass that recomputes the sort's child (guide §2.4);
  * for RESULT-sized frames repartition(1) + local sort keeps identical
  * rows and order with no sampling pass.
  *
  * r18 (presentLargeBy, verdict #1): a CORPUS-sized result must NOT be
  * funneled through one task — those queries keep the scale-safe range
  * sort and instead materialize the child once (lazy localCheckpoint),
  * so the sampling pass reads persisted blocks instead of recomputing
  * the operator pipeline.
  */
class PresentSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local("4")
  private lazy val dir = "/root/testdata/sf0.001"

  test("presentBy AND presentLargeBy == orderBy (rows AND order) on " +
      "generated frames with total keys — including desc order and " +
      "null keys") {
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
    val b2 = df.presentLargeByCols(col("grp").desc_nulls_last, col("id"))
      .collect()
    assert(a.toSeq === b2.toSeq)
    val c = df.orderBy("id").collect()
    val d = df.presentBy("id").collect()
    assert(c.toSeq === d.toSeq)
    val d2 = df.presentLargeBy("id").collect()
    assert(c.toSeq === d2.toSeq)
  }

  test("a small-result presentBy query's plan has NO range exchange " +
      "and exactly one result-sized presentation exchange") {
    spark.sparkContext.setLogLevel("WARN")
    val p = SparkEntry.queries("q120_median_rank")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("rangepartitioning"), p.take(1200))
    assert("Exchange SinglePartition, REPARTITION_BY_NUM".r
      .findAllIn(p).size === 1, p.take(1200))
  }

  test("a corpus-sized presentLargeBy query keeps the RANGE sort (no " +
      "single-task funnel) over a MATERIALIZED child (no pipeline " +
      "recompute in the sampling pass)") {
    spark.sparkContext.setLogLevel("WARN")
    val p = SparkEntry.queries("q50_text_stats")(spark, dir)
      .queryExecution.executedPlan.toString
    // scale-safe: the presentation sort is range-partitioned, and the
    // result is never repartition(1)-funneled
    assert(p.contains("rangepartitioning"), p.take(1200))
    assert(!p.contains("Exchange SinglePartition, REPARTITION_BY_NUM"),
      p.take(1200))
    // non-recomputed child: the range exchange's subtree is the
    // checkpointed leaf, not a second copy of the tokenize pipeline
    assert(p.contains("ExistingRDD"), p.take(1200))
  }
}
