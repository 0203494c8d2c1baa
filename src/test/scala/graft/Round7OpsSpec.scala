package graft

import org.apache.spark.sql.functions._

import graft.ops.{Agg, Artifacts, Dedup}

/** Round-7 composition operators: MAD, leakage-safe split. */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  test("madByRank: hand-checked median and MAD; robust to one outlier") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 1000.0)).toDF("k", "x")
    val r = Agg.madByRank(df, "k", "x").collect().head
    // median = 3; deviations |x-3| = 2,1,0,1,997 -> median 1
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Double]("p50") === 3.0)
    assert(r.getAs[Double]("mad") === 1.0)
    // the outlier moved stddev to ~446 but MAD stays 1 — the point
  }

  test("leakage-safe split: every near-dup component lands in ONE fold") {
    Artifacts.clear()
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q172_leakage_safe_split")(spark, dir)
    // fold is constant within split_group by construction; assert it
    assert(out.groupBy("split_group")
      .agg(countDistinct(col("fold")).as("nf"))
      .where(col("nf") =!= 1).count() === 0)
    // and split_group really is the CC component for paired docs
    val comp = Dedup.componentsConverged(
      Artifacts.nearDupPairs(spark, dir))
    val joined = out.join(comp, Seq("doc_id"))
    assert(joined.where(col("split_group") =!= col("component"))
      .count() === 0)
    // all 5 folds populated on the fixture
    assert(out.select("fold").distinct().count() === 5)
    Artifacts.clear()
  }
}
