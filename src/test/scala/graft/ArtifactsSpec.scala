package graft

import org.apache.spark.sql.functions._

import graft.ops.{Artifacts, Dedup}

/** The materialize-once artifact layer: identity on cache hits, value
  * equality with the direct pipeline, and parameter isolation.
  */
class ArtifactsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("cache hit returns the SAME frame; values equal the direct " +
    "pipeline; thresholds get separate artifacts") {
    Artifacts.clear()
    val a = Artifacts.nearDupPairs(spark, dir)
    val b = Artifacts.nearDupPairs(spark, dir)
    assert(a eq b, "second call must be a cache hit, not a rebuild")

    val direct = Dedup.lshVerifiedPairs(
      Tables.load(spark, dir, "documents"), "doc_id", "text",
      k = 8, bands = 4, minJaccard = 0.2)
    assert(a.orderBy("id_a", "id_b").collect().toSeq ===
      direct.orderBy("id_a", "id_b").collect().toSeq)

    val hi = Artifacts.nearDupPairs(spark, dir, minJaccard = 0.8)
    assert(!(hi eq a), "different threshold must be a different artifact")
    assert(hi.count() <= a.count())
    Artifacts.clear()
  }

  test("components artifact equals CC over the pair artifact and is " +
    "memoized independently") {
    Artifacts.clear()
    val comp = Artifacts.components(spark, dir)
    assert(comp eq Artifacts.components(spark, dir))
    val direct = Dedup.componentsConverged(
      Artifacts.nearDupPairs(spark, dir))
    assert(comp.orderBy("doc_id").collect().toSeq ===
      direct.orderBy("doc_id").collect().toSeq)
    // label invariant: every component id is the min doc_id it labels
    assert(comp.groupBy("component").agg(min("doc_id").as("m"))
      .where(col("m") =!= col("component")).count() === 0)
    Artifacts.clear()
  }
}
