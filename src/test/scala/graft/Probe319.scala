package graft

import org.apache.spark.sql.functions._

import graft.ops.{Artifacts, Dedup}

/** Dev probe: the q319 survivor-re-label cost shape — pairs the
  * fixpoint reads under the full re-fold (r16) vs the incremental
  * contraction (r17, Dedup.componentsAfterDelete): touched components
  * only. Prints the SCALE.md decision-table numbers.
  */
object Probe319 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS",
      "32"))
    spark.sparkContext.setLogLevel("WARN")
    val pairs = Artifacts.nearDupPairs(spark, dir,
      k = 8, bands = 4, minJaccard = 0.2).localCheckpoint()
    val labels = Artifacts.components(spark, dir,
      k = 8, bands = 4, minJaccard = 0.2).localCheckpoint()
    val nPairs = pairs.count()
    val surviving = pairs
      .where(col("id_a") % 7 =!= 3 && col("id_b") % 7 =!= 3)
    val nSurviving = surviving.count()
    val nComponents = labels.select("component").distinct().count()
    val deleted = Tables.load(spark, dir, "documents")
      .where(col("doc_id") % 7 === 3).select("doc_id")
    val touched = labels.join(deleted, Seq("doc_id"), "left_semi")
      .select("component").distinct().localCheckpoint()
    val nTouched = touched.count()
    val touchedPairs = pairs
      .join(labels.select(col("doc_id").as("id_a"), col("component")),
        Seq("id_a"))
      .join(touched, Seq("component"), "left_semi")
    val nTouchedPairs = touchedPairs.count()
    val nTouchedSurviving = touchedPairs
      .where(col("id_a") % 7 =!= 3 && col("id_b") % 7 =!= 3).count()
    println(s"== sf dir: $dir")
    println(s"== pair artifact rows: $nPairs")
    println(s"== surviving pairs (r16 fixpoint input): $nSurviving")
    println(s"== components: $nComponents, touched by the delete: " +
      s"$nTouched")
    println(s"== touched components' pairs: $nTouchedPairs; their " +
      s"surviving pairs (r17 fixpoint input): $nTouchedSurviving")
    println(f"== fixpoint input cut: $nSurviving -> " +
      f"$nTouchedSurviving (${100.0 * nTouchedSurviving / math.max(1L,
        nSurviving)}%.1f%% of the r16 read)")
    spark.stop()
  }
}
