package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.registry._

/** Driver contract — one named query per operator from SURVEY.md §2 plus the
  * north-star extensions (dedup family, similarity search, text analysis,
  * event windows, multimodal plumbing), each with DuckDB-runnable oracle SQL
  * over the same parquet tables.
  *
  * Cross-engine determinism rules (SURVEY.md §7.4) used throughout:
  *   - money sums go through DECIMAL(18,2) (exact, order-insensitive) and
  *     are surfaced as DOUBLE, matching `CAST(SUM(CAST(x AS DECIMAL(18,2)))
  *     AS DOUBLE)` bit-for-bit;
  *   - every hash is md5 (identical in Spark and DuckDB);
  *   - every query ends in a total ORDER BY with explicit tie-breaks;
  *   - window keys are epoch seconds (BIGINT), never engine timestamps.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's whole analytics spine (SURVEY.md §7.3 M1): clean →
    * sentiment → label → dims → fact → star-join-back → distribution.
    */
  def entry(spark: SparkSession): DataFrame =
    Shared.labelDistribution(spark, "/root/testdata/sf0.001")

  // The inventory lives in graft.registry, one file per family (the
  // round-9 6.6k-line single file was a merge bottleneck); ListMap ++
  // preserves each part's insertion order, so Verify still runs the
  // queries in the historical q01..q286 order.

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Reg1RefParity.queries ++ Reg2Relational.queries ++
      Reg3Curation.queries ++ Reg4GraphStats.queries ++
      Reg5Artifacts.queries ++ Reg6MonitorAnn.queries

  def oracleSql: Map[String, String] =
    Reg1RefParity.oracles ++ Reg2Relational.oracles ++
      Reg3Curation.oracles ++ Reg4GraphStats.oracles ++
      Reg5Artifacts.oracles ++ Reg6MonitorAnn.oracles
}
