package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) expressed as a KEYED
  * AGGREGATION rather than an opaque binary blob: the sketch is a
  * DataFrame of (row, bucket, count) cells, built by one
  * explode + partial-aggregated groupBy.
  *
  * Why this shape instead of Spark's `count_min_sketch` binary agg:
  *
  *   - Mergeable by construction: CMS union is cell-wise ADDITION, so
  *     merging the sketches of two corpus shards is
  *     `union.groupBy(r, b).sum` — the same materialized-view shape as
  *     q116/q122, and the merged matrix is BIT-IDENTICAL to the one-shot
  *     matrix (integer sums commute). Incremental frequency state for a
  *     100 TB corpus is d*w BIGINTs, not a rescan.
  *   - Engine-portable: the row hashes are md5-nibble arithmetic, so the
  *     DuckDB oracle replays the exact cells — a binary sketch blob can
  *     only be rows-only checked (the q90 weakness this family avoids).
  *   - Bounded state: d*w cells total regardless of key cardinality; the
  *     probe join broadcasts the matrix, never shuffles the corpus.
  *
  * Estimates carry the one-sided CMS guarantee: est >= true count always
  * (collisions only ADD), within eN/w with probability 1-(1/2)^d for the
  * standard hash-family analysis.
  */
object Sketch {

  /** Bucket of `key` under row-salted md5: first 8 md5 nibbles of
    * "row:key" mod `w`. 32 hash bits >> bucket counts, row salt makes the
    * d rows independent draws from the family.
    */
  private def hashBucket(key: Column, row: Int, w: Int): Column =
    (conv(substring(md5(concat(lit(s"$row:"), key.cast("string"))), 1, 8),
      16, 10).cast("long") % w).cast("int")

  /** The d (row, bucket) coordinates of one key — an array literal, so
    * building all d rows per input row is one scan-local explode.
    */
  private def rowBuckets(key: Column, d: Int, w: Int): Column =
    array((0 until d).map(j =>
      struct(lit(j).as("r"), hashBucket(key, j, w).as("b"))): _*)

  /** d x w counter matrix over `keyCol`: (r, b, cnt). One explode (d rows
    * per input row) + one partial-aggregated groupBy — no windows, no
    * driver state; output is at most d*w rows whatever the input size.
    */
  def cmsCounters(df: DataFrame, keyCol: String, d: Int, w: Int)
      : DataFrame = {
    require(d >= 1 && d <= 16, s"need 1 <= d <= 16 rows, got $d")
    require(w >= 2, s"need w >= 2 buckets, got $w")
    df.select(explode(rowBuckets(col(keyCol), d, w)).as("rb"))
      .select(col("rb.r").as("r"), col("rb.b").as("b"))
      .groupBy("r", "b").agg(count(lit(1)).as("cnt"))
  }

  /** CMS union = cell-wise sum. Exact: merged(parts) == one-shot(whole). */
  def mergeCounters(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "mergeCounters: no parts")
    parts.reduce(_.unionByName(_))
      .groupBy("r", "b").agg(sum(col("cnt")).as("cnt"))
  }

  /** Point estimates for the keys in `probes(keyCol)`: min over the d
    * rows of the probed cell, 0 for never-seen cells. The counter matrix
    * is <= d*w rows by construction, so it BROADCASTS to the probe side —
    * estimating any number of keys costs one scan-local explode + one
    * broadcast join + one keyed min.
    */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, keyCol: String,
      d: Int, w: Int): DataFrame =
    probes.select(col(keyCol),
        explode(rowBuckets(col(keyCol), d, w)).as("rb"))
      .select(col(keyCol), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(counters), Seq("r", "b"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
}
