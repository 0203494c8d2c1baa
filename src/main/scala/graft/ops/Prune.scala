package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Semi-join reduction with a Bloom filter — the classic distributed-join
  * optimization (ship a KB-scale filter instead of shuffling the big
  * side), built on Spark's own sketch expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the pair Spark's
  * AQE runtime-filter rule injects) driven explicitly through the
  * [[org.apache.spark.sql.graftbridge.Bridge]].
  *
  * Why explicit when AQE has `spark.sql.optimizer.runtimeFilter.*`? Same
  * reason [[Skew.saltedJoin]] exists next to AQE's skew split: the
  * automatic rule only fires under size/selectivity heuristics and only
  * inside one query plan — the explicit form works across plan
  * boundaries (build once, prune many queries), under fixed plans, and
  * as a documented, testable operator.
  *
  * Correctness contract: the Bloom pre-filter admits false POSITIVES
  * only — never false negatives — so `prefilter → exact join` is
  * result-identical to the exact join alone. The oracle for q131 is the
  * plain IN-subquery; identity is the claim, the plan shows the
  * `might_contain` scan filter.
  */
object Prune {

  /** Build the serialized Bloom filter over xxhash64 of `keyCol` —
    * one aggregate job, one binary value to the driver (KBs–MBs; the
    * same driver-side footprint a broadcast of the key set would need,
    * at a fraction of the size). Returns None on an empty/null-only
    * build side.
    */
  def bloomFilterOf(keys: DataFrame, keyCol: String,
                    expectedItems: Long = 1000000L,
                    numBits: Long = 8388608L): Option[Array[Byte]] = {
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(col(keyCol))),
      Bridge.expression(lit(expectedItems)),
      Bridge.expression(lit(numBits)))
    val row = keys
      .select(Bridge.column(agg.toAggregateExpression()).as("bf")).head()
    Option(row.getAs[Array[Byte]](0))
  }

  /** Membership probe against a built filter: true or maybe-true. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType),
      Bridge.expression(xxhash64(key))))

  /** Bloom-pruned EXACT left-semi join: probe the filter at the big
    * side's scan (false positives pass, false negatives impossible),
    * then close with the exact semi join on the survivors. At 100 TB the
    * pre-filter drops non-matching rows before the exchange — shuffle
    * volume ∝ matches (+ fpp), not corpus size.
    */
  def bloomSemiJoin(big: DataFrame, small: DataFrame,
                    bigKey: String, smallKey: String,
                    expectedItems: Long = 1000000L,
                    numBits: Long = 8388608L): DataFrame = {
    val pruned = bloomFilterOf(small, smallKey, expectedItems, numBits)
      .map(bf => big.where(mightContain(bf, col(bigKey))))
      .getOrElse(big.where(lit(false))) // empty build side: nothing joins
    // key renamed on the build side so bigKey == smallKey can't make the
    // join condition ambiguous (semi join output carries big's columns
    // only, so the rename never escapes)
    pruned.join(small.select(col(smallKey).as("__bloom_k")).distinct(),
      pruned(bigKey) === col("__bloom_k"), "left_semi")
  }
}
