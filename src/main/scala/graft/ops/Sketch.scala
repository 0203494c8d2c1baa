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

  /** HyperLogLog registers (Flajolet–Fusy–Gandouet–Meunier 2007) as a
    * KEYED AGGREGATION — the distinct-count sibling of [[cmsCounters]],
    * with the same three properties the CMS shape buys: mergeable by
    * construction (register union is cell-wise MAX, so sharded
    * register frames roll up bit-identically to the one-shot frame),
    * engine-portable (register index and rank are md5-nibble and
    * hex-string arithmetic — integer-exact, so the DuckDB oracle
    * replays every register, where Spark's approx_count_distinct HLL++
    * blob could only ever be rows-only checked), and bounded state
    * (≤ m rows per key whatever the corpus).
    *
    * Geometry: m = 256 registers — index = first 2 md5 nibbles, rank =
    * leading-zero count of the next 52 bits + 1 (capped 53, the
    * all-zero tail). The rank is computed on the HEX STRING (strip
    * leading '0' chars, then a 4-way CASE on the first non-zero
    * nibble) — exact in both engines, no log2/float anywhere.
    *
    * Output: (key, reg, mx).
    */
  def hllRegisters(df: DataFrame, keyCol: String, itemCol: String)
      : DataFrame = {
    val h = md5(col(itemCol).cast("string"))
    val reg = conv(substring(h, 1, 2), 16, 10).cast("int")
    val stripped = regexp_replace(substring(h, 3, 13), "^0+", "")
    val first = substring(stripped, 1, 1)
    // hex chars compare correctly: '0'..'9' < 'a'..'f' in ASCII
    val nzlz = when(first >= "8", 0)
      .when(first >= "4", 1)
      .when(first >= "2", 2)
      .otherwise(3)
    val rank = when(length(stripped) === 0, 53)
      .otherwise((lit(13) - length(stripped)) * 4 + nzlz + 1)
    df.select(col(keyCol).as("key"), reg.as("reg"), rank.as("rank"))
      .groupBy("key", "reg").agg(max(col("rank")).as("mx"))
  }

  /** HLL union = cell-wise max. Exact: merged(parts) == one-shot(whole). */
  def hllMerge(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "hllMerge: no parts")
    parts.reduce(_.unionByName(_))
      .groupBy("key", "reg").agg(max(col("mx")).as("mx"))
  }

  /** The m=256 estimator constant α·m²·2^52 — precomputed HERE and
    * embedded as one double literal in both engines, so neither engine
    * re-derives it through its own expression-evaluation order.
    */
  val HllC: Double = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 *
    4503599627370496.0

  /** Cardinality estimate per key from a register frame: the raw
    * harmonic estimate αm²/Σ2^−Mj with the indicator sum kept EXACT —
    * Σ2^−Mj is scaled by 2^52 into an integer T (Mj ≤ 53 ⇒ every term
    * is an exact bit shift; T < 2^61), so the only floats are the two
    * final divisions and the linear-counting ln. Small-range
    * correction: E ≤ 2.5m with empty registers → linear counting
    * m·ln(m/V) (the standard HLL regime switch).
    *
    * Output: (key, nz_registers, v_zero, hll_estimate) — the estimate
    * FLOORED to a BIGINT, keeping the compare integer-exact.
    */
  def hllEstimate(registers: DataFrame): DataFrame = {
    val t = (col("t_nz") +
      (lit(256L) - col("nz")) * lit(1L << 52)).as("t")
    val eRaw = lit(HllC) / col("t")
    registers.groupBy("key").agg(
        count(lit(1)).as("nz"),
        sum(expr("shiftleft(cast(1 as bigint), 52 - mx)")).as("t_nz"))
      .select(col("key"), col("nz"),
        (lit(256L) - col("nz")).as("v_zero"), t)
      .select(col("key"), col("nz").as("nz_registers"), col("v_zero"),
        floor(when(eRaw <= 640.0 && col("v_zero") > 0,
            lit(256.0) * log(lit(256.0) / col("v_zero")))
          .otherwise(eRaw)).cast("long").as("hll_estimate"))
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

  /** Misra–Gries candidate keys (Misra & Gries 1982, "Finding repeated
    * elements"): one pass with a capacity-`c` counter summary PER
    * PARTITION (mapPartitions; state is c counters however large the
    * partition), emitting each partition's surviving keys.
    *
    * Superset guarantee, partition-local form: if a key's GLOBAL count
    * exceeds n/(c+1), then on at least one partition its local count
    * exceeds that partition's n_p/(c+1) (else summing the per-partition
    * inequalities contradicts the global one), and the classic MG bound
    * says a key with count > n_p/(c+1) always survives a capacity-c
    * summary of that partition. So the UNION of per-partition survivors
    * contains every global heavy hitter — no cross-partition summary
    * merge (and no driver state) is needed for a candidate phase that
    * feeds an exact recount. Output: distinct candidate keys as strings,
    * <= c per input partition.
    */
  def mgCandidates(df: DataFrame, keyCol: String, capacity: Int)
      : DataFrame = {
    require(capacity >= 1, s"need capacity >= 1, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string")).as[String]
      .mapPartitions { it =>
        val counters = new java.util.LinkedHashMap[String, Long]()
        it.foreach { v =>
          if (counters.containsKey(v)) {
            counters.put(v, counters.get(v) + 1L)
          } else if (counters.size < capacity) {
            counters.put(v, 1L)
          } else {
            // decrement-all: the O(c) amortized step that pays for every
            // unmatched arrival by cancelling c counted ones
            val itK = counters.entrySet().iterator()
            while (itK.hasNext) {
              val e = itK.next()
              if (e.getValue == 1L) itK.remove()
              else e.setValue(e.getValue - 1L)
            }
          }
        }
        import scala.jdk.CollectionConverters._
        counters.keySet().iterator().asScala
      }
      .toDF("k").distinct()
  }

  /** EXACT heavy hitters by the two-pass candidate/recount shape a
    * 100 TB stream actually runs: phase 1 is [[mgCandidates]] (one scan,
    * bounded state, <= c candidates per partition), phase 2 recounts
    * ONLY the candidates exactly (broadcast semi-join + one keyed count)
    * and keeps those with count * (c+1) > n — the integer-exact form of
    * count > n/(c+1), which by the MG guarantee the candidate set
    * provably covers. The output is therefore IDENTICAL to the full
    * `groupBy(key).count.where(...)` — but the groupBy in phase 2 keys
    * on <= c*partitions values instead of the full key domain, which is
    * the entire point when the key domain doesn't fit a shuffle.
    *
    * Output: (key, exact_cnt, n_total, share) for every key with
    * exact_cnt*(capacity+1) > n_total, share floored at 6 dp.
    */
  def mgHeavyHitters(df: DataFrame, keyCol: String, capacity: Int)
      : DataFrame = {
    val cands = mgCandidates(df, keyCol, capacity)
    val nTotal = df.agg(count(lit(1)).as("n_total"))
    df.join(broadcast(cands), df(keyCol).cast("string") === cands("k"),
        "left_semi")
      .groupBy(keyCol).agg(count(lit(1)).as("exact_cnt"))
      .crossJoin(broadcast(nTotal))
      .where(col("exact_cnt") * (capacity + 1) > col("n_total"))
      .select(col(keyCol), col("exact_cnt"), col("n_total"),
        Num.floorAt(col("exact_cnt").cast("double") / col("n_total"), 6)
          .as("share"))
  }
}
