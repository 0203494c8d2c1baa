package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation (SURVEY.md §7 / SCALE.md): two-phase salted
  * aggregates for hot keys.
  *
  * AQE's skew-join splitting covers joins, but a groupBy whose hottest key
  * holds a double-digit share of all rows still funnels that key's rows
  * into one reducer. Salting splits each key into `salts` sub-keys for the
  * partial phase, then re-reduces — both phases are ordinary partial+final
  * hash aggregates, so the technique composes with codegen and AQE.
  *
  * Only algebraic aggregates (count / sum / min / max) can be re-reduced;
  * avg is derived from (sum, count).
  */
object Skew {

  /** Key-distribution profile — the DECISION INPUT for every mitigation
    * in this file: before salting a join or agg key (q129/q36) or
    * trusting AQE to split it, measure the skew. One row per profiled
    * key: row/key counts, the hottest key's count and identity, the
    * skew factor (max/mean — AQE's skewedPartitionFactor analog at the
    * KEY grain, ahead of any shuffle), and the top-1 share.
    *
    * Shape at scale: `groupBy(key).count()` partial-aggregates the hot
    * key map-side (this profiler must never itself be the straggler —
    * the reason it is not a count window), then ONE scalar aggregation
    * over the |keys| counts frame with max_by for the hot key's
    * identity. Advisory threshold: salt when skew_factor >= `saltAt`
    * (AQE's default skew factor is 5 — same order).
    *
    * Output: (key_col, n_rows, n_keys, max_cnt, hot_key, mean_cnt,
    * skew_factor, needs_salt).
    */
  def keyProfile(df: DataFrame, keyCol: String,
                 saltAt: Double = 5.0): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("cnt"))
    val mean = col("n_rows").cast("double") / col("n_keys")
    counts.agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"),
        max_by(col("k"), struct(col("cnt"), col("k"))).as("hot_key"))
      .select(lit(keyCol).as("key_col"), col("n_rows"), col("n_keys"),
        col("max_cnt"), col("hot_key"),
        Num.floorAt(mean, 4).as("mean_cnt"),
        Num.floorAt(col("max_cnt").cast("double") / mean, 4)
          .as("skew_factor"))
      .withColumn("needs_salt", col("skew_factor") >= saltAt)
  }

  /** Deterministic row salt in [0, salts): hash of the whole row, so
    * re-runs salt identically (no rand(), which would break retries and
    * the oracle).
    *
    * Caveat: rows that are FULLY identical (hot key AND identical payload)
    * hash to one salt, so this breaks value-skew but not duplicate-row
    * skew. For the latter, pass a distinct `saltSource` to the overload —
    * e.g. a pre-assigned row id, or `monotonically_increasing_id()` if
    * retry-determinism may be sacrificed.
    */
  def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.map(col): _*), lit(salts))

  def rowSalt(saltSource: Column, salts: Int): Column =
    pmod(hash(saltSource), lit(salts))

  /** groupBy(keys).count() with a salted partial phase. */
  def saltedCount(df: DataFrame, keys: Seq[String],
                  salts: Int = 16): DataFrame =
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("n"))

  /** Salted 2dp-money sum: the partial sums are DECIMAL(18,2) (exact, so
    * re-reducing over an arbitrary salt split is order-insensitive and
    * bit-identical to an unsalted sum — a double partial sum would drift
    * with the salt count), surfaced as DOUBLE.
    */
  def saltedMoneySum(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame =
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("__sum"),
        count(lit(1)).as("__cnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__sum")).cast("double").as("total"),
        sum(col("__cnt")).as("n"))

  /** Salt-replicated equi-join for skewed keys where NEITHER side fits a
    * broadcast: the big side gets a deterministic row salt in [0, salts),
    * the small(er) side is replicated once per salt value, and the join
    * runs on (key, salt) — a hot key's rows now spread over `salts`
    * reducers instead of funneling into one. This is the manual form of
    * AQE's skew-join split; use it when skew is KNOWN up front (AQE only
    * reacts after a stage straggles) or under a fixed non-AQE plan.
    * `salts` multiplies the replicated side's shuffle volume — size it to
    * the skew factor, not higher. The salt is engine-internal (it never
    * reaches the output), so row-hash determinism is only needed for
    * retry stability, not cross-engine replay.
    *
    * The shuffle_hash hint pins the physical join so the demo cannot
    * silently degrade to a broadcast (which would bypass the salt
    * entirely at test SF).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, salts: Int = 8): DataFrame = {
    require(salts >= 1, s"need salts >= 1, got $salts")
    val b = big.withColumn("__salt", rowSalt(big, salts))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s.hint("shuffle_hash"),
        b(bigKey) === s(smallKey) && b("__salt") === s("__salt"))
      .drop("__salt")
  }

  /** groupBy(keys).agg(sum, count, min, max) with a salted partial phase;
    * `avg` derived from the re-reduced sum/count.
    */
  def saltedStats(df: DataFrame, keys: Seq[String], valueCol: String,
                  salts: Int = 16): DataFrame =
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__sum"), count(col(valueCol)).as("__cnt"),
        min(col(valueCol)).as("__min"), max(col(valueCol)).as("__max"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__sum")).as("sum"), sum(col("__cnt")).as("n"),
        (sum(col("__sum")) / sum(col("__cnt"))).as("avg"),
        min(col("__min")).as("min"), max(col("__max")).as("max"))

  /** Join-size preflight: the EXACT output cardinality and hottest keys
    * of `left ⋈ right ON key`, computed from per-side key histograms
    * WITHOUT running the join — Σ (cnt_left × cnt_right) over matching
    * keys. This is [[keyProfile]]'s two-sided sibling and the number an
    * optimizer's estimator approximates from sketches; computing it
    * exactly costs two partial-aggregated key counts plus a
    * |keys|-sized join, so at 100 TB the preflight is ~free relative to
    * the join it sizes, and its top rows name exactly the keys that
    * need salting/AQE-splitting when `share` concentrates.
    *
    * Output: top `topK` keys by pair contribution — (key, n_left,
    * n_right, n_pairs, total_pairs, n_keys, share). The pair
    * products/sums are computed in DECIMAL(38,0) internally (a BIGINT
    * product silently wraps at billion-row per-side counts) but
    * SURFACED as STRING: arbitrary precision survives the cast
    * losslessly, and a string column hashes identically across
    * engines — wide decimals do not (parquet Decimal object vs DuckDB
    * HUGEINT→float64 canonicalization).
    */
  def joinSizePreflight(left: DataFrame, right: DataFrame, key: String,
                        topK: Int = 10): DataFrame = {
    val l = left.groupBy(col(key)).agg(count(lit(1)).as("n_left"))
    val r = right.groupBy(col(key)).agg(count(lit(1)).as("n_right"))
    // pair products/sums in DECIMAL(38,0): at the 100 TB cardinalities
    // this op exists for (per-side counts in the billions), a BIGINT
    // product silently wraps — the one estimate that must not lie is
    // the overflow-sized one (mirrors DuckDB's HUGEINT promotion)
    val j = l.join(r, Seq(key))
      .select(col(key), col("n_left"), col("n_right"),
        (col("n_left").cast("decimal(19,0)") *
          col("n_right").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("n_pairs"))
    val tot = j.agg(sum(col("n_pairs")).cast("decimal(38,0)")
        .as("total_pairs"),
      count(lit(1)).as("n_keys"))
    j.crossJoin(broadcast(tot))
      .orderBy(desc("n_pairs"), col(key))
      .limit(topK)
      .select(col(key), col("n_left"), col("n_right"),
        col("n_pairs").cast("string").as("n_pairs"),
        col("total_pairs").cast("string").as("total_pairs"),
        col("n_keys"),
        Num.floorAt(
          col("n_pairs").cast("double") / col("total_pairs"), 6)
          .as("share"))
  }
}
