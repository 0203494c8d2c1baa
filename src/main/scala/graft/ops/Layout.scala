package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * At 100 TB the cheapest row is the one never read: parquet keeps
  * min/max statistics per file and row group, and a scan with a range
  * predicate skips any unit whose bounds miss the range. A single-column
  * sort gives perfect bounds on ONE dimension and random bounds on every
  * other; interleaving the bits of two dimensions (Morton / Z-order —
  * public technique, used by every lakehouse table format) gives each
  * file a small bounding BOX, so predicates on EITHER dimension skip.
  *
  * Everything here is plain integer bit arithmetic on codegen'd
  * expressions — deterministic and replayed exactly by the DuckDB oracle
  * (q132).
  */
object Layout {

  /** Morton/Z-value of two non-negative integer dimensions, interleaving
    * the low `bits` bits of each (a's bit i lands at position 2i, b's at
    * 2i+1). Inputs must already be normalized to [0, 2^bits) —
    * [[normalize]] builds that from any monotonic int dimension;
    * clamping would silently fold distant values into one cell, so out
    * of range inputs are a contract violation ENFORCED per row via
    * `assert_true` (a silent high-bit drop would degrade the layout with
    * no signal, and the oracle — which masks identically — could never
    * catch it). The guard folds to `+ 0` on valid data, so oracle replay
    * of the bare interleave stays bit-identical.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31, got $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    val lim = lit(1L << bits)
    val guard = assert_true(
      al >= 0 && al < lim && bl >= 0 && bl < lim,
      concat(lit(s"zValue: dimensions must be in [0, 2^$bits): a="),
        al.cast("string"), lit(" b="), bl.cast("string")))
    (0 until bits).map { i =>
      // bit i of a, shifted to 2i; bit i of b, shifted to 2i+1
      shiftleft(al.bitwiseAND(lit(1L << i)), i)
        .bitwiseOR(shiftleft(bl.bitwiseAND(lit(1L << i)), i + 1))
    }.reduce(_.bitwiseOR(_)) + coalesce(guard.cast("long"), lit(0L))
  }

  /** Shift-to-zero normalization: `c - lo`, for dimensions whose span
    * already fits 2^bits (epoch days, surrogate keys). Monotonic, so
    * range predicates on the raw column translate to ranges on the
    * normalized one — the property pruning needs.
    */
  def normalize(c: Column, lo: Long): Column = c.cast("long") - lit(lo)

  /** Cluster `df` into `files` output files by z-value of the two
    * dimensions: range-partition on the z-value, sort within each
    * partition. Each output file then covers a compact bounding box in
    * (a, b) space — the write-side half of scan pruning (the read side
    * is parquet's own min/max skipping, no reader changes needed).
    */
  def zOrderWrite(df: DataFrame, zCol: Column, files: Int,
                  path: String): Unit =
    df.withColumn("__z", zCol)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
