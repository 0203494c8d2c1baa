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

  /** Small-files compaction for a directory-partitioned dataset — the
    * lakehouse OPTIMIZE primitive. Streaming ingestion (one file per
    * micro-batch per partition) and over-parallel writers leave
    * partitions holding hundreds of KB-sized files; at 100 TB the file
    * LISTING and per-file open/footer costs then dominate scans long
    * before row data does. The rewrite hash-clusters rows by the
    * partition columns so each partition's rows land on one task (one
    * output file per partition directory), split only by
    * `maxRecordsPerFile` — after which file count per partition is
    * ceil(rows / maxRecordsPerFile), independent of how fragmented the
    * input was. Content is preserved bit-for-bit (the oracle gate
    * aggregates the compacted dataset against the source table);
    * LayoutSpec asserts the file-count contract.
    *
    * Scale note: compaction is itself a full shuffle of the rewritten
    * partitions — production runs scope it to recently-ingested
    * partitions (`WHERE` on the partition predicate before the
    * repartition), not the whole table.
    */
  def compactPartitioned(spark: org.apache.spark.sql.SparkSession,
                         src: String, dst: String,
                         partitionCols: Seq[String],
                         maxRecordsPerFile: Long): Unit =
    spark.read.parquet(src)
      .repartition(partitionCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(dst)

  /** Zone-map effectiveness audit: quantifies, per candidate LAYOUT, how
    * many file-sized units a range predicate could skip — the number a
    * table-layout decision at 100 TB should be made from, measured
    * instead of guessed. Three layouts of `lineitem` are simulated by
    * assigning each row a bucket (= "file") with exact integer
    * arithmetic:
    *
    *  - `natural`:  64 equal ranges of `l_orderkey` (insertion order —
    *    what an unclustered ingest produces);
    *  - `bydate`:   64 equal ranges of the ship-date epoch day (a
    *    single-column sort key);
    *  - `zorder`:   both dims quantized to 8 bits, Morton-interleaved
    *    ([[zValue]]), top 6 bits = bucket — an 8x8 bounding-box grid
    *    over (partkey, day) space.
    *
    * For each (layout, bucket) the zone map is min/max of BOTH predicate
    * columns plus the row count; each audit predicate (a 30-day ship-date
    * window and a 1/64-span partkey range, both placed mid-domain so the
    * audit is SF-agnostic) then counts the buckets whose bounds intersect
    * it and the rows those buckets force a reader to scan. `natural`
    * reads ~everything under either predicate, `bydate` is perfect on
    * date and ~random on partkey, `zorder` skips ~7/8 on BOTH — the
    * measured form of the trade every lakehouse clustering decision
    * makes. One scan builds all three zone maps (the per-row bucket
    * triple explodes to (layout, bucket) pairs before one partial-agged
    * groupBy); bounds come from a broadcast 1-row aggregate, never a
    * driver collect.
    *
    * Reference contrast: the reference re-reads its whole table for every
    * filter (reddit_etl_proj/etl_pipeline.py:144-150) — at 100 TB the
    * layout, not the filter, decides the bill.
    */
  def zoneMapAudit(lineitem: DataFrame): DataFrame = {
    val base = lineitem.select(
      col("l_orderkey").cast("long").as("okey"),
      col("l_partkey").cast("long").as("pk"),
      floor(unix_timestamp(col("l_shipdate")) / 86400L)
        .cast("long").as("day"))
    val bounds = base.agg(
      min("okey").as("mino"), max("okey").as("maxo"),
      min("pk").as("minpk"), max("pk").as("maxpk"),
      min("day").as("mind"), max("day").as("maxd"))
    // exact integral division (SQL `div`), mirroring DuckDB's `//` —
    // Column./ is IEEE double division and could misround the floor
    val withB = base.crossJoin(broadcast(bounds))
      .withColumn("nat_b",
        expr("((okey - mino) * 64) div (maxo - mino + 1)"))
      .withColumn("date_b",
        expr("((day - mind) * 64) div (maxd - mind + 1)"))
      .withColumn("pkq",
        expr("((pk - minpk) * 256) div (maxpk - minpk + 1)"))
      .withColumn("dayq",
        expr("((day - mind) * 256) div (maxd - mind + 1)"))
      .withColumn("zv", zValue(col("pkq"), col("dayq"), bits = 8))
      .withColumn("z_b", expr("zv div 1024"))
    val zones = withB.select(col("pk"), col("day"),
        explode(array(
          struct(lit("natural").as("layout"), col("nat_b").as("bucket")),
          struct(lit("bydate").as("layout"), col("date_b").as("bucket")),
          struct(lit("zorder").as("layout"), col("z_b").as("bucket"))))
          .as("lb"))
      .select(col("lb.layout").as("layout"), col("lb.bucket").as("bucket"),
        col("pk"), col("day"))
      .groupBy("layout", "bucket")
      .agg(min("pk").as("min_pk"), max("pk").as("max_pk"),
        min("day").as("min_day"), max("day").as("max_day"),
        count(lit(1)).as("cnt"))
    // the two audit predicates, derived from the same bounds row
    val preds = bounds.select(explode(array(
        struct(lit("ship_month").as("predicate"), lit("day").as("dim"),
          expr("mind + (maxd - mind) div 2").as("lo"),
          expr("mind + (maxd - mind) div 2 + 30").as("hi")),
        struct(lit("part_range").as("predicate"), lit("pk").as("dim"),
          expr("minpk + (maxpk - minpk) div 2").as("lo"),
          expr("minpk + (maxpk - minpk) div 2 + (maxpk - minpk) div 64")
            .as("hi")))).as("p"))
      .select(col("p.predicate").as("predicate"), col("p.dim").as("dim"),
        col("p.lo").as("lo"), col("p.hi").as("hi"))
    // exact selectivity of each predicate (layout-independent baseline)
    val matches = base.crossJoin(broadcast(preds))
      .where(when(col("dim") === "day",
        col("day") >= col("lo") && col("day") <= col("hi"))
        .otherwise(col("pk") >= col("lo") && col("pk") <= col("hi")))
      .groupBy("predicate").agg(count(lit(1)).as("n_match"))
    val audited = zones.crossJoin(broadcast(preds))
      .withColumn("read", when(col("dim") === "day",
        col("min_day") <= col("hi") && col("max_day") >= col("lo"))
        .otherwise(col("min_pk") <= col("hi") && col("max_pk") >= col("lo"))
        .cast("int"))
      .groupBy("layout", "predicate")
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("read")).as("n_read"),
        sum(col("cnt")).as("rows_total"),
        sum(col("cnt") * col("read")).as("rows_scanned"))
    audited.join(broadcast(matches), Seq("predicate"), "left")
      .select(col("layout"), col("predicate"), col("n_buckets"),
        col("n_read"), col("rows_total"), col("rows_scanned"),
        coalesce(col("n_match"), lit(0L)).as("n_match"),
        Num.floorAt(col("n_read").cast("double") / col("n_buckets"), 6)
          .as("read_frac"),
        Num.floorAt(col("rows_scanned").cast("double") / col("rows_total"), 6)
          .as("scan_frac"))
  }

  /** The [[zValue]] bit interleave as a SQL expression string over two
    * already-quantized integer columns — shared by [[zoneMapAudit]]'s
    * engine plan and its DuckDB oracle so the arithmetic is replayed
    * bit-for-bit (same shape as q132's oracle).
    */
  def zSqlExpr(a: String, b: String, bits: Int): String =
    (0 until bits).map(i =>
      s"((($a) & ${1L << i}) << $i) | ((($b) & ${1L << i}) << ${i + 1})")
      .mkString("(", " | ", ")")
}
