package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Star-schema build / join operators (SURVEY.md §2.3 ops 13-15 and §2.1
  * op 4's INSERT IGNORE semantics; reference reddit_etl_proj/
  * etl_pipeline.py:94-129,144-150).
  *
  * Scale notes:
  *  - Dimensions are by definition low-cardinality, so the global
  *    `row_number` window over the distinct keys is a deliberate
  *    single-partition step over a tiny input — the distinct itself is a
  *    proper distributed partial/final hash aggregate.
  *  - Fact-to-dim key lookups broadcast the dim (reference does the same
  *    thing with a driver-side Python dict — etl_pipeline.py:95-116).
  */
object Star {

  /** Deterministic surrogate-key dimension from the distinct values of a
    * natural key (reference: MySQL auto-increment + INSERT IGNORE,
    * etl_pipeline.py:96-109). Ranked distinct gives stable ids, unlike
    * `monotonically_increasing_id` which depends on partitioning.
    */
  def dim(df: DataFrame, naturalKey: String, idCol: String): DataFrame =
    df.select(col(naturalKey)).where(col(naturalKey).isNotNull).distinct()
      .withColumn(idCol,
        row_number().over(Window.orderBy(col(naturalKey))).cast("long"))

  /** Incremental dim maintenance with upsert-ignore semantics: only keys
    * absent from `existing` get new ids, appended after the current max
    * (reference INSERT IGNORE, etl_pipeline.py:97,106,122). The anti join
    * broadcasts `existing` when small; new ids are again ranked distinct.
    */
  def dimUpsert(existing: DataFrame, incoming: DataFrame,
                naturalKey: String, idCol: String): DataFrame = {
    val newKeys = incoming.select(col(naturalKey))
      .where(col(naturalKey).isNotNull).distinct()
      .join(existing.select(naturalKey), Seq(naturalKey), "left_anti")
    val base = existing.agg(coalesce(max(col(idCol)), lit(0L)).as("base"))
    val assigned = newKeys
      .withColumn("rk", row_number().over(Window.orderBy(col(naturalKey))))
      .crossJoin(broadcast(base))
      .select(col(naturalKey), (col("base") + col("rk")).cast("long").as(idCol))
    existing.select(col(naturalKey), col(idCol)).unionByName(assigned)
  }

  /** Map-side dim-key lookup (op 14): attach the surrogate id by joining
    * the fact on the natural key; the dim side is broadcast.
    */
  def lookup(factSide: DataFrame, dimSide: DataFrame,
             naturalKey: String): DataFrame =
    factSide.join(broadcast(dimSide), Seq(naturalKey), "left")

  /** Fact ⋈ dims star join (op 13): inner equi-joins with explicit
    * broadcast hints on the dim sides.
    */
  def starJoin(fact: DataFrame, dims: Seq[(DataFrame, String)]): DataFrame =
    dims.foldLeft(fact) { case (acc, (d, key)) =>
      acc.join(broadcast(d), Seq(key))
    }

  /** INSERT IGNORE as a distributed operator: rows of `incoming` whose key
    * is not already present in `existing` (left anti join). This is the
    * honest Spark equivalent of the reference's upsert-ignore fact load
    * (etl_pipeline.py:121-127).
    */
  def upsertIgnore(existing: DataFrame, incoming: DataFrame,
                   keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*).distinct(),
      keys, "left_anti")

  /** Referential-integrity audit: count of `fact` rows whose `factKey` has
    * no match in `dim.dimKey` — a left anti join against the (broadcast)
    * distinct dim keys, reduced to one number. The pre-load FK check a
    * warehouse runs before accepting a batch; at 100 TB the anti join's
    * build side is only the distinct dim keys, so it stays a broadcast
    * hash join with zero fact-side shuffle.
    */
  def orphanCount(fact: DataFrame, factKey: String,
                  dim: DataFrame, dimKey: String, as: String): DataFrame =
    fact.join(
        broadcast(dim.select(col(dimKey).as(factKey)).distinct()),
        Seq(factKey), "left_anti")
      .agg(count(lit(1)).as(as))

  /** Full MERGE (SCD1 upsert-update) as a distributed operator — the
    * third member of the load family next to [[upsertIgnore]] (insert
    * only) and [[dimUpsert]] (surrogate-keyed insert): WHEN MATCHED the
    * incoming row's non-key columns replace the existing row's, WHEN NOT
    * MATCHED the incoming row inserts, and unmatched existing rows
    * survive unchanged — the semantics of a lakehouse `MERGE INTO …
    * WHEN MATCHED THEN UPDATE * WHEN NOT MATCHED THEN INSERT *`, as one
    * full-outer join + per-column COALESCE favoring the incoming side.
    * `incoming` must be key-unique (a MERGE with duplicate source keys
    * is ambiguous — Delta/Iceberg raise; enforce upstream with
    * dropDuplicates).
    *
    * Scale shape: one key-keyed shuffle of each side (no broadcast —
    * target and source are the same order of magnitude in a fact
    * merge); row width is untouched, no fingerprints needed because the
    * update is unconditional on match.
    */
  def merge(existing: DataFrame, incoming: DataFrame,
            keys: Seq[String]): DataFrame = {
    val dataCols = existing.columns.filterNot(keys.contains).toSeq
    require(incoming.columns.toSet == existing.columns.toSet,
      s"schema mismatch: ${incoming.columns.toSeq} vs " +
        s"${existing.columns.toSeq}")
    // explicit presence flag: a data column can be legitimately NULL,
    // so "did incoming match" must not be read off a data column — a
    // plain COALESCE would resurrect existing values under incoming
    // NULLs, which is not UPDATE * semantics
    val in = incoming.select(
      (keys.map(col) :+ lit(true).as("__in")) ++
        dataCols.map(c => col(c).as(s"__in_$c")): _*)
    existing.join(in, keys, "full_outer")
      .select((keys.map(col) ++ dataCols.map(c =>
        when(col("__in"), col(s"__in_$c")).otherwise(col(c)).as(c))): _*)
  }

  /** CDC snapshot diff: classify every key across two table snapshots as
    * added / deleted / changed / unchanged by full-outer-joining on the
    * key and comparing md5 row fingerprints over `fpCols`. The
    * incremental-load primitive: at 100 TB both sides shuffle once on the
    * key (no broadcast — snapshots are the same order of magnitude) and
    * the fingerprint reduces arbitrary row width to 32 bytes before the
    * join. Callers fingerprint NUMERIC columns via exact representations
    * (e.g. DECIMAL) — a raw double→string render is engine-specific.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
                   fpCols: Seq[Column]): DataFrame = {
    def fp(df: DataFrame, as: String) = df.select(col(key),
      md5(concat_ws("|", fpCols: _*)).as(as))
    fp(oldSnap, "fp_old").join(fp(newSnap, "fp_new"), Seq(key),
        "full_outer")
      .withColumn("status",
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "deleted")
          .when(col("fp_old") =!= col("fp_new"), "changed")
          .otherwise("unchanged"))
  }
}
