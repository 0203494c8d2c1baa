package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed link-graph ranking — the domain/page importance signal a
  * web-scale corpus curation pipeline runs next to its quality gates
  * (CommonCrawl-derived corpora rank hosts by link graph before sampling;
  * the reference's star-schema joins (reddit_etl_proj/etl_pipeline.py:131-138)
  * give the bipartite fact graph this operates on).
  *
  * PageRank here is FIXED-POINT INTEGER arithmetic end to end (Page et al.
  * 1999 for the recurrence; the integer formulation is ours): ranks are
  * BIGINT mass out of `scale`, every per-edge share and damping step is a
  * 64-bit integer multiply + integer division. Two reasons, both
  * scale-driven:
  *
  *   - Determinism: a double-summed rank depends on shuffle reduce order,
  *     so the same graph on a different cluster layout hashes differently.
  *     Integer sums are associative-commutative EXACTLY, so the result is
  *     bit-identical on 1 partition or 10,000 — and the DuckDB oracle can
  *     replay every iteration with `//`.
  *   - No drift: floored shares strictly under-distribute (lost ulps just
  *     vanish as mass, they never amplify), so iteration is stable.
  *
  * Overflow headroom: per-edge share is `r * w` with r <= scale; keep
  * `scale * max(w)` under 2^63 (1e12 * 1e6 edges-per-pair fits). At a
  * trillion-edge corpus drop scale to 1e9 — rank resolution trades off
  * against weight headroom in one knob.
  */
object Graph {

  /** `iters` rounds of damped weighted PageRank over `edges(src, dst, w)`.
    *
    * Shuffle shape per round: one hash join of the (checkpointed,
    * weight-summed) edge frame with the current rank frame on `src` — the
    * rank side is |nodes| rows, far smaller than edges — then one
    * partial-aggregated `groupBy(dst).sum` of the integer shares. No
    * windows, no driver-side data beyond the node COUNT (a scalar, same
    * contract as Sim's k centroids). Each round `localCheckpoint`s the new
    * rank frame so the plan stays O(1) deep across iterations (the q128
    * connected-components hygiene).
    *
    * Dangling nodes (out-degree 0) keep their base share only; callers
    * that need total-mass conservation should symmetrize edges first
    * (every node with an in-edge then has an out-edge).
    *
    * Output: (node, rank) with rank an integer out of `scale`.
    */
  def pageRankFixed(edges0: DataFrame, iters: Int = 3,
      scale: Long = 1000000000000L, dampPct: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 50, s"need 1 <= iters <= 50, got $iters")
    require(dampPct >= 0 && dampPct <= 100, s"bad dampPct $dampPct")

    // one edge row per (src, dst) with summed weight; checkpointed — it is
    // re-joined every round and must not re-evaluate its upstream scan
    val edges = edges0.groupBy("src", "dst")
      .agg(sum(col("w")).as("w"))
      .localCheckpoint()
    val outw = edges.groupBy("src").agg(sum(col("w")).as("outw"))
    val ew = edges.join(outw, "src").localCheckpoint()

    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    // the ONLY driver-side value: the node count, needed to seed r0 and
    // the per-round base share as exact integer literals
    val n = nodes.count()
    require(n > 0, "pageRankFixed: empty edge set")
    val base = (scale - scale * dampPct / 100) / n

    var ranks = nodes.select(col("node"), lit(scale / n).as("r"))
    for (_ <- 1 to iters) {
      // per-edge share floor(r*w/outw), integer `div` — NOT `/` (Spark's
      // `/` is double division; last-ulp rounding there would diverge
      // from the oracle's exact `//`)
      val inflow = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst"), expr("r * w div outw").as("share"))
        .groupBy("dst").agg(sum(col("share")).as("inflow"))
      ranks = nodes.join(inflow, nodes("node") === inflow("dst"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"$dampPct * coalesce(inflow, 0L) div 100")).as("r"))
        .localCheckpoint()
    }
    ranks
  }
}
