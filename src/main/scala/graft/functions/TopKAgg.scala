package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (candidate, score) entry in a top-k buffer. */
case class ScoredId(c_id: Long, sim: Double)

/** Typed partial top-k aggregator (Dataset `Aggregator`): every partition
  * reduces its rows to at most k entries BEFORE the shuffle, and merge
  * combines two k-buffers — so the exchange carries O(k) rows per group
  * per partition instead of every scored pair. This is the
  * map-side-combine alternative to the `row_number()` window plan (which
  * must shuffle and sort ALL scored pairs per group): same results,
  * asymptotically less shuffle — the difference at 100 TB where the
  * scored pair stream is the dominant intermediate.
  *
  * Ordering: (sim desc, c_id asc) — identical tie-break to the window
  * formulation, so the two plans are result-identical and share one
  * oracle. Buffers stay sorted; insertion is O(k) per row (fine for the
  * k≈5–100 regime; a binary heap would win only for large k).
  */
class TopKAgg(k: Int)
    extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {
  require(k >= 1, s"need k >= 1, got $k")

  private def ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.sim, s.c_id))

  def zero: List[ScoredId] = Nil

  def reduce(buf: List[ScoredId], a: ScoredId): List[ScoredId] = {
    // buf is sorted; drop early if a can't enter a full buffer
    if (buf.lengthCompare(k) >= 0 && ord.gteq(a, buf.last)) buf
    else (a :: buf).sorted(ord).take(k)
  }

  def merge(b1: List[ScoredId], b2: List[ScoredId]): List[ScoredId] =
    (b1 ++ b2).sorted(ord).take(k)

  def finish(buf: List[ScoredId]): Seq[ScoredId] = buf.sorted(ord)

  def bufferEncoder: Encoder[List[ScoredId]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}
