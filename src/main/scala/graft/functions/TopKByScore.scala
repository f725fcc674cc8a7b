package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** One (id, score) candidate for [[TopKByScore]]. */
final case class ScoredId(id: Long, score: Double)

/** Bounded exact top-k aggregation: keeps the k best (score desc, id asc)
  * candidates per group.
  *
  * This replaces the row_number-window idiom for per-query top-k: a window
  * must shuffle EVERY candidate row to its query's partition before it can
  * rank (probes x corpus rows for brute-force search), while this
  * aggregator partial-aggregates — each map task collapses its candidates
  * to at most ~2k per query before the exchange, so the shuffle carries
  * partitions x queries x O(k) small structs no matter how large the
  * corpus is. Same result, exactly: the comparator (score desc, id asc)
  * is total, so merge order cannot change the output.
  *
  * Buffer discipline (the fully-sorted O(k)-insert predecessor measured
  * as THE cost of large-shortlist searches — v20's k=4000 shortlist over
  * 4M candidate rows is 16e9 shift operations at O(k) per insert):
  * amortized appends with periodic compaction. After any compaction the
  * buffer is exactly the sorted top-k so far; appends then grow it to at
  * most 2k-1 with that sorted k-prefix intact, which makes `buf(k-1)` a
  * CONSERVATIVE threshold — it was the k-th best at the last compaction,
  * the true current k-th best can only be better — so most candidates
  * reject in O(1) and the rest pay O(1) appends plus an O(k log k) sort
  * every k appends: O(log k) amortized, independent of arrival order.
  */
final class TopKByScore(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0)

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Sorted top-k of whatever accumulated — re-establishes the
    * sorted-prefix invariant.
    */
  private def compact(buf: Seq[ScoredId]): Seq[ScoredId] =
    buf.sortWith(better).take(k)

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] = {
    // The sorted k-prefix exists whenever size >= k (first compaction
    // fires the moment the buffer reaches k), so this reject is sound.
    if (buf.size >= k && better(buf(k - 1), x)) buf
    else {
      val a = buf :+ x
      if (a.size == k || a.size >= 2 * k) compact(a) else a
    }
  }

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    compact(a ++ b)

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = compact(r)
  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}
