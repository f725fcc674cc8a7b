package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** One (id, score) candidate for [[TopKByScore]]. */
final case class ScoredId(id: Long, score: Double)

/** Bounded exact top-k aggregation: keeps the k best (score desc, id asc)
  * candidates per group, buffer held SORTED so insert/merge are O(k).
  *
  * This replaces the row_number-window idiom for per-query top-k: a window
  * must shuffle EVERY candidate row to its query's partition before it can
  * rank (probes x corpus rows for brute-force search), while this
  * aggregator partial-aggregates — each map task collapses its candidates
  * to at most k per query before the exchange, so the shuffle carries
  * partitions x queries x k small structs no matter how large the corpus
  * is. Same result, exactly: the comparator (score desc, id asc) is total,
  * so merge order cannot change the output.
  */
final class TopKByScore(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0)

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def insert(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] = {
    if (buf.size >= k && better(buf.last, x)) buf
    else {
      val i = buf.indexWhere(e => better(x, e))
      val withX =
        if (i < 0) buf :+ x
        else (buf.take(i) :+ x) ++ buf.drop(i)
      if (withX.size > k) withX.take(k) else withX
    }
  }

  override def zero: Seq[ScoredId] = Vector.empty
  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
    insert(buf, x)
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    b.foldLeft(a)(insert)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}
