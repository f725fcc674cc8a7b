package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass sufficient statistics for covariance/PCA over a vector column:
  * count, per-dimension sums, and the upper triangle of the second-moment
  * matrix, accumulated in float64.
  *
  * Buffer layout (flat `Array[Double]`): `[n, d, sum_0..sum_{d-1},
  * m_00, m_01..m_0{d-1}, m_11..]` — d(d+1)/2 triangle entries in row-major
  * upper order. Empty until the first row fixes `d`; vectors of a
  * different length fold over the common prefix (consistent with the
  * vector expressions' min-length rule).
  *
  * This is the scale form of a covariance computation: each map task
  * reduces its rows into one (2 + d + d(d+1)/2)-double buffer (64 dims =
  * 2,146 doubles), so the exchange carries partitions x one buffer — the
  * corpus never shuffles, exactly like the reference's per-node partial +
  * master merge protocol.
  */
class GramAggregator
    extends Aggregator[Array[Float], Array[Double], Array[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  private def alloc(d: Int): Array[Double] = {
    val buf = new Array[Double](2 + d + d * (d + 1) / 2)
    buf(1) = d.toDouble
    buf
  }

  override def reduce(buf0: Array[Double], in: Array[Float]): Array[Double] = {
    if (in == null) return buf0
    val buf = if (buf0.isEmpty) alloc(in.length) else buf0
    val d = buf(1).toInt
    val m = math.min(d, in.length)
    buf(0) += 1.0
    var i = 0
    while (i < m) {
      val xi = in(i).toDouble
      buf(2 + i) += xi
      // Rows 0..i-1 hold d, d-1, ... entries: i*d - i*(i-1)/2 in total,
      // so triangle row i starts there; entry (i, j>=i) is at +(j - i).
      val rowStart = 2 + d + i * d - (i * (i - 1)) / 2
      var j = i
      while (j < m) {
        buf(rowStart + (j - i)) += xi * in(j).toDouble
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = if (a.length >= b.length) a else b
    val small = if (a.length >= b.length) b else a
    val dOut = out(1).toInt
    val dS = small(1).toInt
    if (dS == dOut) {
      var i = 0
      while (i < small.length) {
        if (i != 1) out(i) += small(i) // slot 1 is d, not additive
        i += 1
      }
    } else {
      // Partitions fixed different d from their first rows: the buffers'
      // sum/triangle offsets disagree, so a flat add would mix entries at
      // mismatched (i, j). Re-map the smaller-d buffer entry-by-entry —
      // this keeps merge consistent with reduce's common-prefix rule
      // regardless of which partition saw which row first.
      out(0) += small(0)
      var i = 0
      while (i < dS) {
        out(2 + i) += small(2 + i)
        val rowS = 2 + dS + i * dS - (i * (i - 1)) / 2
        val rowO = 2 + dOut + i * dOut - (i * (i - 1)) / 2
        var j = i
        while (j < dS) {
          out(rowO + (j - i)) += small(rowS + (j - i))
          j += 1
        }
        i += 1
      }
    }
    out
  }

  override def finish(buf: Array[Double]): Array[Double] = buf

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
