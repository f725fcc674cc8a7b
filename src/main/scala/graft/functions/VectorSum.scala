package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise vector sum as a typed Aggregator — Spark's native form of
  * the reference's partial-per-node + final-merge protocol: `reduce` is the
  * per-partition fold (the oracle body's loop), `merge` is the master's
  * merge function (master/mux_runner.go:136-155, 159-192).
  *
  * Accumulates float32 inputs in float64. Vectors of differing lengths
  * fold over the longer length (missing elements are 0).
  */
class VectorSumAggregator extends Aggregator[Array[Float], Array[Double], Array[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  private def add(buf: Array[Double], v: Array[Double]): Array[Double] = {
    if (buf.isEmpty) v
    else if (v.isEmpty) buf
    else {
      val out = new Array[Double](math.max(buf.length, v.length))
      var i = 0
      while (i < out.length) {
        out(i) = (if (i < buf.length) buf(i) else 0.0) +
          (if (i < v.length) v(i) else 0.0)
        i += 1
      }
      out
    }
  }

  override def reduce(buf: Array[Double], in: Array[Float]): Array[Double] =
    add(buf, in.map(_.toDouble))

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = add(a, b)

  override def finish(buf: Array[Double]): Array[Double] = buf

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
