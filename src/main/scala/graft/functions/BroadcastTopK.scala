package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused brute-force cosine top-k against an in-expression probe matrix:
  * for each input row's vector, scan every probe and keep the k best by
  * (sim desc, id asc) — the whole kNN relation in ONE MAP-ONLY PASS, no
  * join, no aggregation, no shuffle.
  *
  * This is the "corpus x broadcast probes" inversion of
  * [[graft.ops.Similarity.bruteForceTopK]]: instead of materializing
  * |corpus| x |probes| candidate ROWS through a cross join and collapsing
  * them back with a top-k aggregation (row-at-a-time overhead dominates —
  * the v28 4M-pair sweep spent ~2.5 s in join/aggregate machinery for
  * ~0.26 GFLOP of arithmetic), the probe matrix rides inside the
  * expression and the inner loop is a tight JVM nest over primitive
  * arrays. Scale shape: corpus partitioned (map-only, any size), probes
  * bounded (driver-collected, same constraint as bruteForceTopK's
  * broadcast side — the caller caps it).
  *
  * Exactness contract (the v02/v28 engine-parity rules, all mirrored from
  * the composed plan so hashes cannot drift):
  *  - cosine = one float64 pass in index order with the zero-magnitude
  *    guard ([[CosineSimilarity]]; reference node/wrapper/record.go:
  *    97-103); probe norms are precomputed per probe — bit-identical, as
  *    each accumulator only sees its own vector's elements in order.
  *  - sims round HALF_UP at `roundTo` BEFORE ranking (Spark `round`
  *    semantics via BigDecimal), ids break ties ascending.
  *  - probes with the row's own id are skipped (self-match exclusion).
  *  - NaN sims are dropped (rankTopK's guard); the zero-magnitude guard
  *    makes them impossible unless the data itself carries NaN.
  *
  * CodegenFallback is deliberate: the per-ROW eval cost is one virtual
  * call around a |probes| x dims primitive loop, so interpreted dispatch
  * is amortized to nothing — codegen would only inline what the JIT
  * already compiles.
  */
case class CosineTopKAgainst(
    vec: Expression,
    id: Expression,
    probeIds: Array[Long],
    probeVecs: Array[Array[Float]],
    k: Int,
    roundTo: Int) extends Expression with CodegenFallback {

  require(k > 0 && probeIds.length == probeVecs.length)

  override def children: Seq[Expression] = Seq(vec, id)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  /** Probe norms sqrt(sum x^2) accumulated in index order — bit-identical
    * to the fused one-pass cosine's `nb` term.
    */
  @transient private lazy val probeNorms: Array[Double] =
    probeVecs.map { p =>
      var s = 0.0; var i = 0
      while (i < p.length) { val x = p(i).toDouble; s += x * x; i += 1 }
      math.sqrt(s)
    }

  override def eval(input: InternalRow): Any = {
    val vRaw = vec.eval(input)
    val idRaw = id.eval(input)
    if (vRaw == null || idRaw == null) return null
    val a = vRaw.asInstanceOf[ArrayData].toFloatArray()
    val myId = idRaw.asInstanceOf[Long]
    var na = 0.0
    var i = 0
    while (i < a.length) { val x = a(i).toDouble; na += x * x; i += 1 }
    val normA = math.sqrt(na)
    // Sorted top-k buffer (score desc, id asc), linear insert — k is small.
    val topIds = new Array[Long](k)
    val topSims = new Array[Double](k)
    var size = 0
    var p = 0
    while (p < probeIds.length) {
      val pid = probeIds(p)
      if (pid != myId) {
        val b = probeVecs(p)
        val n = math.min(a.length, b.length)
        var dot = 0.0
        var j = 0
        while (j < n) { dot += a(j).toDouble * b(j).toDouble; j += 1 }
        val den = normA * probeNorms(p)
        val raw = if (den == 0.0) 0.0 else dot / den
        if (!raw.isNaN) {
          val sim = BigDecimal(raw)
            .setScale(roundTo, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (size < k || sim > topSims(size - 1) ||
              (sim == topSims(size - 1) && pid < topIds(size - 1))) {
            var pos = size
            while (pos > 0 && (sim > topSims(pos - 1) ||
                (sim == topSims(pos - 1) && pid < topIds(pos - 1)))) pos -= 1
            val last = math.min(size, k - 1)
            var m = last
            while (m > pos) {
              topIds(m) = topIds(m - 1); topSims(m) = topSims(m - 1); m -= 1
            }
            topIds(pos) = pid
            topSims(pos) = sim
            if (size < k) size += 1
          }
        }
      }
      p += 1
    }
    val rows = new Array[Any](size)
    var r = 0
    while (r < size) {
      rows(r) = InternalRow(topIds(r), topSims(r)); r += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), id = newChildren(1))
}
