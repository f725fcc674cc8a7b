package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All sign-LSH band signatures of a vector in ONE fused pass.
  *
  * Input: a `array<float>`/`array<double>` vector. `planes(b)(p)` is the
  * p-th hyperplane of band b (driver-built, deterministic); output long b
  * has bit p set iff `vec . planes(b)(p) > 0`. This is the signature step
  * of [[graft.ops.Similarity.signBucketJoin]]/`signBucketJoinWide`.
  *
  * This expression exists for the same reason as [[MinhashSignature]]: the
  * compositional form — bands x planes separate `DotProduct(vec,
  * CreateArray(64 literals))` trees summed through `when()` — grows past
  * what whole-stage codegen will compile, and the planner silently falls
  * back to the interpreted projection, where per-element accessor dispatch
  * costs ~2 us instead of ~1 ns. Measured on the 10^6 x 64-dim SimBench
  * corpus (4 bands x 22 planes): ~13 ms/row interpreted — a 16-minute
  * map stage for what is 5.6k multiply-adds. Here the plane tensor rides
  * into the task as ONE reference object (not thousands of literal
  * expressions), and both eval paths call the same JIT-friendly primitive
  * loop: ~6 us/row, keeping the signature scan map-side and linear at any
  * corpus size.
  *
  * A null/empty vector yields all-zero signatures (every dot is 0, sign
  * bit clear) — total, like the rest of the vector family; null elements
  * contribute 0 like [[DotProduct]].
  */
case class SignBandSignatures(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sign_signatures"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!VectorExpressions.isVecType(child.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got " +
          child.dataType.catalogString)
    } else if (planes.isEmpty || planes.exists(b => b.isEmpty || b.length > 63)) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs 1..63 hyperplanes per band")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(input: Any): Any =
    SignBandSignatures.compute(input.asInstanceOf[ArrayData], isFloat, planes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The tensor is a broadcast-once reference object; the generated code
    // is a single call, so the surrounding projection stays well under
    // codegen's method-size limits no matter how many bands/planes.
    val ref = ctx.addReferenceObj("signPlanes", planes, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.SignBandSignatures.compute($a, $isFloat, $ref);"
    })
  }

  // Plan equality: Array equals is reference-based, which would make two
  // semantically identical builds compare unequal (harmless) — but the
  // same-instance case (self-joins over one probes relation) is what
  // exchange reuse needs, and that works unchanged.

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBandSignatures {

  /** Shared hot loop for both eval paths. Reads the vector ONCE into a
    * primitive buffer (per-element null checks hoisted out of the plane
    * sweep), then streams the tensor: bands x planes x dims multiply-adds
    * with no allocation beyond the two small output/input arrays.
    */
  def compute(vec: ArrayData, isFloat: Boolean,
      planes: Array[Array[Array[Double]]]): ArrayData = {
    val n = vec.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        x(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      }
      i += 1
    }
    val out = new Array[Long](planes.length)
    var b = 0
    while (b < planes.length) {
      val band = planes(b)
      var sig = 0L
      var p = 0
      while (p < band.length) {
        val plane = band(p)
        val m = math.min(n, plane.length)
        var dot = 0.0
        i = 0
        while (i < m) {
          dot += x(i) * plane(i)
          i += 1
        }
        if (dot > 0) sig |= 1L << p
        p += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: one long per band, bit p = sign of `vec . planes(b)(p)`. */
  def apply(vec: Column, planes: Array[Array[Array[Double]]]): Column =
    GraftSqlInternal.column(
      SignBandSignatures(GraftSqlInternal.expression(vec), planes))
}
