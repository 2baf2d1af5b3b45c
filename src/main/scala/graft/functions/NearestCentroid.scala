package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: `graft_cell(v, centroids)` = argmin over
  * k of Σ (v(i) − centroids(k)(i))², ties broken toward the lower index
  * — the coarse-quantizer cell assignment under the IVF/kNN-graph
  * similarity family.
  *
  * The composable form (an `array_min` over k `graft_sqdist` struct
  * columns) materializes k structs per row and grows the generated code
  * linearly with k, falling out of codegen past Janino's method limit
  * around a few hundred centroids. This expression keeps the assignment
  * a single static call at ANY k: the centroid matrix is one literal
  * operand (constant-folded once per plan), the scan stays inside
  * whole-stage codegen, and per-row work is one tight k×dim loop with
  * early exit once a partial sum exceeds the best distance so far
  * (early exit only shortcuts accumulation ordering for distances that
  * are NOT the minimum — the argmin itself is exact).
  */
case class NearestCentroid(left: Expression, right: Expression) extends BinaryExpression {
  // input typing handled by the registry builder (casts to array<double>
  // / array<array<double>>), same scheme as the VectorFold expressions
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cell"

  override protected def nullSafeEval(v: Any, cents: Any): Any =
    NearestCentroid.assign(v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val r = ctx.freshName("cell")
      s"""
         |java.lang.Long $r = graft.functions.NearestCentroid.assign($v, $c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCentroid =
    copy(left = l, right = r)
}

object NearestCentroid {
  /** Static codegen target. Null on: empty centroid list, null element
    * anywhere, or a centroid whose length mismatches `v` — the same
    * strict null propagation as the VectorFold primitives. */
  def assign(v: ArrayData, cents: ArrayData): java.lang.Long = {
    val k = cents.numElements()
    if (k == 0) return null
    val dim = v.numElements()
    var best = Double.PositiveInfinity
    var bestK = -1L
    var c = 0
    while (c < k) {
      if (cents.isNullAt(c)) return null
      val cent = cents.getArray(c)
      if (cent.numElements() != dim) return null
      var s = 0.0
      var i = 0
      while (i < dim && s < best) {
        if (v.isNullAt(i) || cent.isNullAt(i)) return null
        val d = v.getDouble(i) - cent.getDouble(i)
        s += d * d
        i += 1
      }
      // finish the null scan even after early exit so null semantics
      // don't depend on the running minimum
      while (i < dim) {
        if (v.isNullAt(i) || cent.isNullAt(i)) return null
        i += 1
      }
      if (s < best) { best = s; bestK = c }
      c += 1
    }
    java.lang.Long.valueOf(bestK)
  }
}
