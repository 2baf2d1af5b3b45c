package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst vector folds: `graft_dot(a, b)` = Σ a(i)·b(i) and
  * `graft_sqdist(a, b)` = Σ (a(i)−b(i))², both strict left-to-right
  * double accumulation over `array<double>` operands.
  *
  * These are drop-in replacements for the higher-order-function form
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (s, x) => s + x)`:
  * bit-identical results (each element's product/difference rounds
  * once, then the running sum rounds once — the same FP op sequence as
  * the fold), including the null semantics (null array, null element,
  * or length mismatch → null, exactly as zip_with's null-padding
  * propagates through the sum).
  *
  * The HOF form never enters whole-stage codegen — each row pays an
  * interpreted lambda per element plus a materialized intermediate
  * array, which is what made the O(n²) cosine scoring loops the top
  * bench line. These expressions emit a static call on two ArrayData
  * (`doGenCode`), allocate nothing, and keep the whole scoring
  * pipeline inside one codegen stage.
  */
abstract class VectorFoldExpression extends BinaryExpression {
  // input typing handled by the registry builders (cast to array<double>),
  // same scheme as Md5Prefix60
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Fully-qualified static fold target returning null on element-null
    * or length mismatch. */
  protected def foldFn: String

  protected def foldEval(a: ArrayData, b: ArrayData): java.lang.Double

  override protected def nullSafeEval(a: Any, b: Any): Any =
    foldEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("fold")
      s"""
         |java.lang.Double $r = $foldFn($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
}

case class DotProduct(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "graft_dot"
  override protected def foldFn: String = "graft.functions.VectorFold.dot"
  override protected def foldEval(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorFold.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

case class SumSqDiff(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "graft_sqdist"
  override protected def foldFn: String = "graft.functions.VectorFold.sqdist"
  override protected def foldEval(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorFold.sqdist(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SumSqDiff =
    copy(left = l, right = r)
}

object VectorFold {
  /** Σ a(i)·b(i), left to right. Null element or length mismatch → null
    * (zip_with null-padding parity). */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Σ (a(i)−b(i))², left to right. Same null semantics as `dot`. */
  def sqdist(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}
