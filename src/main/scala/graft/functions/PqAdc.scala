package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `graft_pq_adc(codes, table)` — asymmetric-distance lookup for
  * product quantization (Jégou, Douze & Schmid 2011 §IV.A: ADC):
  * Σ_j table(j)(codes(j)), the approximate squared distance between a
  * query and a PQ-encoded vector, where `table` is the query's
  * per-subspace distance table (m × k doubles, computed ONCE per
  * query) and `codes` the row's m codeword ids.
  *
  * The scan over billions of codes is the hot loop of a PQ index —
  * this expression keeps it inside whole-stage codegen (two ArrayData
  * reads per subspace, no allocation), where the HOF spelling
  * (`aggregate(zip_with(...))`) would drop every row to interpreted
  * lambdas. Null array, null element, or a code outside the table →
  * null (mirroring the VectorFold null contract).
  */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_pq_adc"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(codes: Any, table: Any): Any =
    PqAdc.adc(codes.asInstanceOf[ArrayData], table.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val r = ctx.freshName("adc")
      s"""
         |java.lang.Double $r = graft.functions.PqAdc.adc($c, $t);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}

object PqAdc {
  def adc(codes: ArrayData, table: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    if (m != table.numElements()) return null
    var s = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j) || table.isNullAt(j)) return null
      val sub = table.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= sub.numElements() || sub.isNullAt(c)) return null
      s += sub.getDouble(c)
      j += 1
    }
    java.lang.Double.valueOf(s)
  }
}
