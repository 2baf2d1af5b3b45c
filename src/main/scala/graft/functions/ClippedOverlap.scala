package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `graft_overlap(a, b)` =
  * Σ_g min(count_a(g), count_b(g)) over distinct string elements g —
  * the clipped multiset overlap under ROUGE and BLEU
  * ([[graft.llm.TextMetrics]]).
  *
  * The composable form (`aggregate` over `transform(array_distinct(a))`
  * with two nested `filter`s) is O(|distinct|·(|a|+|b|)) INTERPRETED
  * lambda invocations per evaluation, and projection collapse
  * duplicates it into every derived metric column — measured 41 s of a
  * 63 s finetune eval on 1,250 ~60-token summaries. This expression is
  * one static call: two hash-count passes plus a min-sum, O(|a|+|b|),
  * inside whole-stage codegen. Bit-identical to the composable form
  * (exact integer counts; null elements match nothing there and are
  * skipped here).
  *
  * Children must be `array<string>` — the Column builder is
  * [[graft.llm.TextMetrics.clippedOverlap]], which only ever feeds
  * token/n-gram arrays.
  */
case class ClippedOverlap(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_overlap"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ClippedOverlap.overlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ClippedOverlap.overlap($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ClippedOverlap =
    copy(left = l, right = r)
}

object ClippedOverlap {
  private def counts(arr: ArrayData): java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val c = m.get(s)
        m.put(s, if (c == null) 1 else c + 1)
      }
      i += 1
    }
    m
  }

  /** Static codegen target. */
  def overlap(a: ArrayData, b: ArrayData): Long = {
    val ca = counts(a)
    if (ca.isEmpty) return 0L
    val cb = counts(b)
    var tot = 0L
    val it = ca.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val vb = cb.get(e.getKey)
      if (vb != null) tot += math.min(e.getValue.intValue(), vb.intValue())
    }
    tot
  }
}
