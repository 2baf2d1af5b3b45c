package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all six ROUGE-1/ROUGE-2 integer counts of
  * a (prediction, reference) string pair in ONE tokenization pass —
  * struct(ov1, np1, nr1, ov2, np2, nr2) where ovN is the clipped n-gram
  * multiset overlap and npN/nrN the n-gram totals per side.
  *
  * Why a fused expression instead of composing `tokens`/`ngrams`/
  * [[ClippedOverlap]] per metric column: each derived column built its
  * OWN copy of the token/bigram HOF tree (fresh `split`/`transform`
  * expressions per `withColumn`), so the optimized plan tokenized the
  * same strings 24 times per row and every HOF ran interpreted
  * (ArrayTransform is CodegenFallback) — measured 12 s of the 20 s
  * `ft_summarize_train` gate at sf0.1 for 5,000 rows. This expression
  * tokenizes each side once, counts unigrams and bigrams in the same
  * pass, and the metric columns become cheap struct-field reads;
  * CollapseProject keeps the single producer because the struct is
  * referenced many times.
  *
  * Bit-exact with the composed form: tokenization replays
  * `filter(split(trim(lower(c)), "\\s+"), length > 0)` via the SAME
  * primitives (UTF8String.toLowerCase/trim, Java regex split), bigram
  * identity is the U+0001-joined token pair exactly as
  * [[graft.llm.TextMetrics.ngrams]] builds it, and every output is an
  * exact integer count, so downstream ratios match the DuckDB oracle to
  * the last bit (reference metric contract: `transformers.py:672-682`).
  */
case class RougeStats(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = RougeStats.schema
  override def prettyName: String = "graft_rouge_stats"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    RougeStats.stats(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.RougeStats.stats($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): RougeStats =
    copy(left = l, right = r)
}

object RougeStats {
  val schema: StructType = StructType(Seq(
    StructField("ov1", LongType, nullable = false),
    StructField("np1", LongType, nullable = false),
    StructField("nr1", LongType, nullable = false),
    StructField("ov2", LongType, nullable = false),
    StructField("np2", LongType, nullable = false),
    StructField("nr2", LongType, nullable = false)))

  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** U+0001 never appears in whitespace-split tokens (TextMetrics.SEP). */
  private val SEP = "\u0001"

  /** `filter(split(trim(lower(s)), "\\s+"), length > 0)` — the exact
    * TextMetrics.tokens composition on the same UTF8String primitives. */
  def tokenize(s: UTF8String): Array[String] =
    WS.split(s.toLowerCase.trim.toString, -1).filter(_.nonEmpty)

  private def addCount(m: java.util.HashMap[String, Integer], k: String): Unit = {
    val c = m.get(k)
    m.put(k, if (c == null) 1 else c + 1)
  }

  private def overlap(a: java.util.HashMap[String, Integer],
      b: java.util.HashMap[String, Integer]): Long = {
    var tot = 0L
    val it = a.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val vb = b.get(e.getKey)
      if (vb != null) tot += math.min(e.getValue.intValue(), vb.intValue())
    }
    tot
  }

  /** Static codegen target: one pass over both strings → six counts. */
  def stats(pred: UTF8String, ref: UTF8String): InternalRow = {
    val tp = tokenize(pred)
    val tr = tokenize(ref)
    val u1p = new java.util.HashMap[String, Integer]()
    val u1r = new java.util.HashMap[String, Integer]()
    val u2p = new java.util.HashMap[String, Integer]()
    val u2r = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < tp.length) {
      addCount(u1p, tp(i))
      if (i + 1 < tp.length) addCount(u2p, tp(i) + SEP + tp(i + 1))
      i += 1
    }
    i = 0
    while (i < tr.length) {
      addCount(u1r, tr(i))
      if (i + 1 < tr.length) addCount(u2r, tr(i) + SEP + tr(i + 1))
      i += 1
    }
    new GenericInternalRow(Array[Any](
      overlap(u1p, u1r), tp.length.toLong, tr.length.toLong,
      overlap(u2p, u2r),
      math.max(tp.length - 1, 0).toLong, math.max(tr.length - 1, 0).toLong))
  }
}
