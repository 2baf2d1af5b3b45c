package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Model-quality metrics, behavior-compatible with the reference's native
  * implementations (`/root/reference/src/orm/metrics.rs:43-253`) but
  * re-expressed as distributed aggregations:
  *
  *  - the k×k confusion matrix is ONE groupBy((label, pred)).count() —
  *    k² rows collected to the driver, closed-form metrics from there
  *    (exact integer counts → deterministic doubles at any parallelism);
  *  - regression metrics accumulate in fixed-point DECIMAL (scale 6), so
  *    the result is independent of partitioning/merge order — the same
  *    number on 1 core or 1000 executors;
  *  - ROC-AUC uses the tie-aware midrank (Mann-Whitney) formulation,
  *    algebraically identical to the reference's threshold sweep
  *    (`metrics.rs:221-253`) but expressible as a window + aggregate.
  *
  * Reference quirks reproduced deliberately (they affect model selection
  * parity): binary confusion metrics use the flipped (1,1)-as-TP layout
  * (`metrics.rs:88-95`); macro-F1 maps NaN recall→1.0 but keeps NaN
  * precision (`metrics.rs:157-176`); micro == binary for 2 classes.
  */
object Metrics {

  /** Per-class confusion entries (tp/fp/fn/tn as exact counts). */
  final case class ClassMetrics(tp: Long, fp: Long, fnn: Long, tn: Long)

  final case class ClassificationReport(
      accuracy: Double, precision: Double, recall: Double,
      f1Macro: Double, f1Micro: Double, matrix: Map[(Int, Int), Long],
      precisionWeighted: Double = Double.NaN,
      recallWeighted: Double = Double.NaN,
      f1Weighted: Double = Double.NaN)

  /** Build the confusion matrix distributively and derive the report.
    * `labelCol`/`predCol` must be integer class values; classes present in
    * either column define the index set (sorted ascending), mirroring the
    * reference's BTreeSet ordering (`metrics.rs:53-56,67-71`). */
  def classification(df: DataFrame, labelCol: String, predCol: String): ClassificationReport = {
    val counts = df.groupBy(col(labelCol).cast("int").as("t"), col(predCol).cast("int").as("p"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
      .toMap
    val classes = counts.keySet.flatMap(k => Set(k._1, k._2)).toSeq.sorted
    val idx = classes.zipWithIndex.toMap
    val k = classes.size
    val m = Array.ofDim[Long](k, k)
    counts.foreach { case ((t, p), n) => m(idx(t))(idx(p)) += n }

    val per: Seq[ClassMetrics] =
      if (k == 2) {
        // sklearn-compatible binary flip: class at index 1 is "positive".
        Seq(ClassMetrics(m(1)(1), m(0)(1), m(1)(0), m(0)(0)))
      } else {
        (0 until k).map { c =>
          val tp = m(c)(c)
          val fp = m(c).sum - tp
          val fnn = (0 until k).map(r => m(r)(c)).sum - tp
          val tn = m.map(_.sum).sum - tp - fp - fnn
          ClassMetrics(tp, fp, fnn, tn)
        }
      }

    val total = m.map(_.sum).sum.toDouble
    val diag = (0 until k).map(i => m(i)(i)).sum.toDouble
    val accuracy = diag / total

    def rec(c: ClassMetrics) = c.tp.toDouble / (c.tp + c.fnn)
    def prec(c: ClassMetrics) = c.tp.toDouble / (c.tp + c.fp)
    val recall = per.map(rec).sum / per.size
    val precision = per.map(prec).sum / per.size

    // micro: pooled counts (== binary when the flip collapsed to 1 entry)
    val (tpS, fpS, fnS) = (per.map(_.tp).sum.toDouble, per.map(_.fp).sum.toDouble, per.map(_.fnn).sum.toDouble)
    val (rMi, pMi) = (tpS / (tpS + fnS), tpS / (tpS + fpS))
    val f1Micro = 2.0 * ((pMi * rMi) / (pMi + rMi))

    // macro with the reference's NaN-recall→1.0 quirk
    val f1s = per.map { c =>
      val r0 = rec(c); val r = if (r0.isNaN) 1.0 else r0
      val p = prec(c)
      2.0 * ((p * r) / (p + r))
    }
    val f1Macro = f1s.sum / f1s.size

    // support-weighted averages (sklearn average="weighted", the form the
    // reference's text-classification eval reports — transformers.py:719-721).
    // Computed over EVERY class (the binary sklearn flip above collapses
    // `per` to the positive class only); undefined per-class values → 0,
    // sklearn's zero_division default.
    val fullPer = (0 until k).map { c =>
      val tp = m(c)(c)
      val fp = (0 until k).map(r => m(r)(c)).sum - tp
      val fnn = m(c).sum - tp
      (tp, fp, fnn, m(c).sum) // support = row sum (true count of class c)
    }
    val supportTotal = fullPer.map(_._4).sum.toDouble
    def z(x: Double) = if (x.isNaN) 0.0 else x
    def wavg(f: ((Long, Long, Long, Long)) => Double): Double =
      fullPer.map(c => z(f(c)) * c._4).sum / supportTotal
    val pW = wavg { case (tp, fp, _, _) => tp.toDouble / (tp + fp) }
    val rW = wavg { case (tp, _, fnn, _) => tp.toDouble / (tp + fnn) }
    val fW = wavg { case (tp, fp, fnn, _) =>
      val p = tp.toDouble / (tp + fp); val r = tp.toDouble / (tp + fnn)
      val f = 2.0 * p * r / (p + r); if (f.isNaN) 0.0 else f
    }

    val matrix = (for (i <- 0 until k; j <- 0 until k if m(i)(j) != 0)
      yield ((classes(i), classes(j)), m(i)(j))).toMap
    ClassificationReport(accuracy, precision, recall, f1Macro, f1Micro, matrix,
      pW, rW, fW)
  }

  final case class RegressionReport(r2: Double, mae: Double, mse: Double, n: Long)

  private val dec4 = DecimalType(28, 4)
  private val dec6 = DecimalType(28, 6)

  /** Regression metrics via exact fixed-point accumulation:
    * tss = Σy² − (Σy)²/n (computational form), rss = Σ(y−ŷ)².
    * Every per-row term is cast to DECIMAL before summing so the result
    * does not depend on partition merge order. */
  def regression(df: DataFrame, labelCol: String, predCol: String): RegressionReport = {
    val y = col(labelCol).cast("double")
    val p = col(predCol).cast("double")
    val row = df.agg(
      sum(y.cast(dec4)).cast("double").as("sy"),
      sum((y * y).cast(dec6)).cast("double").as("syy"),
      sum(((y - p) * (y - p)).cast(dec6)).cast("double").as("se"),
      sum(abs(y - p).cast(dec4)).cast("double").as("sae"),
      count(lit(1)).as("n")).head()
    val (sy, syy, se, sae, n) =
      (row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3), row.getLong(4))
    val tss = syy - sy * sy / n
    RegressionReport(1.0 - se / tss, sae / n, se / n, n)
  }

  /** Column expressions for the same regression aggregates (used by the
    * oracle-checked queries so the numbers flow through one plan). */
  def regressionAggs(y0: Column, p0: Column): Seq[Column] = {
    val y = y0.cast("double"); val p = p0.cast("double")
    Seq(
      sum(y.cast(dec4)).cast("double").as("sy"),
      sum((y * y).cast(dec6)).cast("double").as("syy"),
      sum(((y - p) * (y - p)).cast(dec6)).cast("double").as("se"),
      sum(abs(y - p).cast(dec4)).cast("double").as("sae"),
      count(lit(1)).as("n"))
  }

  /** Tie-aware ROC-AUC: AUC = (Σ_pos midrank − n⁺(n⁺+1)/2) / (n⁺·n⁻).
    * The full relation collapses to per-distinct-score counts first (one
    * map-combinable shuffle); the midrank of a tie group is then
    * closed-form from the exclusive prefix count — `prev + (cnt+1)/2` —
    * computed by the two-phase distributed prefix sum, so no stage ever
    * funnels through one task. Algebraically equal to the reference's
    * threshold sweep (`metrics.rs:221-253`). */
  def rocAuc(df: DataFrame, labelCol: String, scoreCol: String): Double = {
    val scored = df.select(col(labelCol).cast("boolean").as("y"), col(scoreCol).cast("double").as("s"))
    val counts = scored.groupBy(col("s")).agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("np"),
      count(lit(1)).as("cnt"))
    val cum = graft.operators.Distributed
      .groupedPrefixSum(counts, Seq.empty, Seq(col("s")), "cnt", "cum")
    val midrank = col("cum") - col("cnt") + (col("cnt") + lit(1)) / lit(2.0)
    // midrank·np terms are exact x.5 multiples of integers — DECIMAL
    // accumulation makes the sum independent of partition merge order
    // (bit-identical retrains AND the hash-exact oracle twin)
    val row = cum.agg(
      sum((midrank * col("np")).cast(dec6)).cast("double").as("sumPos"),
      sum(col("np")).as("nPos"),
      sum(col("cnt")).as("nAll")).head()
    val (sumPos, nPos, nAll) = (row.getDouble(0), row.getLong(1), row.getLong(2))
    val nNeg = nAll - nPos
    (sumPos - nPos.toDouble * (nPos + 1) / 2.0) / (nPos.toDouble * nNeg)
  }

  /** Clamped log-loss (`metrics.rs:208-219`); eps default matches the
    * reference call site (`src/orm/model.rs` uses 1e-15). */
  def logLoss(df: DataFrame, labelCol: String, probCol: String, eps: Double = 1e-15): Double = {
    val y = col(labelCol).cast("double")
    val p0 = col(probCol).cast("double")
    val p = least(greatest(p0, lit(eps)), lit(1.0 - eps))
    val row = df.agg(
      sum(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p)).as("s"),
      count(lit(1)).as("n")).head()
    -row.getDouble(0) / row.getLong(1)
  }

  /** Reference r2 (`metrics.rs:188-207`) for API parity; prefer
    * `regression(...)` which returns the same value deterministically. */
  def r2(df: DataFrame, labelCol: String, predCol: String): Double =
    regression(df, labelCol, predCol).r2
}
