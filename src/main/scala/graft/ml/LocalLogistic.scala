package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** Bounded-size driver route for binomial logistic regression — the
  * HistGB treatment (route-by-runtime-size, guide §1.2-1) applied to
  * the LBFGS job floor VERDICT r20 ranked #4: every lifecycle LR fit
  * runs a Summarizer `treeAggregate` plus one `treeAggregate` per LBFGS
  * iteration (11–31 scheduled jobs across the ft lifecycles and
  * `ds_quality_classifier`), pure scheduler overhead when the training
  * frame is bounded (ft heads: thousands of 64-d embeddings; quality
  * classifier: a seed-balanced sample).
  *
  * Parity: this is the SAME optimization problem Spark's
  * `LogisticRegression.train` solves, replicated term by term for the
  * supported configuration (binomial labels, fitIntercept,
  * standardization=true, elasticNetParam=0, unweighted, unbounded):
  *
  *  - feature standardization by the summarizer's SAMPLE std, applied
  *    by coefficient scaling (the aggregator's trick), features with
  *    std 0 pinned at coefficient 0;
  *  - the same numerically-stable binomial log-loss (margin = −(x·m+b),
  *    log1pExp), mean-normalized by the weight sum;
  *  - L2 penalty 0.5·λ·Σβ² over the SCALED coefficients, intercept
  *    excluded (standardization=true semantics);
  *  - intercept initialized at the label log-odds, coefficients at 0;
  *  - breeze LBFGS with the estimator's maxIter/tol and 10 corrections
  *    (the exact optimizer instance Spark constructs), iterated through
  *    a CachedDiffFunction to the last state;
  *  - final rescale coefficients·(1/std) back to the original space.
  *
  * The only divergence from the distributed fit is floating-point
  * association (per-row driver loop vs block gemv + treeAggregate merge
  * order — the distributed result is itself not bit-stable across
  * partitionings). LocalLogisticSpec pins coefficients to ≤1e-6
  * relative and predictions identical on dense and sparse fixtures.
  * Anything outside the supported configuration — or past the
  * `spark.graft.lrLocalFitRows` cap (default 65536, 0 disables) —
  * returns None and the caller falls back to the distributed fit
  * unchanged. */
private[graft] object LocalLogistic {

  private def log1pExp(x: Double): Double =
    if (x > 0) x + math.log1p(math.exp(-x)) else math.log1p(math.exp(x))

  /** Driver fit when supported + bounded, else None (caller falls back). */
  def fitBounded(lr: LogisticRegression, df: DataFrame): Option[LogisticRegressionModel] = {
    val cap = df.sparkSession.conf
      .getOption("spark.graft.lrLocalFitRows").map(_.toInt).getOrElse(65536)
    if (cap <= 0) return None
    val supported =
      (lr.getFamily == "auto" || lr.getFamily == "binomial") &&
        lr.getElasticNetParam == 0.0 && lr.getStandardization &&
        lr.getFitIntercept && !lr.isSet(lr.weightCol) &&
        !lr.isSet(lr.lowerBoundsOnCoefficients) &&
        !lr.isSet(lr.upperBoundsOnCoefficients) &&
        !lr.isSet(lr.lowerBoundsOnIntercepts) &&
        !lr.isSet(lr.upperBoundsOnIntercepts)
    if (!supported) return None
    // one bounded collect (limit cap+1 = the SVM/HGB early-stop shape)
    // instead of 1 summarizer + maxIter objective jobs
    val rows = df.select(col(lr.getFeaturesCol), col(lr.getLabelCol).cast("double"))
      .limit(cap + 1).collect()
    if (rows.length > cap || rows.isEmpty) return None
    val data = new Array[(Vector, Double)](rows.length)
    var i = 0
    while (i < rows.length) {
      rows(i) match {
        case Row(f: Vector, y: Double) =>
          if (y != 0.0 && y != 1.0) return None // not binomial → Spark path
          data(i) = (f, y)
        case _ => return None // null feature/label → Spark path (same error)
      }
      i += 1
    }
    val n = data.length
    val p = data(0)._1.size
    val c1 = data.count(_._2 == 1.0)
    val c0 = n - c1
    if (c0 == 0 || c1 == 0) return None // constant label → Spark's special case

    // summarizer parity: mean + SAMPLE variance per feature (what
    // Summarizer/"std" returns for unit weights)
    val sum = new Array[Double](p)
    val sumSq = new Array[Double](p)
    data.foreach { case (f, _) =>
      f.foreachActive { (j, v) => sum(j) += v; sumSq(j) += v * v }
    }
    val invStd = Array.tabulate(p) { j =>
      val mean = sum(j) / n
      val varj = if (n > 1) math.max(0.0, (sumSq(j) - n * mean * mean) / (n - 1)) else 0.0
      val std = math.sqrt(varj)
      if (std != 0.0) 1.0 / std else 0.0
    }
    // trainImpl's fitWithMean geometry (verified against the 4.1
    // bytecode): instances are pre-scaled to unit std AND, with
    // fitIntercept, virtually CENTERED at the scaled mean — an affine
    // reparametrization with the same optimum but a different (better
    // conditioned) LBFGS trajectory, so matching it is what makes the
    // small-maxIter iterates line up. Centering stays sparse-friendly
    // as a per-call scalar offset: margin = x_scaled·β − scaledMean·β + b.
    val scaledMean = Array.tabulate(p)(j => sum(j) / n * invStd(j))

    val lambda = lr.getRegParam
    import breeze.linalg.{DenseVector => BDV}
    val costFun = new breeze.optimize.DiffFunction[BDV[Double]] {
      override def calculate(x: BDV[Double]): (Double, BDV[Double]) = {
        // m_j = β_j·invStd_j folds the instance scaling into the
        // coefficient so rows stay sparse
        val m = new Array[Double](p)
        var smDotBeta = 0.0
        var j = 0
        while (j < p) {
          m(j) = x(j) * invStd(j)
          smDotBeta += scaledMean(j) * x(j)
          j += 1
        }
        val b0 = x(p) - smDotBeta // effective intercept after centering
        val rawGrad = new Array[Double](p)
        var multSum = 0.0
        var loss = 0.0
        var k = 0
        while (k < n) {
          val (f, y) = data(k)
          var dot = b0
          f.foreachActive { (jj, v) => dot += v * m(jj) }
          val margin = -dot
          val mult = 1.0 / (1.0 + math.exp(margin)) - y
          f.foreachActive { (jj, v) => rawGrad(jj) += mult * v }
          multSum += mult
          loss += (if (y > 0) log1pExp(margin) else log1pExp(margin) - margin)
          k += 1
        }
        val grad = new Array[Double](p + 1)
        j = 0
        while (j < p) {
          // gradient over the CENTERED scaled features:
          // Σ mult·(x_scaled − scaledMean) = rawGrad·invStd − multSum·scaledMean
          grad(j) = (rawGrad(j) * invStd(j) - multSum * scaledMean(j)) / n +
            lambda * x(j)
          j += 1
        }
        grad(p) = multSum / n
        var reg = 0.0
        j = 0
        while (j < p) { reg += x(j) * x(j); j += 1 }
        (loss / n + 0.5 * lambda * reg, new BDV(grad))
      }
    }
    val init = new BDV(new Array[Double](p + 1))
    init(p) = math.log(c1.toDouble / c0) // the train path's log-odds intercept
    val optimizer = new breeze.optimize.LBFGS[BDV[Double]](
      lr.getMaxIter, 10, lr.getTol)
    val states = optimizer.iterations(
      new breeze.optimize.CachedDiffFunction(costFun), init)
    var last: optimizer.State = null
    while (states.hasNext) last = states.next()
    if (last == null || last.x.valuesIterator.exists(v => v.isNaN || v.isInfinite))
      return None // optimizer failure → let the Spark path raise/handle it
    val coef = Array.tabulate(p)(j => last.x(j) * invStd(j))
    // back out of the centered parametrization: b = b_centered − scaledMean·β
    var smDot = 0.0
    var jj = 0
    while (jj < p) { smDot += scaledMean(jj) * last.x(jj); jj += 1 }
    Some(org.apache.spark.ml.GraftMLLocalIO.makeBinomialLRModel(
      lr, Vectors.dense(coef), last.x(p) - smDot))
  }

  /** The Finetune head shape: Pipeline(Array(lr)).fit(df), driver-routed
    * when [[fitBounded]] supports it. */
  def fitHeadPipeline(lr: LogisticRegression, df: DataFrame): PipelineModel =
    fitBounded(lr, df) match {
      case Some(m) => org.apache.spark.ml.GraftMLLocalIO.makePipelineModel(
        org.apache.spark.ml.util.Identifiable.randomUID("pipeline"), Array(m))
      case None =>
        new org.apache.spark.ml.Pipeline()
          .setStages(Array(lr)).fit(df)
    }
}
