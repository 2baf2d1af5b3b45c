package graft.ml

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.ml.{PredictionModel, Predictor}
import org.apache.spark.ml.linalg.{DenseVector, Vector, Vectors}
import org.apache.spark.ml.param.{DoubleArrayParam, DoubleParam, IntParam, LongParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{Dataset, Row}

/** The sklearn-only linear-model remainder (reference
  * `src/bindings/sklearn/sklearn.py:44-57`, enum
  * `src/orm/algorithm.rs:15-26`), implemented Spark-first instead of
  * dispatched to a Python process.
  *
  * Design: every solver here consumes SUFFICIENT STATISTICS — the
  * (p+1)×(p+1) Gram matrix of [x, 1], X᙭y, y᙭y, n — computed in ONE
  * distributed `treeAggregate` pass, then runs O(p³) driver-side math
  * on them. That is the scale-correct shape for linear models: the
  * 100 TB corpus is read once (map-combinable, no shuffle), and the
  * driver never sees more than p² doubles. Iterative solvers that
  * genuinely need data passes (RANSAC inlier counts, quantile IRLS)
  * do one distributed pass PER ITERATION with all candidates
  * evaluated simultaneously, never a per-row driver loop.
  *
  * Exactness ledger (mirrors the fit-dispatch compat policy):
  *  - bayesian_ridge / ard: the sklearn evidence-maximization
  *    iterations on the eigendecomposition of the centered Gram —
  *    same update equations, same default hyperpriors (1e-6).
  *  - orthogonal_matching_pursuit: exact Gram-OMP (greedy argmax
  *    correlation, exact LS refit on the active set each step).
  *  - least_angle / lasso_least_angle: the LARS path on the centered
  *    Gram with the lasso sign-crossing drop rule.
  *  - ransac: sklearn's trial loop, but all trials' inlier counts are
  *    computed in one distributed pass; MAD residual threshold from
  *    the distributed exact-percentile machinery.
  *  - theil_sen: sklearn's own subpopulation scheme (bounded seeded
  *    subsets, spatial median via Weiszfeld) — the subsets are
  *    collected driver-side exactly as sklearn subsamples.
  *  - quantile: IRLS on the pinball loss (flagged approximation —
  *    the IRLS fixed point is the same population minimizer,
  *    finite-sample coefficients differ). `exact=true` opts into the
  *    TRUE pinball LP sklearn hands to linprog, solved by a capped
  *    dense primal simplex ([[GramSolvers.quantileExactLp]]) —
  *    guard-and-route back to IRLS past the cap.
  *  - passive_aggressive: partition-local online PA-II averaged
  *    across partitions (flagged — the reference's is sequential
  *    online; averaging is the standard distributed analogue).
  *    `exact=true` opts into the TRUE sequential scheme under a row
  *    cap (guard-and-route, same convention as the kernel family):
  *    seeded per-epoch shuffle + sklearn's no-improvement early
  *    stopping (tol, n_iter_no_change=5). Scheme-exact; documented
  *    RNG deviation — the shuffle stream is ours, not numpy's, so
  *    coefficients match sklearn run-for-run only in distribution
  *    (the same caveat RANSAC/theil_sen carry).
  */
class GraftLinearModel(override val uid: String)
    extends PredictionModel[Vector, GraftLinearModel] with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("graftlin"))

  // learned state lives in params so DefaultParamsWritable persists it
  // inside the PipelineModel (the RFFTransformer convention)
  final val coefficients = new DoubleArrayParam(this, "coefficients", "fitted weights")
  final val interceptParam = new DoubleParam(this, "interceptParam", "fitted intercept")
  final val mode = new Param[String](this, "mode", "regression | binary")
  setDefault(mode -> "regression")

  def setCoefficients(v: Array[Double]): this.type = set(coefficients, v)
  def setIntercept(v: Double): this.type = set(interceptParam, v)
  def setMode(v: String): this.type = set(mode, v)

  def coeffs: Vector = Vectors.dense($(coefficients))
  def intercept: Double = $(interceptParam)

  override def numFeatures: Int = $(coefficients).length

  override def predict(features: Vector): Double = {
    val w = $(coefficients)
    val x = features.toArray
    // same contract as MLlib's BLAS.dot and the InlineLinearPredict
    // codegen path: a dimension mismatch raises — in particular an
    // over-long array must not silently score its first p elements,
    // or the same query would succeed or fail depending on whether
    // the optimizer rule fired
    require(x.length == w.length,
      s"quackml_predict: feature vector has ${x.length} elements, model expects ${w.length}")
    var s = $(interceptParam)
    var i = 0
    while (i < w.length) { s += w(i) * x(i); i += 1 }
    if ($(mode) == "binary") { if (s > 0.0) 1.0 else 0.0 } else s
  }

  override def copy(extra: ParamMap): GraftLinearModel = defaultCopy(extra)
}

object GraftLinearModel extends DefaultParamsReadable[GraftLinearModel]

/** Sufficient statistics of [X, 1] and y: one treeAggregate pass. */
private[ml] final case class GramStats(n: Long, a: BDM[Double], b: BDV[Double],
    yty: Double) {
  val p1: Int = b.length          // p + 1 (intercept column last)
  def p: Int = p1 - 1
  def xMean: BDV[Double] = a(p, 0 until p).t / n.toDouble
  def yMean: Double = b(p) / n.toDouble
  /** Centered p×p Gram, X᙭y, y᙭y (the fit_intercept=True frame). */
  def centered: (BDM[Double], BDV[Double], Double) = {
    val xm = xMean
    val xtxc = a(0 until p, 0 until p) - (xm * xm.t) * n.toDouble
    val xtyc = b(0 until p) - xm * (n.toDouble * yMean)
    (xtxc, xtyc, yty - n.toDouble * yMean * yMean)
  }
}

private[ml] object Gram {
  def compute(rows: org.apache.spark.rdd.RDD[(Vector, Double)], p: Int): GramStats = {
    val p1 = p + 1
    val zero = (0L, new Array[Double](p1 * p1), new Array[Double](p1), 0.0)
    val (n, aFlat, bArr, yty) = rows.treeAggregate(zero)(
      seqOp = { case ((n, a, bv, s), (x, y)) =>
        val xa = new Array[Double](p1)
        x.foreachActive((i, v) => xa(i) = v)
        xa(p) = 1.0
        var i = 0
        while (i < p1) {
          val xi = xa(i)
          if (xi != 0.0) {
            var j = 0
            while (j < p1) { a(i * p1 + j) += xi * xa(j); j += 1 }
            bv(i) += xi * y
          }
          i += 1
        }
        (n + 1, a, bv, s + y * y)
      },
      combOp = { case ((n1, a1, b1, s1), (n2, a2, b2, s2)) =>
        var i = 0
        while (i < a1.length) { a1(i) += a2(i); i += 1 }
        i = 0
        while (i < b1.length) { b1(i) += b2(i); i += 1 }
        (n1 + n2, a1, b1, s1 + s2)
      })
    require(n > 0, "cannot fit on an empty dataset")
    GramStats(n, new BDM(p1, p1, aFlat), new BDV(bArr), yty)
  }

  def fromDataset(ds: Dataset[_], featuresCol: String, labelCol: String): GramStats = {
    import org.apache.spark.sql.functions.col
    val cleaned = ds.select(col(featuresCol), col(labelCol).cast("double")).na.drop()
    val rows = cleaned.rdd.map { case Row(f: Vector, y: Double) => (f, y) }
    compute(rows, featureDim(cleaned, featuresCol))
  }

  /** Feature dimension read from the first NA-DROPPED row — probing the
    * raw frame NPEs when a leading row carries null features, and an
    * empty frame deserves a message, not NoSuchElementException. */
  def featureDim(cleaned: Dataset[_], featuresCol: String): Int = {
    import org.apache.spark.sql.functions.col
    val first = cleaned.select(col(featuresCol)).limit(1).collect()
    require(first.nonEmpty, "cannot infer the feature dimension from an empty dataset")
    first(0).getAs[Vector](0).size
  }
}

class GramRegression(override val uid: String)
    extends Predictor[Vector, GramRegression, GraftLinearModel]
    with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("gramreg"))

  final val solver = new Param[String](this, "solver",
    "bayesian_ridge | ard | omp | lars | lasso_lars | ransac | theil_sen | " +
      "quantile | quantile_exact | passive_aggressive | " +
      "passive_aggressive_binary | pa_sequential | pa_sequential_binary | " +
      "perceptron_sequential")
  final val maxRows = new IntParam(this, "maxRows",
    "row cap for the inherently-sequential exact solvers (pa_sequential*)")
  final val alpha = new DoubleParam(this, "alpha", "regularization / lars stop")
  final val nNonzero = new IntParam(this, "nNonzero",
    "OMP/LARS active-set size; <=0 means sklearn default (10% of p, min 1)")
  final val maxIter = new IntParam(this, "maxIter", "iteration budget")
  final val tol = new DoubleParam(this, "tol", "convergence tolerance")
  final val quantileTau = new DoubleParam(this, "quantileTau", "pinball quantile")
  final val regC = new DoubleParam(this, "regC", "PA aggressiveness C")
  final val epsilon = new DoubleParam(this, "epsilon", "PA-regression insensitivity")
  final val maxTrials = new IntParam(this, "maxTrials", "RANSAC trials")
  final val maxSubpopulation = new IntParam(this, "maxSubpopulation",
    "theil_sen subset budget")
  final val seed = new LongParam(this, "seed", "sampling seed")

  setDefault(solver -> "bayesian_ridge", alpha -> 1.0, nNonzero -> 0,
    maxIter -> 300, tol -> 1e-3, quantileTau -> 0.5, regC -> 1.0,
    epsilon -> 0.1, maxTrials -> 100, maxSubpopulation -> 1000, seed -> 42L,
    maxRows -> 100000)

  def setSolver(v: String): this.type = set(solver, v)
  def setAlpha(v: Double): this.type = set(alpha, v)
  def setNNonzero(v: Int): this.type = set(nNonzero, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setTol(v: Double): this.type = set(tol, v)
  def setQuantileTau(v: Double): this.type = set(quantileTau, v)
  def setRegC(v: Double): this.type = set(regC, v)
  def setEpsilon(v: Double): this.type = set(epsilon, v)
  def setMaxTrials(v: Int): this.type = set(maxTrials, v)
  def setMaxSubpopulation(v: Int): this.type = set(maxSubpopulation, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setMaxRows(v: Int): this.type = set(maxRows, v)

  override def copy(extra: ParamMap): GramRegression = defaultCopy(extra)

  override protected def train(ds: Dataset[_]): GraftLinearModel = {
    val fitRes: ((Array[Double], Double), Boolean) = $(solver) match {
      case "bayesian_ridge" => (GramSolvers.bayesianRidge(stats(ds), $(maxIter), $(tol)), false)
      case "ard" => (GramSolvers.ard(stats(ds), $(maxIter), $(tol)), false)
      case "omp" => (GramSolvers.omp(stats(ds), kDefault(ds)), false)
      case "lars" =>
        // sklearn Lars default n_nonzero_coefs=500 (effectively the full
        // path) — NOT OMP's 10%-of-features default
        val kLars = if ($(nNonzero) > 0) $(nNonzero) else 500
        (GramSolvers.lars(stats(ds), kLars, 0.0, lasso = false), false)
      case "lasso_lars" => (GramSolvers.lars(stats(ds), Int.MaxValue, $(alpha), lasso = true), false)
      case "ransac" => (GramSolvers.ransac(ds, getFeaturesCol, getLabelCol,
        $(maxTrials), $(seed)), false)
      case "theil_sen" => (GramSolvers.theilSen(ds, getFeaturesCol, getLabelCol,
        $(maxSubpopulation), $(maxIter), $(tol), $(seed)), false)
      case "quantile" => (GramSolvers.quantileIrls(ds, getFeaturesCol, getLabelCol,
        $(quantileTau), $(alpha), $(maxIter), $(tol)), false)
      case "quantile_exact" => (GramSolvers.quantileExactLp(ds, getFeaturesCol,
        getLabelCol, $(quantileTau), $(alpha),
        // the LP tableau is n×(2n+2p+3) doubles — O(n²) DRIVER memory —
        // so the shared maxRows default (sized for the O(n·p) sequential
        // solvers) must not apply: 2,000 rows ≈ 64 MB tableau; anything
        // larger needs an explicit, eyes-open setMaxRows
        math.min($(maxRows), 2000)), false)
      case "passive_aggressive" => (GramSolvers.passiveAggressive(ds, getFeaturesCol,
        getLabelCol, $(regC), $(epsilon), binary = false), false)
      case "passive_aggressive_binary" => (GramSolvers.passiveAggressive(ds,
        getFeaturesCol, getLabelCol, $(regC), $(epsilon), binary = true), true)
      case "pa_sequential" => (GramSolvers.passiveAggressiveSequential(ds,
        getFeaturesCol, getLabelCol, $(regC), $(epsilon), binary = false,
        $(maxIter), $(tol), $(seed), $(maxRows)), false)
      case "pa_sequential_binary" => (GramSolvers.passiveAggressiveSequential(ds,
        getFeaturesCol, getLabelCol, $(regC), $(epsilon), binary = true,
        $(maxIter), $(tol), $(seed), $(maxRows)), true)
      case "perceptron_sequential" => (GramSolvers.passiveAggressiveSequential(ds,
        getFeaturesCol, getLabelCol, $(regC), $(epsilon), binary = true,
        $(maxIter), $(tol), $(seed), $(maxRows), rule = "perceptron"), true)
      case s => throw new IllegalArgumentException(s"unknown gram solver: $s")
    }
    val ((coefs, icept), binary) = fitRes
    val m = new GraftLinearModel(uid + "_m")
      .setCoefficients(coefs).setIntercept(icept)
      .setMode(if (binary) "binary" else "regression")
    m.setParent(this)
    m.set(m.predictionCol, getPredictionCol)
    m.set(m.featuresCol, getFeaturesCol)
    m
  }

  private def stats(ds: Dataset[_]): GramStats =
    Gram.fromDataset(ds, getFeaturesCol, getLabelCol)

  private def kDefault(ds: Dataset[_]): Int =
    if ($(nNonzero) > 0) $(nNonzero)
    else {
      // probe the NA-DROPPED frame (Gram.featureDim's whole contract) —
      // head() on the raw frame NPEs when the first row has null features
      val p = Gram.featureDim(
        ds.select(org.apache.spark.sql.functions.col(getFeaturesCol)).na.drop(),
        getFeaturesCol)
      math.max(1, p / 10) // sklearn OMP default: 10% of features
    }
}

object GramRegression extends DefaultParamsReadable[GramRegression]

private[ml] object GramSolvers {
  private def solve(a: BDM[Double], b: BDV[Double]): BDV[Double] = {
    // ridge-jitter fallback keeps degenerate Grams solvable
    try a \ b
    catch { case _: breeze.linalg.MatrixSingularException =>
      (a + BDM.eye[Double](a.rows) * 1e-10) \ b
    }
  }

  /** sklearn BayesianRidge: evidence maximization on the
    * eigendecomposition of the centered Gram; hyperpriors 1e-6. */
  def bayesianRidge(g: GramStats, maxIter: Int, tol: Double): (Array[Double], Double) = {
    val (xtx, xty, ytyC) = g.centered
    val p = g.p
    val n = g.n.toDouble
    val es = breeze.linalg.eigSym(xtx)
    val eig = es.eigenvalues // ascending
    val v = es.eigenvectors
    val vtXty = v.t * xty
    val (a1, a2, l1, l2) = (1e-6, 1e-6, 1e-6, 1e-6)
    var alphaN = { val vy = ytyC / math.max(n - 1.0, 1.0); if (vy > 0) 1.0 / vy else 1.0 }
    var lambdaW = 1.0
    var coef = BDV.zeros[Double](p)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // coef = alpha (lambda I + alpha XtX)^-1 Xty via eigenbasis
      val scaled = BDV.tabulate(p)(i => vtXty(i) * alphaN / (lambdaW + alphaN * eig(i)))
      val newCoef = v * scaled
      val gamma = (0 until p).map(i => alphaN * eig(i) / (lambdaW + alphaN * eig(i))).sum
      val rss = ytyC - 2.0 * (newCoef dot xty) + (newCoef dot (xtx * newCoef))
      lambdaW = (gamma + 2.0 * l1) / ((newCoef dot newCoef) + 2.0 * l2)
      alphaN = (n - gamma + 2.0 * a1) / (math.max(rss, 1e-300) + 2.0 * a2)
      converged = breeze.linalg.sum(breeze.numerics.abs(newCoef - coef)) < tol
      coef = newCoef
      iter += 1
    }
    (coef.toArray, g.yMean - (coef dot g.xMean))
  }

  /** sklearn ARDRegression: per-feature precision, prune at 1e4. */
  def ard(g: GramStats, maxIter: Int, tol: Double): (Array[Double], Double) = {
    val (xtx, xty, ytyC) = g.centered
    val p = g.p
    val n = g.n.toDouble
    val thresholdLambda = 1e4
    val (a1, a2, l1, l2) = (1e-6, 1e-6, 1e-6, 1e-6)
    var alphaN = { val vy = ytyC / math.max(n - 1.0, 1.0); if (vy > 0) 1.0 / vy else 1.0 }
    val lambdaW = BDV.fill(p)(1.0)
    var coef = BDV.zeros[Double](p)
    var keep = Array.fill(p)(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val act = (0 until p).filter(keep)
      val k = act.length
      if (k == 0) { converged = true }
      else {
        val xtxA = BDM.tabulate(k, k)((i, j) => xtx(act(i), act(j)))
        val xtyA = BDV.tabulate(k)(i => xty(act(i)))
        val prec = xtxA * alphaN + breeze.linalg.diag(BDV.tabulate(k)(i => lambdaW(act(i))))
        val sigma = breeze.linalg.inv(prec)
        val mean = sigma * xtyA * alphaN
        val newCoef = BDV.zeros[Double](p)
        act.zipWithIndex.foreach { case (j, i) => newCoef(j) = mean(i) }
        val gammaI = act.indices.map(i => 1.0 - lambdaW(act(i)) * sigma(i, i))
        act.zipWithIndex.foreach { case (j, i) =>
          lambdaW(j) = (gammaI(i) + 2.0 * l1) / (mean(i) * mean(i) + 2.0 * l2)
        }
        val rss = ytyC - 2.0 * (newCoef dot xty) + (newCoef dot (xtx * newCoef))
        alphaN = (n - gammaI.sum + 2.0 * a1) / (math.max(rss, 1e-300) + 2.0 * a2)
        keep = (0 until p).map(j => keep(j) && lambdaW(j) < thresholdLambda).toArray
        converged = breeze.linalg.sum(breeze.numerics.abs(newCoef - coef)) < tol
        coef = newCoef
      }
      iter += 1
    }
    (coef.toArray, g.yMean - (coef dot g.xMean))
  }

  /** Exact Gram-OMP: greedy max |residual correlation|, exact LS refit
    * on the active set each step. */
  def omp(g: GramStats, k: Int): (Array[Double], Double) = {
    val (xtx, xty, _) = g.centered
    val p = g.p
    val active = scala.collection.mutable.ArrayBuffer.empty[Int]
    var coef = BDV.zeros[Double](p)
    def result = (coef.toArray, g.yMean - (coef dot g.xMean))
    while (active.length < math.min(k, p)) {
      val resid = xty - xtx * coef
      val cands = (0 until p).filterNot(active.contains)
      if (cands.isEmpty) return result
      val j = cands.maxBy(i => math.abs(resid(i)))
      if (math.abs(resid(j)) < 1e-12) return result // residual exhausted
      active += j
      val a = active.toIndexedSeq
      val sub = BDM.tabulate(a.length, a.length)((x, y) => xtx(a(x), a(y)))
      val rhs = BDV.tabulate(a.length)(x => xty(a(x)))
      val sol = solve(sub, rhs)
      coef = BDV.zeros[Double](p)
      a.zipWithIndex.foreach { case (jj, i) => coef(jj) = sol(i) }
    }
    result
  }

  /** LARS path on the centered Gram; `lasso` adds the sign-crossing
    * drop rule (LassoLars), stopping when max|corr|/n <= alphaStop. */
  def lars(g: GramStats, kMax: Int, alphaStop: Double, lasso: Boolean): (Array[Double], Double) = {
    val (xtx, xty, _) = g.centered
    val p = g.p
    val n = g.n.toDouble
    var beta = BDV.zeros[Double](p)
    var active = Vector.empty[Int]
    var iter = 0
    val maxSteps = 8 * p + 8
    var done = false
    while (!done && iter < maxSteps) {
      val c = xty - xtx * beta
      val inactive = (0 until p).filterNot(active.contains)
      val cMax = if (inactive.isEmpty) 0.0 else inactive.map(j => math.abs(c(j))).max
      val cMaxAll = (0 until p).map(j => math.abs(c(j))).foldLeft(0.0)(math.max)
      if (cMaxAll / n <= alphaStop + 1e-12 || active.length >= math.min(kMax, p)) done = true
      else {
        if (inactive.nonEmpty && cMax >= active.map(j => math.abs(c(j))).foldLeft(0.0)(math.max) - 1e-9) {
          val j = inactive.maxBy(i => math.abs(c(i)))
          if (!active.contains(j)) active = active :+ j
        }
        val a = active
        val s = BDV.tabulate(a.length)(i => math.signum(c(a(i))))
        val gA = BDM.tabulate(a.length, a.length)((x, y) => xtx(a(x), a(y)))
        val gInvS = solve(gA, s)
        val aa = 1.0 / math.sqrt(math.max(s dot gInvS, 1e-300))
        val w = gInvS * aa
        // correlation drift a_j = x_j^T X_A w for all j
        val drift = BDV.zeros[Double](p)
        for (jj <- 0 until p) {
          var acc = 0.0
          for (i <- a.indices) acc += xtx(jj, a(i)) * w(i)
          drift(jj) = acc
        }
        val cMaxA = a.map(j => math.abs(c(j))).max
        var gamma = cMaxA / aa // full LS step if nothing joins
        for (jj <- 0 until p if !a.contains(jj)) {
          val d1 = (cMaxA - c(jj)) / (aa - drift(jj))
          val d2 = (cMaxA + c(jj)) / (aa + drift(jj))
          for (d <- Seq(d1, d2) if d > 1e-12 && d < gamma) gamma = d
        }
        var dropIdx = -1
        if (lasso) {
          for (i <- a.indices) {
            val d = -beta(a(i)) / w(i)
            if (d > 1e-12 && d < gamma) { gamma = d; dropIdx = i }
          }
        }
        for (i <- a.indices) beta(a(i)) += gamma * w(i)
        if (dropIdx >= 0) {
          beta(a(dropIdx)) = 0.0
          active = active.patch(dropIdx, Nil, 1)
        }
        iter += 1
      }
    }
    (beta.toArray, g.yMean - (beta dot g.xMean))
  }

  /** Seeded subset machinery shared by RANSAC and Theil–Sen: a bounded
    * driver-side pool (nTrials·size rows from a seeded sample) and a
    * per-trial shuffle-draw WITHOUT replacement over it — consecutive
    * modulo chunks would alias trials into near-duplicate candidate
    * models once the pool is smaller than nTrials·size. */
  private def seededPool(data: org.apache.spark.sql.DataFrame, nTrials: Int,
      size: Int, seed: Long): Array[(Vector, Double)] =
    data.sample(withReplacement = false,
        math.min(1.0, (nTrials * size * 20.0) / math.max(data.count(), 1L)), seed)
      .limit(nTrials * size).collect()
      .map(r => (r.getAs[Vector](0), r.getDouble(1)))

  private def seededDraw(pool: Array[(Vector, Double)], size: Int,
      seed: Long, t: Int): Seq[(Vector, Double)] = {
    val rnd = new scala.util.Random(seed * 7919 + t)
    rnd.shuffle(pool.indices.toVector).take(size).map(pool)
  }

  /** RANSAC: sklearn's trial scheme with ALL candidate models' inlier
    * counts computed in ONE distributed pass; final exact refit on the
    * winning consensus set (a filtered Gram pass). Residual threshold =
    * MAD of y (sklearn default). */
  def ransac(ds: Dataset[_], featuresCol: String, labelCol: String,
      trials: Int, seed: Long): (Array[Double], Double) = {
    import org.apache.spark.sql.functions.{abs => sabs, col, lit}
    val data = ds.select(col(featuresCol), col(labelCol).cast("double")).na.drop().cache()
    val p = Gram.featureDim(data, featuresCol)
    val minSamples = p + 1
    // residual_threshold: MAD of y via the distributed exact median
    val yDf = data.select(col(labelCol).cast("double").as("y"))
    val med = Stats.exactPercentiles(yDf, "y", Seq(0.5)).head
    val madDf = yDf.select(sabs(col("y") - lit(med)).as("d"))
    // floor the MAD threshold RELATIVE to the label scale: constant y
    // gives MAD = 0, but fitLocal's 1e-10 ridge jitter leaves exact
    // fits with ~1e-10 residuals — a bare 1e-12 floor would then count
    // ZERO inliers and crash the consensus refit on a trivially
    // fittable dataset (sklearn fits it: exact minimal solves give
    // residual 0 <= 0)
    val thr = math.max(Stats.exactPercentiles(madDf, "d", Seq(0.5)).head,
      1e-9 * (1.0 + math.abs(med)))
    // seeded driver-side pool: trials × minSamples rows is O(trials·p)
    val pool = seededPool(data, trials, minSamples, seed)
    require(pool.length >= minSamples, "RANSAC needs at least p+1 rows")
    val candidates = (0 until trials).flatMap { t =>
      fitLocal(seededDraw(pool, minSamples, seed, t), p)
    }
    require(candidates.nonEmpty, "RANSAC: no trial produced a solvable model")
    // one pass: inlier count per candidate
    val bc = data.sparkSession.sparkContext.broadcast(candidates.toArray)
    val counts = data.rdd.map { case Row(f: Vector, y: Double) =>
      val cs = bc.value
      val arr = new Array[Long](cs.length)
      var i = 0
      while (i < cs.length) {
        val (w, b) = cs(i)
        var pred = b
        f.foreachActive((j, v) => pred += w(j) * v)
        if (math.abs(y - pred) <= thr) arr(i) = 1L
        i += 1
      }
      arr
    }.treeReduce { (x, y) =>
      var i = 0; while (i < x.length) { x(i) += y(i); i += 1 }; x
    }
    val best = counts.indices.maxBy(counts)
    val (bw, bb) = candidates(best)
    // exact refit on the consensus set: filtered distributed Gram pass
    val bwB = data.sparkSession.sparkContext.broadcast((bw, bb))
    val inliers = data.rdd.map { case Row(f: Vector, y: Double) => (f, y) }
      .filter { case (f, y) =>
        val (w, b) = bwB.value
        var pred = b
        f.foreachActive((j, v) => pred += w(j) * v)
        math.abs(y - pred) <= thr
      }
    val g = Gram.compute(inliers, p)
    val (xtx, xty, _) = g.centered
    val coef = solve(xtx, xty)
    data.unpersist()
    (coef.toArray, g.yMean - (coef dot g.xMean))
  }

  /** sklearn TheilSenRegressor scheme: seeded bounded subsets of size
    * p+1, local exact solves, spatial median (Weiszfeld). The subset
    * pool is O(maxSubpopulation · p) rows collected driver-side — the
    * same subsampling sklearn itself performs at scale. */
  def theilSen(ds: Dataset[_], featuresCol: String, labelCol: String,
      maxSub: Int, maxIter: Int, tol: Double, seed: Long): (Array[Double], Double) = {
    import org.apache.spark.sql.functions.col
    val data = ds.select(col(featuresCol), col(labelCol).cast("double")).na.drop()
    val p = Gram.featureDim(data, featuresCol)
    val size = p + 1
    // honor the caller's budget: maxSubpopulation IS the cap (sklearn
    // semantics) — the old hard min(maxSub, 500) silently halved the
    // shipped default of 1000 and made larger settings dead knobs
    val nSubsets = math.max(1, maxSub)
    val pool = seededPool(data, nSubsets, size, seed)
    require(pool.length >= size, "theil_sen needs at least p+1 rows")
    val sols = (0 until nSubsets).flatMap { t =>
      fitLocal(seededDraw(pool, size, seed, t), p)
        .map { case (w, b) => BDV(w :+ b) }
    }
    require(sols.nonEmpty, "theil_sen: no subset produced a solvable model")
    // Weiszfeld spatial median over the (p+1)-dim solutions
    var m = sols.reduce(_ + _) / sols.length.toDouble
    var it = 0
    var moved = true
    while (it < maxIter && moved) {
      var num = BDV.zeros[Double](p + 1)
      var den = 0.0
      sols.foreach { s =>
        val d = math.max(breeze.linalg.norm(s - m), 1e-12)
        num += s / d
        den += 1.0 / d
      }
      val next = num / den
      moved = breeze.linalg.norm(next - m) > tol
      m = next
      it += 1
    }
    (m(0 until p).toArray, m(p))
  }

  /** EXACT quantile regression — the LP sklearn's QuantileRegressor
    * hands to linprog, solved here by a dense primal simplex:
    *
    *   min Σᵢ [τ·rᵢ⁺ + (1−τ)·rᵢ⁻] + n·α·Σⱼ (wⱼ⁺ + wⱼ⁻)
    *   s.t. X(w⁺−w⁻) + (b⁺−b⁻) + r⁺ − r⁻ = y,   all vars ≥ 0
    *
    * (sklearn minimizes MEAN pinball + α·‖w‖₁, so the unscaled LP
    * carries n·α; the intercept split b⁺−b⁻ is unpenalized, matching
    * sklearn.) The residual splits give a FREE initial basis — negate
    * rows with negative y and the r column of the matching sign is an
    * identity column — so no phase-1 is needed. Pivoting is Dantzig
    * for speed with a switch to Bland's rule after 5n pivots, which
    * guarantees termination on degenerate vertices. O(n·(n+p)) per
    * pivot, O(n) pivots typical → driver-side under a hard row cap
    * with the guard-and-route refusal naming the IRLS scale path.
    * The optimum is a basic solution: at most p+1 nonzero residual
    * splits are zero ⇒ the fitted plane interpolates ≥ p+1 points,
    * the classic quantile-regression vertex property QuantileSpec
    * pins along with the subgradient count condition. */
  def quantileExactLp(ds: Dataset[_], featuresCol: String, labelCol: String,
      tau: Double, alpha: Double, cap: Int): (Array[Double], Double) = {
    import org.apache.spark.sql.functions.col
    require(tau > 0 && tau < 1, s"quantile must be in (0,1): $tau")
    val rows = ds.select(col(featuresCol), col(labelCol).cast("double")).na.drop()
      .limit(cap + 1).collect()
      .map { case Row(f: Vector, y: Double) => (f.toArray, y) }
    require(rows.nonEmpty, "cannot fit on an empty dataset")
    require(rows.length <= cap,
      s"exact quantile regression is an O(n²)-per-pivot simplex LP solve " +
        s"(${rows.length} rows > $cap cap); drop the exact=true hyperparam " +
        "to use the IRLS approximation, which is the distributed scale path")
    val n = rows.length
    val p = rows.head._1.length
    // column layout: [0,p) w+, [p,2p) w-, 2p b+, 2p+1 b-,
    // [2p+2, 2p+2+n) r+, [2p+2+n, 2p+2+2n) r-
    val off = 2 * p + 2
    val nv = off + 2 * n
    val t = Array.ofDim[Double](n, nv + 1) // +1: RHS
    val basis = new Array[Int](n)
    var i = 0
    while (i < n) {
      val (x, y) = rows(i)
      val sgn = if (y >= 0) 1.0 else -1.0
      var j = 0
      while (j < p) { t(i)(j) = sgn * x(j); t(i)(p + j) = -sgn * x(j); j += 1 }
      t(i)(2 * p) = sgn; t(i)(2 * p + 1) = -sgn
      t(i)(off + i) = sgn           // r+ → identity column when y ≥ 0
      t(i)(off + n + i) = -sgn      // r- → identity column when y < 0
      t(i)(nv) = sgn * y            // RHS ≥ 0: a feasible start
      basis(i) = if (y >= 0) off + i else off + n + i
      i += 1
    }
    val c = new Array[Double](nv)
    var j = 0
    while (j < 2 * p) { c(j) = n * alpha; j += 1 } // L1 on coefficients only
    i = 0
    while (i < n) { c(off + i) = tau; c(off + n + i) = 1.0 - tau; i += 1 }
    // canonical cost row: c minus the basic costs times their rows
    val z = c.clone()
    val zRhs = Array(0.0)
    i = 0
    while (i < n) {
      val cb = c(basis(i))
      if (cb != 0.0) {
        var k = 0
        while (k < nv) { z(k) -= cb * t(i)(k); k += 1 }
        zRhs(0) -= cb * t(i)(nv)
      }
      i += 1
    }
    val eps = 1e-9
    val maxPivots = math.max(20 * n, 2000)
    val blandAfter = 5 * n
    var pivots = 0
    var optimal = false
    while (pivots < maxPivots && !optimal) {
      // entering column
      var enter = -1
      if (pivots < blandAfter) { // Dantzig: most negative reduced cost
        var best = -eps
        var k = 0
        while (k < nv) { if (z(k) < best) { best = z(k); enter = k }; k += 1 }
      } else { // Bland: first negative — anti-cycling guarantee
        var k = 0
        while (k < nv && enter < 0) { if (z(k) < -eps) enter = k; k += 1 }
      }
      if (enter < 0) optimal = true
      else {
        // ratio test; ties → lowest basis index (lexicographic-ish)
        var leave = -1
        var bestRatio = Double.PositiveInfinity
        i = 0
        while (i < n) {
          val a = t(i)(enter)
          if (a > 1e-11) {
            val ratio = t(i)(nv) / a
            if (ratio < bestRatio - 1e-12 ||
                (ratio < bestRatio + 1e-12 && (leave < 0 || basis(i) < basis(leave)))) {
              bestRatio = ratio; leave = i
            }
          }
          i += 1
        }
        require(leave >= 0, "quantile LP unbounded — cannot happen: the " +
          "pinball objective is bounded below by 0")
        // pivot on (leave, enter)
        val piv = t(leave)(enter)
        var k = 0
        while (k <= nv) { t(leave)(k) /= piv; k += 1 }
        i = 0
        while (i < n) {
          if (i != leave) {
            val f = t(i)(enter)
            if (f != 0.0) {
              k = 0
              while (k <= nv) { t(i)(k) -= f * t(leave)(k); k += 1 }
            }
          }
          i += 1
        }
        val zf = z(enter)
        if (zf != 0.0) {
          k = 0
          while (k < nv) { z(k) -= zf * t(leave)(k); k += 1 }
          zRhs(0) -= zf * t(leave)(nv)
        }
        basis(leave) = enter
        pivots += 1
      }
    }
    require(optimal,
      s"quantile LP simplex failed to converge in $maxPivots pivots — " +
        "numerically degenerate input; use the IRLS path")
    val sol = new Array[Double](nv)
    i = 0
    while (i < n) { sol(basis(i)) = t(i)(nv); i += 1 }
    val w = Array.tabulate(p)(j0 => sol(j0) - sol(p + j0))
    (w, sol(2 * p) - sol(2 * p + 1))
  }

  /** Quantile regression via IRLS on the pinball loss — each iteration
    * is one distributed WEIGHTED Gram pass (w = asymmetry/max(|r|,δ));
    * flagged compat (sklearn solves the exact LP; `exact=true` opts
    * into [[quantileExactLp]] under the row cap). alpha adds the same
    * L2-on-coefficients ridge term sklearn's L1 plays for stability. */
  def quantileIrls(ds: Dataset[_], featuresCol: String, labelCol: String,
      tau: Double, alpha: Double, maxIter: Int, tol: Double): (Array[Double], Double) = {
    import org.apache.spark.sql.functions.col
    require(tau > 0 && tau < 1, s"quantile must be in (0,1): $tau")
    val cleaned = ds.select(col(featuresCol), col(labelCol).cast("double")).na.drop()
    val data = cleaned.rdd.map { case Row(f: Vector, y: Double) => (f, y) }.cache()
    val p = Gram.featureDim(cleaned, featuresCol)
    val p1 = p + 1
    val delta = 1e-6
    var wv = BDV.zeros[Double](p1) // [coef, intercept]
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val bc = data.context.broadcast(wv.toArray)
      val zero = (new Array[Double](p1 * p1), new Array[Double](p1))
      val (aFlat, bArr) = data.treeAggregate(zero)(
        seqOp = { case ((a, bv), (x, y)) =>
          val cur = bc.value
          val xa = new Array[Double](p1)
          x.foreachActive((i, v) => xa(i) = v)
          xa(p) = 1.0
          var pred = 0.0
          var i = 0
          while (i < p1) { pred += cur(i) * xa(i); i += 1 }
          val r = y - pred
          val wt = (if (r >= 0) tau else 1.0 - tau) / math.max(math.abs(r), delta)
          i = 0
          while (i < p1) {
            val xi = xa(i) * wt
            if (xi != 0.0) {
              var j = 0
              while (j < p1) { a(i * p1 + j) += xi * xa(j); j += 1 }
              bv(i) += xi * y
            }
            i += 1
          }
          (a, bv)
        },
        combOp = { case ((a1, b1), (a2, b2)) =>
          var i = 0; while (i < a1.length) { a1(i) += a2(i); i += 1 }
          i = 0; while (i < b1.length) { b1(i) += b2(i); i += 1 }
          (a1, b1)
        })
      val ridge = BDM.eye[Double](p1) * alpha
      ridge(p, p) = 0.0 // sklearn's QuantileRegressor never penalizes the intercept
      val a = new BDM(p1, p1, aFlat) + ridge
      val next = solve(a, new BDV(bArr))
      converged = breeze.linalg.norm(next - wv) < tol
      wv = next
      iter += 1
    }
    data.unpersist()
    (wv(0 until p).toArray, wv(p))
  }

  /** Passive-aggressive (PA-II): partition-local sequential updates,
    * row-count-weighted average across partitions — the standard
    * distributed analogue of an online learner; flagged compat. */
  def passiveAggressive(ds: Dataset[_], featuresCol: String, labelCol: String,
      c: Double, eps: Double, binary: Boolean): (Array[Double], Double) = {
    import org.apache.spark.sql.functions.col
    val data = ds.select(col(featuresCol), col(labelCol).cast("double")).na.drop()
    if (binary) {
      val labels = data.select(col(labelCol).cast("double")).distinct()
        .limit(3).collect().map(_.getDouble(0)).toSet
      require(labels.subsetOf(Set(0.0, 1.0)),
        s"passive_aggressive classification is binary (labels {0,1}); got " +
          s"${labels.toSeq.sorted.mkString(", ")} — one-vs-rest is not implemented")
    }
    val p = Gram.featureDim(data, featuresCol)
    val p1 = p + 1
    val parts = data.rdd.map { case Row(f: Vector, y: Double) => (f, y) }
      .mapPartitions { it =>
        val w = new Array[Double](p1)
        var n = 0L
        it.foreach { case (x, y0) =>
          val y = if (binary) { if (y0 > 0.5) 1.0 else -1.0 } else y0
          val xa = new Array[Double](p1)
          x.foreachActive((i, v) => xa(i) = v)
          xa(p) = 1.0
          var pred = 0.0
          var i = 0
          while (i < p1) { pred += w(i) * xa(i); i += 1 }
          // feature-only sqnorm, same convention as the sequential path
          var nrm = 0.0
          i = 0
          while (i < p) { nrm += xa(i) * xa(i); i += 1 }
          val (loss, sign) =
            if (binary) (math.max(0.0, 1.0 - y * pred), y)
            else {
              val r = y - pred
              (math.max(0.0, math.abs(r) - eps), math.signum(r))
            }
          if (loss > 0) {
            val step = loss / (nrm + 1.0 / (2.0 * c))
            i = 0
            while (i < p1) { w(i) += step * sign * xa(i); i += 1 }
          }
          n += 1
        }
        if (n == 0) Iterator.empty else Iterator.single((w, n))
      }.collect()
    require(parts.nonEmpty, "cannot fit on an empty dataset")
    val total = parts.map(_._2).sum.toDouble
    val avg = new Array[Double](p1)
    parts.foreach { case (w, n) =>
      var i = 0
      while (i < p1) { avg(i) += w(i) * n / total; i += 1 }
    }
    (avg.take(p), avg(p))
  }

  /** The TRUE sequential PA-II scheme (Crammer et al. 2006; sklearn's
    * PassiveAggressive{Classifier,Regressor}): one weight vector,
    * per-row updates in a seeded per-epoch shuffle order, sklearn's
    * no-improvement early stopping (stop after `nIterNoChange=5`
    * consecutive epochs whose summed loss fails to beat best − tol;
    * epoch budget `maxIter`). Order-dependent by nature, so it is
    * inherently sequential — it runs DRIVER-SIDE under a hard row cap
    * and REFUSES bigger inputs, routing to the partition-averaged
    * distributed analogue (the default dispatch). RNG deviation
    * documented in the ledger: our shuffle stream, not numpy's.
    *
    * `rule`: "pa2" (PA-II step loss/(‖x‖²+1/2C)) or "perceptron"
    * (sklearn Perceptron = SGD perceptron loss, constant eta0=1: update
    * w += y·x whenever y·(w·x) ≤ 0; same shuffle + stopping scheme). */
  def passiveAggressiveSequential(ds: Dataset[_], featuresCol: String,
      labelCol: String, c: Double, eps: Double, binary: Boolean,
      maxIter: Int, tol: Double, seedV: Long, cap: Int,
      rule: String = "pa2"): (Array[Double], Double) = {
    import org.apache.spark.sql.functions.col
    val data = ds.select(col(featuresCol), col(labelCol).cast("double")).na.drop()
    val rows = data.limit(cap + 1).collect()
      .map { case Row(f: Vector, y: Double) => (f, y) }
    require(rows.nonEmpty, "cannot fit on an empty dataset")
    val route =
      if (rule == "perceptron") "the distributed logistic stand-in (compat=logistic)"
      else "the partition-averaged distributed analogue"
    require(rows.length <= cap,
      s"exact ${if (rule == "perceptron") "perceptron" else "passive_aggressive"} " +
        s"is a SEQUENTIAL online fit (${rows.length} rows > $cap cap); drop " +
        s"the exact=true hyperparam to use $route, which is the scale path")
    if (binary) {
      val labels = rows.map(_._2).distinct.toSet
      require(labels.subsetOf(Set(0.0, 1.0)),
        s"passive_aggressive classification is binary (labels {0,1}); got " +
          s"${labels.toSeq.sorted.mkString(", ")} — one-vs-rest is not implemented")
    }
    val p = rows.head._1.size
    val p1 = p + 1
    // densify once: the epoch loop must not re-walk sparse structures
    val xs = rows.map { case (x, _) =>
      val xa = new Array[Double](p1)
      x.foreachActive((i, v) => xa(i) = v)
      xa(p) = 1.0
      xa
    }
    val ys = rows.map { case (_, y0) =>
      if (binary) { if (y0 > 0.5) 1.0 else -1.0 } else y0
    }
    // FEATURE-only squared norm (excludes the bias slot): sklearn's PA
    // step uses sqnorm(x) over features and applies the same step to
    // the intercept — including the constant 1 in the denominator
    // would shrink every update and break scheme-exactness
    val nrms = xs.map { xa =>
      var s = 0.0; var i = 0
      while (i < p) { s += xa(i) * xa(i); i += 1 }
      s
    }
    val w = new Array[Double](p1)
    val rnd = new scala.util.Random(seedV)
    val order = Array.range(0, rows.length)
    var best = Double.PositiveInfinity
    var noChange = 0
    var epoch = 0
    while (epoch < maxIter && noChange < 5) {
      // Fisher–Yates with the seeded stream — sklearn shuffles per epoch
      var i = order.length - 1
      while (i > 0) {
        val j = rnd.nextInt(i + 1)
        val t = order(i); order(i) = order(j); order(j) = t
        i -= 1
      }
      var epochLoss = 0.0
      var t = 0
      while (t < order.length) {
        val r = order(t)
        val xa = xs(r); val y = ys(r)
        var pred = 0.0
        var k = 0
        while (k < p1) { pred += w(k) * xa(k); k += 1 }
        if (rule == "perceptron") {
          // update on any non-positive margin (the classic rule counts
          // a zero-margin point as a mistake); tracked loss is SGD's
          // perceptron loss max(0, −y·pred)
          if (y * pred <= 0) {
            k = 0
            while (k < p1) { w(k) += y * xa(k); k += 1 }
          }
          epochLoss += math.max(0.0, -y * pred)
        } else {
          val (loss, sign) =
            if (binary) (math.max(0.0, 1.0 - y * pred), y)
            else {
              val d = y - pred
              (math.max(0.0, math.abs(d) - eps), math.signum(d))
            }
          if (loss > 0) {
            val step = loss / (nrms(r) + 1.0 / (2.0 * c)) // PA-II
            k = 0
            while (k < p1) { w(k) += step * sign * xa(k); k += 1 }
          }
          epochLoss += loss
        }
        t += 1
      }
      // sklearn's no-improvement threshold scales with n: the epoch's
      // SUMMED loss must beat best − tol·n_samples (tol is per-sample)
      if (epochLoss > best - tol * order.length) noChange += 1 else noChange = 0
      if (epochLoss < best) best = epochLoss
      epoch += 1
    }
    (w.take(p), w(p))
  }

  /** Exact local LS on a tiny row set (RANSAC minimal samples /
    * Theil–Sen subsets); None when singular. */
  private def fitLocal(rows: Seq[(Vector, Double)], p: Int): Option[(Array[Double], Double)] = {
    val k = rows.length
    val a = BDM.zeros[Double](k, p + 1)
    val b = BDV.zeros[Double](k)
    rows.zipWithIndex.foreach { case ((x, y), i) =>
      x.foreachActive((j, v) => a(i, j) = v)
      a(i, p) = 1.0
      b(i) = y
    }
    try {
      val sol = (a.t * a + BDM.eye[Double](p + 1) * 1e-10) \ (a.t * b)
      Some((sol(0 until p).toArray, sol(p)))
    } catch { case _: Exception => None }
  }
}
