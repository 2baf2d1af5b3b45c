package graft.ml

import org.apache.spark.ml.{PredictionModel, Predictor}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.{BooleanParam, DoubleArrayParam, DoubleParam, IntParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** EXACT kernel SVMs (`sklearn.svm.SVC` / `sklearn.svm.SVR`, the
  * reference's rbf-default `svm` dispatch — `linfa.rs:241-328`) via the
  * generalized SMO dual solver both of them share:
  *
  *   minimize ½·αᵀQα + pᵀα   s.t.  yᵀα = 0,  0 ≤ αₜ ≤ C
  *
  * with maximal-violating-pair working-set selection (Keerthi et al.;
  * the LIBSVM core loop). C-SVC is (Q = yᵢyⱼK, p = −1); ε-SVR is the
  * 2n-variable form (Q = [[K,−K],[−K,K]], pₜ = ε∓yₜ, yₜ = ±1). One
  * solver, both losses, deterministic (no working-set randomness).
  *
  * Scale position, per the guard-and-route convention (same as
  * [[KernelRidge]]): the Gram matrix is O(n²) memory and SMO O(n²·iters)
  * compute with no distributed formulation, so the exact solve runs
  * driver-side under a hard row cap and REFUSES bigger inputs, routing
  * to the RFF approximation (the default `svm` dispatch). Prediction is
  * distributed as usual — support vectors + dual coefficients ride in
  * the persisted model, scoring is one k(x, Xᵢ) pass per row.
  * Opt in from `train` with hyperparam `exact = true`.
  *
  * The ν-parameterized machines (`NuSVC` / `NuSVR`, Schölkopf) solve
  * through [[SmoSolver.solveNu]] — the same dual with a SECOND equality
  * constraint eᵀα = ν-mass, maintained by restricting working pairs to
  * one y-class (LIBSVM's Solver_NU). ν-SVC rescales the machine by 1/ρ
  * post-solve so the decision matches the C-SVC form; ν-SVR's tube
  * width is the variable the constraint trades against. The ν-property
  * (ν lower-bounds the support-vector fraction and upper-bounds the
  * margin-error fraction) is the behavioral contract SvmSpec pins.
  *
  * Documented deviations from sklearn: binary classification only (no
  * one-vs-one multiclass stack); default gamma is 1/p (sklearn's
  * "scale" additionally divides by Var(X)).
  */
object SmoSolver {
  final case class Solution(alpha: Array[Double], rho: Double, iters: Int,
      violation: Double)

  /** Solves min ½αᵀQα + pᵀα, yᵀα = 0, 0 ≤ αₜ ≤ c. `qRow(t)` returns row
    * t of Q (called O(1) times per iteration; cache K rows upstream).
    * Stops when the maximal KKT violation drops to `tol` (LIBSVM's
    * stopping rule) or at `maxIter` pair updates. */
  def solve(n: Int, qRow: Int => Array[Double], p: Array[Double],
      y: Array[Double], c: Double, tol: Double = 1e-3,
      maxIter: Int = 200000): Solution = {
    val a = new Array[Double](n)
    val g = p.clone() // gradient of the dual objective at α = 0
    var it = 0
    var viol = Double.PositiveInfinity
    val tau = 1e-12
    while (it < maxIter) {
      // maximal violating pair: i ∈ I_up maximizing −yG, j ∈ I_low minimizing
      var i = -1; var j = -1
      var gmax = Double.NegativeInfinity; var gmin = Double.PositiveInfinity
      var t = 0
      while (t < n) {
        val up = (y(t) > 0 && a(t) < c) || (y(t) < 0 && a(t) > 0)
        val lo = (y(t) > 0 && a(t) > 0) || (y(t) < 0 && a(t) < c)
        val v = -y(t) * g(t)
        if (up && v > gmax) { gmax = v; i = t }
        if (lo && v < gmin) { gmin = v; j = t }
        t += 1
      }
      viol = gmax - gmin
      if (i < 0 || j < 0 || viol <= tol) return Solution(a, rho(n, a, g, y, c), it, viol)
      val qi = qRow(i); val qj = qRow(j)
      // move along d = yᵢeᵢ − yⱼeⱼ (keeps yᵀα): t* = −d᙭g / d᙭Qd, boxed
      val quad = math.max(qi(i) + qj(j) - 2.0 * y(i) * y(j) * qi(j), tau)
      var step = (y(j) * g(j) - y(i) * g(i)) / quad
      // box: 0 ≤ aᵢ + yᵢ·step ≤ c and 0 ≤ aⱼ − yⱼ·step ≤ c
      val loI = if (y(i) > 0) -a(i) else a(i) - c
      val hiI = if (y(i) > 0) c - a(i) else a(i)
      val loJ = if (y(j) > 0) a(j) - c else -a(j)
      val hiJ = if (y(j) > 0) a(j) else c - a(j)
      val lo = math.max(loI, loJ); val hi = math.min(hiI, hiJ)
      step = math.min(math.max(step, lo), hi)
      a(i) += y(i) * step
      a(j) -= y(j) * step
      var k = 0
      while (k < n) { g(k) += step * (y(i) * qi(k) - y(j) * qj(k)); k += 1 }
      it += 1
    }
    Solution(a, rho(n, a, g, y, c), it, viol)
  }

  /** The ν-parameterized solver (LIBSVM's Solver_NU shape): same dual
    * but with a SECOND equality constraint eᵀα = const, maintained by
    * restricting working pairs to the SAME y-class — a within-class
    * move α ± t·(eᵢ − eⱼ) preserves both yᵀα and eᵀα. `a0` must be a
    * feasible start (the caller distributes the ν-mass per class).
    * Returns (alpha, r where rPos/rNeg are the per-class free-SV
    * averages of G — the caller derives rho and the bias from them). */
  final case class NuSolution(alpha: Array[Double], rPos: Double, rNeg: Double,
      iters: Int, violation: Double)

  def solveNu(n: Int, qRow: Int => Array[Double], p: Array[Double],
      y: Array[Double], c: Double, a0: Array[Double], tol: Double = 1e-3,
      maxIter: Int = 200000): NuSolution = {
    val a = a0.clone()
    // g = p + Qα at the feasible start — one O(n²) pass
    val g = p.clone()
    var t0 = 0
    while (t0 < n) {
      if (a(t0) != 0.0) {
        val q = qRow(t0)
        var u = 0
        while (u < n) { g(u) += a(t0) * q(u); u += 1 }
      }
      t0 += 1
    }
    var it = 0
    var viol = Double.PositiveInfinity
    val tau = 1e-12
    while (it < maxIter) {
      // per class: i (can grow) minimizing g, j (can shrink) maximizing g
      var iP = -1; var jP = -1; var iN = -1; var jN = -1
      var gminP = Double.PositiveInfinity; var gmaxP = Double.NegativeInfinity
      var gminN = Double.PositiveInfinity; var gmaxN = Double.NegativeInfinity
      var t = 0
      while (t < n) {
        if (y(t) > 0) {
          if (a(t) < c && g(t) < gminP) { gminP = g(t); iP = t }
          if (a(t) > 0 && g(t) > gmaxP) { gmaxP = g(t); jP = t }
        } else {
          if (a(t) < c && g(t) < gminN) { gminN = g(t); iN = t }
          if (a(t) > 0 && g(t) > gmaxN) { gmaxN = g(t); jN = t }
        }
        t += 1
      }
      val vP = if (iP >= 0 && jP >= 0) gmaxP - gminP else Double.NegativeInfinity
      val vN = if (iN >= 0 && jN >= 0) gmaxN - gminN else Double.NegativeInfinity
      viol = math.max(vP, vN)
      if (viol <= tol)
        return NuSolution(a, freeAvg(n, a, g, y, c, 1.0),
          freeAvg(n, a, g, y, c, -1.0), it, viol)
      val (i, j) = if (vP >= vN) (iP, jP) else (iN, jN)
      val qi = qRow(i); val qj = qRow(j)
      val quad = math.max(qi(i) + qj(j) - 2.0 * qi(j), tau)
      var step = (g(j) - g(i)) / quad // descend along eᵢ − eⱼ
      step = math.min(step, math.min(c - a(i), a(j)))
      a(i) += step; a(j) -= step
      var k = 0
      while (k < n) { g(k) += step * (qi(k) - qj(k)); k += 1 }
      it += 1
    }
    NuSolution(a, freeAvg(n, a, g, y, c, 1.0), freeAvg(n, a, g, y, c, -1.0),
      it, viol)
  }

  /** Free-SV average of G within one y-class (bound midpoint fallback). */
  private def freeAvg(n: Int, a: Array[Double], g: Array[Double],
      y: Array[Double], c: Double, cls: Double): Double = {
    var sum = 0.0; var cnt = 0
    var ub = Double.PositiveInfinity; var lb = Double.NegativeInfinity
    var t = 0
    while (t < n) {
      if (y(t) == cls) {
        if (a(t) > 0 && a(t) < c) { sum += g(t); cnt += 1 }
        else if (a(t) <= 0) ub = math.min(ub, g(t))
        else lb = math.max(lb, g(t))
      }
      t += 1
    }
    if (cnt > 0) sum / cnt
    else if (ub == Double.PositiveInfinity) lb
    else if (lb == Double.NegativeInfinity) ub
    else (ub + lb) / 2
  }

  /** LIBSVM's rho: average yₜGₜ over free vectors; bound midpoint when
    * none are free. The decision function is f(x) = Σ coefᵢ·k(xᵢ,x) − rho. */
  private def rho(n: Int, a: Array[Double], g: Array[Double], y: Array[Double],
      c: Double): Double = {
    var sum = 0.0; var cnt = 0
    var ub = Double.PositiveInfinity; var lb = Double.NegativeInfinity
    var t = 0
    while (t < n) {
      val v = y(t) * g(t)
      if (a(t) > 0 && a(t) < c) { sum += v; cnt += 1 }
      else {
        val up = (y(t) > 0 && a(t) <= 0) || (y(t) < 0 && a(t) >= c)
        if (up) ub = math.min(ub, v) else lb = math.max(lb, v)
      }
      t += 1
    }
    if (cnt > 0) sum / cnt else (ub + lb) / 2
  }
}

class GraftSvmModel(override val uid: String)
    extends PredictionModel[Vector, GraftSvmModel] with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("graftsvmm"))

  final val supportFlat = new DoubleArrayParam(this, "supportFlat",
    "support rows, row-major")
  final val dual = new DoubleArrayParam(this, "dual",
    "dual coefficients (already y-signed for SVC)")
  final val dim = new IntParam(this, "dim", "feature dimension")
  final val gammaParam = new DoubleParam(this, "gammaParam", "rbf gamma")
  final val kernelType = new Param[String](this, "kernelType", "linear | rbf")
  final val interceptParam = new DoubleParam(this, "interceptParam", "bias b = -rho")
  final val classify = new BooleanParam(this, "classify",
    "true → sign threshold to the stored class labels; false → raw value")
  final val class0 = new DoubleParam(this, "class0", "label for decision <= 0")
  final val class1 = new DoubleParam(this, "class1", "label for decision > 0")
  setDefault(kernelType -> "rbf", gammaParam -> 1.0, interceptParam -> 0.0,
    classify -> false, class0 -> 0.0, class1 -> 1.0)

  def setSupport(rows: Array[Array[Double]]): this.type = {
    set(dim, rows.head.length); set(supportFlat, rows.flatten)
  }
  def setDual(v: Array[Double]): this.type = set(dual, v)
  def setGamma(v: Double): this.type = set(gammaParam, v)
  def setKernelType(v: String): this.type = set(kernelType, v)
  def setIntercept(v: Double): this.type = set(interceptParam, v)
  def setClassify(v: Boolean): this.type = set(classify, v)
  def setClasses(c0: Double, c1: Double): this.type = {
    set(class0, c0); set(class1, c1)
  }

  override def numFeatures: Int = $(dim)

  /** Raw decision value Σᵢ coefᵢ·k(xᵢ, x) + b. */
  def decision(features: Vector): Double =
    $(interceptParam) + KernelMath.score(features.toArray, $(supportFlat),
      $(dual), $(dim), $(kernelType) == "rbf", $(gammaParam))

  override def predict(features: Vector): Double =
    if ($(classify)) { if (decision(features) > 0) $(class1) else $(class0) }
    else decision(features)

  override def copy(extra: ParamMap): GraftSvmModel = defaultCopy(extra)
}

object GraftSvmModel extends DefaultParamsReadable[GraftSvmModel]

class GraftSvm(override val uid: String)
    extends Predictor[Vector, GraftSvm, GraftSvmModel]
    with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("graftsvm"))

  final val svmTask = new Param[String](this, "svmTask", "svc | svr | nusvc | nusvr")
  final val regC = new DoubleParam(this, "regC", "box constraint C")
  final val nu = new DoubleParam(this, "nu",
    "ν ∈ (0,1]: lower-bounds the SV fraction, upper-bounds the margin-error fraction")
  final val epsilon = new DoubleParam(this, "epsilon", "SVR tube half-width")
  final val gamma = new DoubleParam(this, "gamma", "rbf gamma; <=0 derives 1/p")
  final val kernel = new Param[String](this, "kernel", "linear | rbf")
  final val tol = new DoubleParam(this, "tol", "KKT stopping tolerance")
  final val maxRows = new IntParam(this, "maxRows",
    "hard cap — the SMO dual is O(n^2) memory / O(n^2 iters) compute")
  setDefault(svmTask -> "svc", regC -> 1.0, nu -> 0.5, epsilon -> 0.1,
    gamma -> -1.0, kernel -> "rbf", tol -> 1e-3, maxRows -> 2000)

  def setSvmTask(v: String): this.type = set(svmTask, v)
  def setRegC(v: Double): this.type = set(regC, v)
  def setNu(v: Double): this.type = set(nu, v)
  def setEpsilon(v: Double): this.type = set(epsilon, v)
  def setGamma(v: Double): this.type = set(gamma, v)
  def setKernel(v: String): this.type = set(kernel, v)
  def setTol(v: Double): this.type = set(tol, v)
  def setMaxRows(v: Int): this.type = set(maxRows, v)

  override protected def train(ds: Dataset[_]): GraftSvmModel = {
    val cap = $(maxRows)
    val rows = ds.select(col($(featuresCol)), col($(labelCol)).cast("double"))
      .na.drop().limit(cap + 1).collect()
      .map { case Row(f: Vector, y: Double) => (f.toArray, y) }
    require(rows.nonEmpty, "exact svm needs at least one non-null training row")
    require(rows.length <= cap,
      s"exact svm is an O(n²) SMO dual solve (${rows.length} rows > $cap cap); " +
        "drop the exact=true hyperparam to use the RFF + linear " +
        "approximation, which is the scale path")
    val n = rows.length
    val p = rows.head._1.length
    val g = if ($(gamma) > 0) $(gamma) else 1.0 / p
    val rbf = $(kernel) match {
      case "rbf" => true
      case "linear" => false
      case other => throw new IllegalArgumentException(
        s"kernel must be linear or rbf, got '$other'")
    }
    // dense Gram, cached once; Q rows derive from K rows per task
    val km = KernelMath.gram(rows.map(_._1), rbf, g)
    val labels = rows.map(_._2)

    // Q rows build on demand into TWO rotating buffers — the solver
    // requests exactly rows i then j per iteration, so double-buffering
    // avoids memoizing an up-to-(2n)² matrix (4× the Gram) while keeping
    // each build O(n), the same order as the gradient update it feeds
    // greedy feasible start for the ν solvers: fill each class with
    // `massPerClass` total, `cap` per variable
    def nuInit(y: Array[Double], massPerClass: Double, cap: Double): Array[Double] = {
      val a = new Array[Double](y.length)
      var remP = massPerClass; var remN = massPerClass
      var t = 0
      while (t < y.length) {
        if (y(t) > 0) { val g2 = math.min(cap, remP); a(t) = g2; remP -= g2 }
        else { val g2 = math.min(cap, remN); a(t) = g2; remN -= g2 }
        t += 1
      }
      a
    }
    def rotatingRows(m: Int, fill: (Int, Array[Double]) => Unit): Int => Array[Double] = {
      val bufs = Array(new Array[Double](m), new Array[Double](m))
      var flip = 0
      t => { val b = bufs(flip); flip ^= 1; fill(t, b); b }
    }
    // shared between the classification variants: ±1 labels + the
    // binary-only policy; and between the kernel shapes: the Q-row
    // builders (Qᵢⱼ = yᵢyⱼKᵢⱼ for SVC, the 2n sign-block form for SVR)
    def binaryY(): (Array[Double], Double, Double) = {
      val classes = labels.distinct.sorted
      require(classes.length == 2,
        s"exact svm classification is binary (got ${classes.length} classes); " +
          "sklearn's one-vs-one stack is not implemented — use the RFF path")
      (labels.map(l => if (l == classes(1)) 1.0 else -1.0), classes(0), classes(1))
    }
    def svcQRow(y: Array[Double]): Int => Array[Double] =
      rotatingRows(n, (i, buf) => {
        var j = 0
        while (j < n) { buf(j) = y(i) * y(j) * km(i)(j); j += 1 }
      })
    def svrQRow(m: Int): Int => Array[Double] =
      rotatingRows(m, (t, buf) => {
        val i = t % n; val si = if (t < n) 1.0 else -1.0
        var u = 0
        while (u < m) {
          buf(u) = si * (if (u < n) 1.0 else -1.0) * km(i)(u % n); u += 1
        }
      })
    val svrY: Int => Array[Double] =
      m => Array.tabulate(m)(t => if (t < n) 1.0 else -1.0)

    var svcClasses: Option[(Double, Double)] = None
    val (coef, b, conv) = $(svmTask) match {
      case "svc" =>
        val (y, c0, c1) = binaryY()
        val sol = SmoSolver.solve(n, svcQRow(y), Array.fill(n)(-1.0), y,
          $(regC), $(tol))
        svcClasses = Some((c0, c1))
        (Array.tabulate(n)(i => y(i) * sol.alpha(i)), -sol.rho, sol)
      case "svr" =>
        // 2n-variable ε-SVR form; β = α − α* recovers the coefficients
        val m = 2 * n
        val eps = $(epsilon)
        val pv = Array.tabulate(m)(t =>
          if (t < n) eps - labels(t) else eps + labels(t - n))
        val sol = SmoSolver.solve(m, svrQRow(m), pv, svrY(m), $(regC), $(tol))
        (Array.tabulate(n)(i => sol.alpha(i) - sol.alpha(i + n)), -sol.rho, sol)
      case "nusvc" =>
        // ν-SVC: box [0,1], eᵀα = ν·l on top of yᵀα = 0 — solved with
        // within-class pairs; post-solve the machine rescales by 1/ρ so
        // the decision function matches the C-SVC form
        val v = $(nu)
        require(v > 0 && v <= 1, s"nu must be in (0,1], got $v")
        val (y, c0, c1) = binaryY()
        val mass = v * n / 2.0
        require(mass <= y.count(_ > 0) && mass <= y.count(_ < 0),
          s"specified nu=$v is infeasible: nu*l/2 = $mass exceeds a class " +
            s"count (${y.count(_ > 0)} positive / ${y.count(_ < 0)} negative)")
        val sol = SmoSolver.solveNu(n, svcQRow(y), new Array[Double](n), y, 1.0,
          nuInit(y, mass, 1.0), $(tol))
        val rho = (sol.rPos + sol.rNeg) / 2
        // sklearn/LIBSVM return the model even when heavily overlapping
        // classes drive the margin to ρ ≤ 0; rescaling by it would flip
        // or explode the decision, so keep the unscaled machine and say so
        val scale =
          if (rho > 1e-12) rho
          else {
            System.err.println(
              f"WARN GraftSvm: nu-SVC margin rho=$rho%.2e <= 0 (classes " +
                "heavily overlap at this nu) — keeping the unscaled decision")
            1.0
          }
        val bb = (sol.rNeg - sol.rPos) / 2
        svcClasses = Some((c0, c1))
        (Array.tabulate(n)(i => y(i) * sol.alpha(i) / scale), bb / scale,
          SmoSolver.Solution(sol.alpha, 0.0, sol.iters, sol.violation))
      case "nusvr" =>
        // ν-SVR: the tube width ε becomes a variable via the second
        // constraint. LIBSVM/sklearn convention (what NuSVR(C) wraps):
        // box C per variable, per-side mass C·ν·l/2 — NOT the Schölkopf
        // paper's C/l normalization
        val v = $(nu)
        require(v > 0 && v <= 1, s"nu must be in (0,1], got $v")
        val m = 2 * n
        val pv = Array.tabulate(m)(t =>
          if (t < n) -labels(t) else labels(t - n))
        val sol = SmoSolver.solveNu(m, svrQRow(m), pv, svrY(m), $(regC),
          nuInit(svrY(m), $(regC) * v * n / 2.0, $(regC)), $(tol))
        val bb = (sol.rNeg - sol.rPos) / 2
        (Array.tabulate(n)(i => sol.alpha(i) - sol.alpha(i + n)), bb,
          SmoSolver.Solution(sol.alpha, 0.0, sol.iters, sol.violation))
      case other => throw new IllegalArgumentException(
        s"svmTask must be svc, svr, nusvc, or nusvr, got '$other'")
    }
    if (conv.violation > $(tol))
      // sklearn raises ConvergenceWarning here; the model is usable but
      // NOT at the dual optimum — say so instead of claiming exactness
      System.err.println(
        f"WARN GraftSvm: SMO hit the iteration cap with KKT violation " +
          f"${conv.violation}%.2e > tol ${$(tol)}%.2e after ${conv.iters} " +
          f"updates — duals are approximate; raise tol or lower C")

    // persist only the support vectors (nonzero duals) — the whole point
    // of the sparse dual representation
    val kept = coef.indices.filter(i => math.abs(coef(i)) > 1e-12)
    val (supRows, supCoef) =
      if (kept.nonEmpty) (kept.map(rows(_)._1).toArray, kept.map(coef).toArray)
      else (Array(rows.head._1), Array(0.0)) // degenerate: constant model
    val m = new GraftSvmModel(uid + "_m")
      .setSupport(supRows).setDual(supCoef)
      .setGamma(g).setKernelType($(kernel)).setIntercept(b)
      .setClassify($(svmTask) == "svc" || $(svmTask) == "nusvc")
    svcClasses.foreach { case (c0, c1) => m.setClasses(c0, c1) }
    m.set(m.featuresCol, $(featuresCol)).set(m.predictionCol, $(predictionCol))
    m.setParent(this)
    m
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add($(predictionCol), org.apache.spark.sql.types.DoubleType)

  override def copy(extra: ParamMap): GraftSvm = defaultCopy(extra)
}

object GraftSvm extends DefaultParamsReadable[GraftSvm]
