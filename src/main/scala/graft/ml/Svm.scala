package graft.ml

import org.apache.spark.ml.{PredictionModel, Predictor}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.{BooleanParam, DoubleParam, IntParam, Param, ParamMap}
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
  * Multiclass classification runs sklearn/LIBSVM's one-vs-one stack:
  * k(k−1)/2 binary SMO solves over class-pair row subsets (one shared
  * Gram, indexed per pair), majority vote at prediction, ties broken to
  * the LOWEST class label — the same winner as sklearn's argmax over
  * sorted `classes_`. `probability=true` fits a Platt sigmoid per binary
  * machine from 5-FOLD CROSS-VALIDATED decision values (LIBSVM's
  * `svm_binary_svc_probability` scheme) with the regularized Newton fit
  * of Lin, Weng & Keerthi 2007; multiclass `predict_proba` couples the
  * pairwise sigmoids through the Wu–Lin–Weng fixed-point iteration
  * (LIBSVM's `multiclass_probability`).
  *
  * Documented deviations from sklearn: default gamma is 1/p (sklearn's
  * "scale" additionally divides by Var(X)); the Platt CV fold shuffle is
  * deterministic (fixed seed) where LIBSVM uses rand(); a CV fold whose
  * training side loses a class — or goes ν-infeasible — falls back to
  * the full machine's decision values for that fold instead of aborting.
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

/** One trained binary kernel machine: f(x) = Σᵢ dualᵢ·k(svᵢ, x) + b over
  * its own support rows (row-major flat). Classification machines carry
  * the class pair they separate (decision > 0 → `classPos`) and, when
  * trained with probability=true, the Platt sigmoid (A, B) mapping
  * decisions to P(classPos | x). Regression models hold one machine with
  * a (0, 0) class pair. */
private[graft] final case class SvmMachine(classNeg: Double, classPos: Double,
    supportFlat: Array[Double], dual: Array[Double], intercept: Double,
    plattA: Double, plattB: Double, hasPlatt: Boolean) {
  def decision(x: Array[Double], p: Int, rbf: Boolean, g: Double): Double =
    intercept + KernelMath.score(x, supportFlat, dual, p, rbf, g)
  /** P(classPos | f) through the sigmoid — the numerically stable form
    * (never exponentiates a positive argument). */
  def plattProb(dec: Double): Double = {
    val fApB = dec * plattA + plattB
    if (fApB >= 0) math.exp(-fApB) / (1.0 + math.exp(-fApB))
    else 1.0 / (1.0 + math.exp(fApB))
  }
}

/** Platt scaling (Platt 1999) via the regularized maximum-likelihood
  * Newton fit of Lin, Weng & Keerthi, "A note on Platt's probabilistic
  * outputs for support vector machines" (2007) — the published
  * pseudo-code: smoothed targets t₊ = (N₊+1)/(N₊+2), t₋ = 1/(N₋+2),
  * 2-parameter Newton with backtracking line search on the
  * cross-entropy. Runs driver-side on the (≤ row-cap) decision values
  * the exact path already holds — distributing a 2-parameter fit over
  * ≤2,000 scalars would shuffle more than it computes. */
private[ml] object Platt {
  /** Fits P(y=+1 | f) = 1/(1+exp(A·f+B)); returns (A, B). */
  def sigmoidTrain(dec: Array[Double], y: Array[Double]): (Double, Double) = {
    val l = dec.length
    var prior1 = 0.0; var prior0 = 0.0
    var i = 0
    while (i < l) { if (y(i) > 0) prior1 += 1 else prior0 += 1; i += 1 }
    val hiTarget = (prior1 + 1.0) / (prior1 + 2.0)
    val loTarget = 1.0 / (prior0 + 2.0)
    val t = Array.tabulate(l)(k => if (y(k) > 0) hiTarget else loTarget)
    val sigma = 1e-12 // Hessian ridge
    var a = 0.0
    var b = math.log((prior0 + 1.0) / (prior1 + 1.0))
    def objective(av: Double, bv: Double): Double = {
      var fval = 0.0
      var k = 0
      while (k < l) {
        val fApB = dec(k) * av + bv
        fval +=
          (if (fApB >= 0) t(k) * fApB + math.log1p(math.exp(-fApB))
           else (t(k) - 1.0) * fApB + math.log1p(math.exp(fApB)))
        k += 1
      }
      fval
    }
    var fval = objective(a, b)
    var it = 0
    var done = false
    while (it < 100 && !done) {
      var h11 = sigma; var h22 = sigma; var h21 = 0.0
      var g1 = 0.0; var g2 = 0.0
      var k = 0
      while (k < l) {
        val fApB = dec(k) * a + b
        val (p, q) =
          if (fApB >= 0) { val e = math.exp(-fApB); (e / (1.0 + e), 1.0 / (1.0 + e)) }
          else { val e = math.exp(fApB); (1.0 / (1.0 + e), e / (1.0 + e)) }
        val d2 = p * q
        h11 += dec(k) * dec(k) * d2; h22 += d2; h21 += dec(k) * d2
        val d1 = t(k) - p
        g1 += dec(k) * d1; g2 += d1
        k += 1
      }
      if (math.abs(g1) < 1e-5 && math.abs(g2) < 1e-5) done = true
      else {
        val det = h11 * h22 - h21 * h21
        val dA = -(h22 * g1 - h21 * g2) / det
        val dB = -(-h21 * g1 + h11 * g2) / det
        val gd = g1 * dA + g2 * dB
        var step = 1.0
        var stepped = false
        while (step >= 1e-10 && !stepped) {
          val na = a + step * dA; val nb = b + step * dB
          val nf = objective(na, nb)
          if (nf < fval + 1e-4 * step * gd) { a = na; b = nb; fval = nf; stepped = true }
          else step /= 2.0
        }
        if (!stepped) done = true // line search failed — accept current point
      }
      it += 1
    }
    (a, b)
  }
}

class GraftSvmModel(override val uid: String)
    extends PredictionModel[Vector, GraftSvmModel]
    with org.apache.spark.ml.util.MLWritable {
  def this() = this(Identifiable.randomUID("graftsvmm"))

  final val dim = new IntParam(this, "dim", "feature dimension")
  final val gammaParam = new DoubleParam(this, "gammaParam", "rbf gamma")
  final val kernelType = new Param[String](this, "kernelType", "linear | rbf")
  final val classify = new BooleanParam(this, "classify",
    "true → vote/threshold to the stored class labels; false → raw value")
  setDefault(kernelType -> "rbf", gammaParam -> 1.0, classify -> false)

  // Support rows + duals are the model's DATA — up to cap·p doubles per
  // machine — and persist as a compact Parquet data file (the MLWritable
  // data/ convention, the shape of LIBSVM/sklearn's SV matrix), NOT as
  // JSON array params: a 2,000×p support matrix in one JSON metadata
  // line is megabytes of decimal text and slow to parse back.
  private var machinesArr: Array[SvmMachine] = Array.empty
  // per-model constants precomputed ONCE at setMachines — the bulk
  // transform scoring loop must not rebuild label tables or allocate a
  // vote map per row
  private var labelsArr: Array[Double] = Array.empty
  private var machineNegIdx: Array[Int] = Array.empty
  private var machinePosIdx: Array[Int] = Array.empty
  private[ml] def setMachines(ms: Array[SvmMachine]): this.type = {
    machinesArr = ms
    labelsArr = ms.flatMap(m => Seq(m.classNeg, m.classPos)).distinct.sorted
    val pos = labelsArr.zipWithIndex.toMap
    machineNegIdx = ms.map(m => pos(m.classNeg))
    machinePosIdx = ms.map(m => pos(m.classPos))
    this
  }
  private[graft] def machines: Array[SvmMachine] = machinesArr

  /** Sorted distinct class labels (sklearn's `classes_`). */
  private def classLabels: Array[Double] = labelsArr

  def setDim(v: Int): this.type = set(dim, v)
  def setGamma(v: Double): this.type = set(gammaParam, v)
  def setKernelType(v: String): this.type = set(kernelType, v)
  def setClassify(v: Boolean): this.type = set(classify, v)

  override def numFeatures: Int = $(dim)
  private def rbf: Boolean = $(kernelType) == "rbf"

  // same contract as GraftLinearModel.predict: the two plan shapes
  // (UDF and bulk transform) must fail identically on a bad width
  // instead of silently scoring a prefix / throwing a raw AIOOBE
  private def checkDim(features: Vector): Unit =
    require(features.size == $(dim),
      s"quackml_predict: feature vector has ${features.size} elements, " +
        s"model expects ${$(dim)}")

  /** Raw decision value of the FIRST machine — the whole decision
    * function for regression and binary classification; multiclass
    * models have one per class pair (use [[machines]]). */
  def decision(features: Vector): Double = {
    checkDim(features)
    machinesArr.head.decision(features.toArray, $(dim), rbf, $(gammaParam))
  }

  override def predict(features: Vector): Double =
    if (!$(classify)) decision(features)
    else if (machinesArr.length == 1) {
      val m = machinesArr.head
      if (decision(features) > 0) m.classPos else m.classNeg
    } else {
      // one-vs-one majority vote; ties → lowest label, the same winner
      // as sklearn's argmax over sorted classes_ (argmax over the
      // ascending label array returns the first = lowest on ties)
      checkDim(features)
      val x = features.toArray
      val p = $(dim); val isRbf = rbf; val g = $(gammaParam)
      val votes = new Array[Int](labelsArr.length)
      var i = 0
      while (i < machinesArr.length) {
        val idx = if (machinesArr(i).decision(x, p, isRbf, g) > 0) machinePosIdx(i)
                  else machineNegIdx(i)
        votes(idx) += 1
        i += 1
      }
      var best = 0
      i = 1
      while (i < votes.length) { if (votes(i) > votes(best)) best = i; i += 1 }
      labelsArr(best)
    }

  /** Class probabilities in sorted-class order, from the stored Platt
    * sigmoids. Binary: [1−σ(f), σ(f)]. Multiclass: the pairwise
    * sigmoids r_ij = P(i | {i,j}, x) couple into one distribution via
    * Wu, Lin & Weng, "Probability Estimates for Multi-class
    * Classification by Pairwise Coupling" (JMLR 2004), their second
    * method — the fixed-point iteration sklearn/LIBSVM run
    * (`multiclass_probability`): minimize Σ (r_ji·p_i − r_ij·p_j)² on
    * the simplex. */
  def probability(features: Vector): Array[Double] = {
    require($(classify), "probability is a classification surface")
    require(machinesArr.forall(_.hasPlatt),
      "model was trained without probability=true — no Platt sigmoid stored")
    if (machinesArr.length == 1) {
      val pPos = machinesArr.head.plattProb(decision(features))
      Array(1.0 - pPos, pPos)
    } else {
      val k = labelsArr.length
      // pairwise r[i][j] = P(class i | {i, j}, x); machines store
      // P(classPos | x), classNeg < classPos in sorted-label order
      checkDim(features)
      val r = Array.fill(k, k)(0.0)
      val x = features.toArray
      val p = $(dim); val isRbf = rbf; val g = $(gammaParam)
      var m = 0
      while (m < machinesArr.length) {
        val pPos = machinesArr(m).plattProb(machinesArr(m).decision(x, p, isRbf, g))
        // clamp like LIBSVM: keep r strictly inside (0,1) so Q stays PD
        val pp = math.min(math.max(pPos, 1e-7), 1 - 1e-7)
        val i = machineNegIdx(m); val j = machinePosIdx(m)
        r(i)(j) = 1.0 - pp
        r(j)(i) = pp
        m += 1
      }
      multiclassCoupling(k, r)
    }
  }

  /** The WLW fixed-point iteration (LIBSVM's multiclass_probability):
    * Q_tt = Σ_{j≠t} r_jt², Q_tj = −r_jt·r_tj; iterate p_t updates until
    * max_t |Q p − pᵀQp|_t < 0.005/k. Deterministic, O(iters·k²). */
  private def multiclassCoupling(k: Int, r: Array[Array[Double]]): Array[Double] = {
    val q = Array.fill(k, k)(0.0)
    var t = 0
    while (t < k) {
      var j = 0
      while (j < k) {
        if (j != t) {
          q(t)(t) += r(j)(t) * r(j)(t)
          q(t)(j) = -r(j)(t) * r(t)(j)
        }
        j += 1
      }
      t += 1
    }
    val p = Array.fill(k)(1.0 / k)
    val qp = new Array[Double](k)
    val eps = 0.005 / k
    val maxIt = math.max(100, k) // LIBSVM's cap: max(100, k) iterations
    var it = 0
    var done = false
    while (it < maxIt && !done) {
      var pQp = 0.0
      var i = 0
      while (i < k) {
        qp(i) = 0.0
        var j = 0
        while (j < k) { qp(i) += q(i)(j) * p(j); j += 1 }
        pQp += p(i) * qp(i)
        i += 1
      }
      var maxErr = 0.0
      i = 0
      while (i < k) { maxErr = math.max(maxErr, math.abs(qp(i) - pQp)); i += 1 }
      if (maxErr < eps) done = true
      else {
        t = 0
        while (t < k) {
          val diff = (-qp(t) + pQp) / q(t)(t)
          p(t) += diff
          pQp = (pQp + diff * (diff * q(t)(t) + 2.0 * qp(t))) /
            ((1.0 + diff) * (1.0 + diff))
          var j = 0
          while (j < k) {
            qp(j) = (qp(j) + diff * q(t)(j)) / (1.0 + diff)
            p(j) /= (1.0 + diff)
            j += 1
          }
          t += 1
        }
      }
      it += 1
    }
    p
  }

  override def copy(extra: ParamMap): GraftSvmModel =
    defaultCopy[GraftSvmModel](extra).setMachines(machinesArr)

  override def write: org.apache.spark.ml.util.MLWriter =
    new GraftSvmModel.Writer(this)

  // set-from-JSON bridge for the reader (Params.set is protected)
  private[ml] def setParamFromJson(name: String, json: String): Unit = {
    val p = getParam(name)
    set(p.asInstanceOf[Param[Any]], p.jsonDecode(json))
  }
}

object GraftSvmModel extends org.apache.spark.ml.util.MLReadable[GraftSvmModel] {
  /** Writes metadata in the DefaultParamsWriter JSON shape (class / uid /
    * paramMap — hand-built because DefaultParamsWriter is private[ml] to
    * Spark) so Pipeline's stage loader dispatches back here, then the
    * machines as ONE Parquet data file: a row per binary machine with
    * the support matrix and duals as array columns. */
  private[ml] class Writer(instance: GraftSvmModel)
      extends org.apache.spark.ml.util.MLWriter {
    override protected def saveImpl(path: String): Unit = {
      val paramMap = instance.extractParamMap().toSeq
        .map { pp =>
          val p = pp.param.asInstanceOf[Param[Any]]
          "\"" + p.name + "\":" + p.jsonEncode(pp.value)
        }.sorted.mkString("{", ",", "}")
      val meta = s"""{"class":"${classOf[GraftSvmModel].getName}",""" +
        s""""timestamp":${System.currentTimeMillis()},""" +
        s""""sparkVersion":"${sc.version}","uid":"${instance.uid}",""" +
        s""""paramMap":$paramMap,"defaultParamMap":{}}"""
      // r21: both files are written on the driver — the replaced
      // `.repartition(1).write` pair cost two scheduled Spark jobs per
      // model save for O(model)-sized payloads (guide §1.2-1 / §5). The
      // on-disk FORMAT is unchanged (text metadata dir + parquet data
      // dir, same schema), so the reader below — and any dir written by
      // earlier rounds — is untouched; SvmSpec pins the round-trip.
      // metadata is ONE PLAIN FILE (not a part-file directory): every
      // consumer accepts it — `spark.read.text` reads single files, and
      // Spark 4's local-mode Pipeline loader (`ReadWriteUtils.loadText`
      // via `Files.read`) REQUIRES a file, which is what lets this model
      // ride inside a PipelineIO local-format save
      val spark = sparkSession
      new java.io.File(path).mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(path, "metadata").toPath, meta + "\n")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("idx",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("class_neg",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("class_pos",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("support_flat",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false)),
        org.apache.spark.sql.types.StructField("dual",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false)),
        org.apache.spark.sql.types.StructField("intercept",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("platt_a",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("platt_b",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("has_platt",
          org.apache.spark.sql.types.BooleanType, nullable = false)))
      val rows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(instance.machines.zipWithIndex.map { case (m, i) =>
          org.apache.spark.sql.Row(i, m.classNeg, m.classPos,
            m.supportFlat.toSeq, m.dual.toSeq,
            m.intercept, m.plattA, m.plattB, m.hasPlatt)
        }: _*)
      val dataDir = new java.io.File(path, "data")
      LocalParquet.appendLocalRelation(
        spark.createDataFrame(rows, schema), dataDir.getPath)
      java.nio.file.Files.write(
        new java.io.File(dataDir, "_SUCCESS").toPath, Array.emptyByteArray)
    }
  }

  private class Reader extends org.apache.spark.ml.util.MLReader[GraftSvmModel] {
    override def load(path: String): GraftSvmModel = {
      val spark = sparkSession
      val metaStr = spark.read
        .text(new org.apache.hadoop.fs.Path(path, "metadata").toString)
        .head().getString(0)
      val meta = org.json4s.jackson.JsonMethods.parse(metaStr)
      val uid = meta \ "uid" match {
        case org.json4s.JString(s) => s
        case _ => throw new IllegalArgumentException(s"no uid in $path/metadata")
      }
      val m = new GraftSvmModel(uid)
      meta \ "paramMap" match {
        case org.json4s.JObject(fields) => fields.foreach { case (name, v) =>
          if (m.hasParam(name))
            m.setParamFromJson(name, org.json4s.jackson.JsonMethods.compact(v))
        }
        case _ => ()
      }
      val dataPath = new org.apache.hadoop.fs.Path(path, "data")
      val fs = dataPath.getFileSystem(sc.hadoopConfiguration)
      if (fs.exists(dataPath)) {
        val machines = spark.read.parquet(dataPath.toString)
          .select("idx", "class_neg", "class_pos", "support_flat", "dual",
            "intercept", "platt_a", "platt_b", "has_platt")
          .collect().sortBy(_.getInt(0))
          .map(r => SvmMachine(r.getDouble(1), r.getDouble(2),
            r.getSeq[Double](3).toArray, r.getSeq[Double](4).toArray,
            r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getBoolean(8)))
        m.setMachines(machines)
      } else {
        // legacy (pre-Parquet-data) format: the single binary machine
        // rode in the metadata paramMap as DoubleArrayParams — rebuild
        // it so catalogs persisted by older builds stay loadable
        implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
        import org.json4s.jvalue2extractable
        def darr(name: String): Array[Double] =
          (meta \ "paramMap" \ name).extract[Array[Double]]
        def dbl(name: String, dflt: Double): Double =
          (meta \ "paramMap" \ name).extractOpt[Double].getOrElse(dflt)
        m.setMachines(Array(SvmMachine(
          dbl("class0", 0.0), dbl("class1", 1.0),
          darr("supportFlat"), darr("dual"), dbl("interceptParam", 0.0),
          0.0, 0.0, hasPlatt = false)))
      }
      m
    }
  }

  override def read: org.apache.spark.ml.util.MLReader[GraftSvmModel] = new Reader
  override def load(path: String): GraftSvmModel = super.load(path)
}

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
  final val probability = new BooleanParam(this, "probability",
    "fit a Platt sigmoid per binary machine from 5-fold CV decision " +
      "values (sklearn probability=True); multiclass proba couples " +
      "them pairwise (Wu-Lin-Weng)")
  setDefault(svmTask -> "svc", regC -> 1.0, nu -> 0.5, epsilon -> 0.1,
    gamma -> -1.0, kernel -> "rbf", tol -> 1e-3, maxRows -> 2000,
    probability -> false)

  def setSvmTask(v: String): this.type = set(svmTask, v)
  def setRegC(v: Double): this.type = set(regC, v)
  def setNu(v: Double): this.type = set(nu, v)
  def setEpsilon(v: Double): this.type = set(epsilon, v)
  def setGamma(v: Double): this.type = set(gamma, v)
  def setKernel(v: String): this.type = set(kernel, v)
  def setTol(v: Double): this.type = set(tol, v)
  def setMaxRows(v: Int): this.type = set(maxRows, v)
  def setProbability(v: Boolean): this.type = set(probability, v)

  override protected def train(ds: Dataset[_]): GraftSvmModel = {
    // sklearn raises ValueError on C <= 0; an unchecked C = 0 leaves
    // every alpha at both bounds, the up/low index sets empty, and the
    // solver "converges" to rho = -Inf → an infinite intercept that
    // predicts one class for every input with no warning
    require($(regC) > 0, s"C must be > 0, got ${$(regC)} (sklearn contract)")
    require($(epsilon) >= 0, s"epsilon must be >= 0, got ${$(epsilon)}")
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
    // dense Gram over ALL rows, computed once; every one-vs-one machine
    // and every Platt CV refit indexes into it (subsets included), so no
    // kernel value is ever computed twice
    val km = KernelMath.gram(rows.map(_._1), rbf, g)
    val labels = rows.map(_._2)

    def warnIfUnconverged(iters: Int, violation: Double): Unit =
      if (violation > $(tol))
        // sklearn raises ConvergenceWarning here; the model is usable but
        // NOT at the dual optimum — say so instead of claiming exactness
        System.err.println(
          f"WARN GraftSvm: SMO hit the iteration cap with KKT violation " +
            f"$violation%.2e > tol ${$(tol)}%.2e after $iters " +
            f"updates — duals are approximate; raise tol or lower C")

    // greedy feasible start for the ν solvers: fill each class with
    // `massPerClass` total, `capPer` per variable
    def nuInit(y: Array[Double], massPerClass: Double, capPer: Double): Array[Double] = {
      val a = new Array[Double](y.length)
      var remP = massPerClass; var remN = massPerClass
      var t = 0
      while (t < y.length) {
        if (y(t) > 0) { val g2 = math.min(capPer, remP); a(t) = g2; remP -= g2 }
        else { val g2 = math.min(capPer, remN); a(t) = g2; remN -= g2 }
        t += 1
      }
      a
    }
    // Q rows build on demand into TWO rotating buffers — the solver
    // requests exactly rows i then j per iteration, so double-buffering
    // avoids memoizing an up-to-(2n)² matrix while keeping each build
    // O(n), the same order as the gradient update it feeds
    def rotatingRows(m: Int, fill: (Int, Array[Double]) => Unit): Int => Array[Double] = {
      val bufs = Array(new Array[Double](m), new Array[Double](m))
      var flip = 0
      t => { val b = bufs(flip); flip ^= 1; fill(t, b); b }
    }

    /** Solves ONE binary classification machine (svc or nusvc per the
      * task param) over global row indices `idx` with ±1 labels `yOf`
      * (subset-position indexed). Returns (y-signed dual coef per subset
      * position, intercept). */
    def solveBinary(idx: Array[Int], yOf: Int => Double): (Array[Double], Double) = {
      val m = idx.length
      val y = Array.tabulate(m)(yOf)
      val qRow = rotatingRows(m, (i, buf) => {
        val gi = idx(i)
        var j = 0
        while (j < m) { buf(j) = y(i) * y(j) * km(gi)(idx(j)); j += 1 }
      })
      $(svmTask) match {
        case "svc" =>
          val sol = SmoSolver.solve(m, qRow, Array.fill(m)(-1.0), y, $(regC), $(tol))
          warnIfUnconverged(sol.iters, sol.violation)
          (Array.tabulate(m)(i => y(i) * sol.alpha(i)), -sol.rho)
        case "nusvc" =>
          // ν-SVC: box [0,1], eᵀα = ν·l on top of yᵀα = 0 — solved with
          // within-class pairs; post-solve the machine rescales by 1/ρ so
          // the decision function matches the C-SVC form
          val v = $(nu)
          require(v > 0 && v <= 1, s"nu must be in (0,1], got $v")
          val nPos = y.count(_ > 0); val nNeg = m - nPos
          val mass = v * m / 2.0
          require(mass <= nPos && mass <= nNeg,
            s"specified nu=$v is infeasible: nu*l/2 = $mass exceeds a class " +
              s"count ($nPos positive / $nNeg negative)")
          val sol = SmoSolver.solveNu(m, qRow, new Array[Double](m), y, 1.0,
            nuInit(y, mass, 1.0), $(tol))
          warnIfUnconverged(sol.iters, sol.violation)
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
          (Array.tabulate(m)(i => y(i) * sol.alpha(i) / scale), bb / scale)
        case other => throw new IllegalStateException(
          s"solveBinary called for non-classification task '$other'")
      }
    }

    // persist only the support vectors (nonzero duals) — the whole point
    // of the sparse dual representation; degenerate all-zero solutions
    // keep one row with weight 0 (constant model)
    def sparsify(idx: Array[Int], coef: Array[Double]): (Array[Double], Array[Double]) = {
      val kept = coef.indices.filter(i => math.abs(coef(i)) > 1e-12)
      if (kept.nonEmpty)
        (kept.iterator.flatMap(i => rows(idx(i))._1).toArray, kept.map(coef).toArray)
      else (rows(idx(0))._1, Array(0.0))
    }

    /** 5-fold cross-validated decision values over the subset (LIBSVM's
      * svm_binary_svc_probability scheme): each fold's machine trains on
      * the other four and scores the held-out fold through the shared
      * Gram. Degenerate folds — training side left with one class, or
      * ν-infeasible — fall back to the FULL machine's decision values
      * for those points (documented deviation: LIBSVM emits flat ±1 /
      * fails respectively). Fold shuffle is deterministic (seed 42)
      * where LIBSVM uses rand() — reproducible sigmoids. */
    def cvDecisions(idx: Array[Int], yv: Array[Double],
        fullCoef: Array[Double], fullB: Double): Array[Double] = {
      val m = idx.length
      val perm = new scala.util.Random(42).shuffle((0 until m).toVector).toArray
      val folds = math.min(5, m)
      val dec = new Array[Double](m)
      def fullDecision(t: Int): Double = {
        val gi = idx(t)
        var s = fullB; var u = 0
        while (u < m) { s += fullCoef(u) * km(idx(u))(gi); u += 1 }
        s
      }
      var f = 0
      while (f < folds) {
        val begin = f * m / folds; val end = (f + 1) * m / folds
        val test = java.util.Arrays.copyOfRange(perm, begin, end)
        val trainPos = perm.take(begin) ++ perm.drop(end)
        val trIdx = trainPos.map(idx)
        val trY = trainPos.map(yv)
        if (trY.isEmpty || trY.forall(_ > 0) || trY.forall(_ < 0))
          test.foreach(t => dec(t) = fullDecision(t))
        else {
          try {
            val (c2, b2) = solveBinary(trIdx, i => trY(i))
            test.foreach { t =>
              val gi = idx(t)
              var s = b2; var u = 0
              while (u < trIdx.length) { s += c2(u) * km(trIdx(u))(gi); u += 1 }
              dec(t) = s
            }
          } catch {
            case _: IllegalArgumentException =>
              test.foreach(t => dec(t) = fullDecision(t))
          }
        }
        f += 1
      }
      dec
    }

    /** One one-vs-one machine separating (cNeg, cPos), cNeg < cPos:
      * decision > 0 votes cPos. */
    def classMachine(cNeg: Double, cPos: Double): SvmMachine = {
      val idx = labels.indices
        .filter(i => labels(i) == cNeg || labels(i) == cPos).toArray
      val yv = idx.map(i => if (labels(i) == cPos) 1.0 else -1.0)
      val (coef, b) = solveBinary(idx, i => yv(i))
      val (pa, pb, hasP) =
        if (!$(probability)) (0.0, 0.0, false)
        else {
          val (a2, b2) = Platt.sigmoidTrain(cvDecisions(idx, yv, coef, b), yv)
          (a2, b2, true)
        }
      val (supFlat, supCoef) = sparsify(idx, coef)
      SvmMachine(cNeg, cPos, supFlat, supCoef, b, pa, pb, hasP)
    }

    // SVR Q rows: the 2n sign-block form (Q = [[K,−K],[−K,K]])
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
    val allIdx = labels.indices.toArray

    val classification = $(svmTask) == "svc" || $(svmTask) == "nusvc"
    val machines: Array[SvmMachine] = $(svmTask) match {
      case "svc" | "nusvc" =>
        // sklearn/LIBSVM one-vs-one: k(k−1)/2 binary machines over
        // class-pair subsets, all indexing the one shared Gram. The
        // machines are INDEPENDENT driver-side solves over read-only
        // state (km/labels/rows), so they overlap through FitPool
        // (guide §2.6; VERDICT r20 item 6) — assembled by index, each
        // solve self-contained, so the ensemble is identical at any
        // parallelism (SvmSpec pins it).
        val classes = labels.distinct.sorted
        require(classes.length >= 2,
          s"classification needs at least 2 classes, got ${classes.length}")
        val pairs = (for { a <- classes.indices; b <- (a + 1) until classes.length }
          yield (classes(a), classes(b))).toIndexedSeq
        FitPool.indexed(ds.sparkSession, pairs.size,
          "spark.graft.svmFitParallelism") { i =>
          classMachine(pairs(i)._1, pairs(i)._2)
        }.toArray
      case "svr" =>
        // 2n-variable ε-SVR form; β = α − α* recovers the coefficients
        val m = 2 * n
        val eps = $(epsilon)
        val pv = Array.tabulate(m)(t =>
          if (t < n) eps - labels(t) else eps + labels(t - n))
        val sol = SmoSolver.solve(m, svrQRow(m), pv, svrY(m), $(regC), $(tol))
        warnIfUnconverged(sol.iters, sol.violation)
        val coef = Array.tabulate(n)(i => sol.alpha(i) - sol.alpha(i + n))
        val (supFlat, supCoef) = sparsify(allIdx, coef)
        Array(SvmMachine(0.0, 0.0, supFlat, supCoef, -sol.rho, 0.0, 0.0, false))
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
        warnIfUnconverged(sol.iters, sol.violation)
        val bb = (sol.rNeg - sol.rPos) / 2
        val coef = Array.tabulate(n)(i => sol.alpha(i) - sol.alpha(i + n))
        val (supFlat, supCoef) = sparsify(allIdx, coef)
        Array(SvmMachine(0.0, 0.0, supFlat, supCoef, bb, 0.0, 0.0, false))
      case other => throw new IllegalArgumentException(
        s"svmTask must be svc, svr, nusvc, or nusvr, got '$other'")
    }

    val model = new GraftSvmModel(uid + "_m")
      .setMachines(machines)
      .setDim(p).setGamma(g).setKernelType($(kernel))
      .setClassify(classification)
    model.set(model.featuresCol, $(featuresCol))
      .set(model.predictionCol, $(predictionCol))
    model.setParent(this)
    model
  }


  override def transformSchema(schema: StructType): StructType =
    schema.add($(predictionCol), org.apache.spark.sql.types.DoubleType)

  override def copy(extra: ParamMap): GraftSvm = defaultCopy(extra)
}

object GraftSvm extends DefaultParamsReadable[GraftSvm]
