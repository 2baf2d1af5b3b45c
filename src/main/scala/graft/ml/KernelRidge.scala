package graft.ml

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.ml.{PredictionModel, Predictor}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.param.{DoubleArrayParam, DoubleParam, IntParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** EXACT kernel ridge regression (`sklearn.kernel_ridge.KernelRidge`,
  * the reference's `kernel_ridge` dispatch — `sklearn.py:58`): dual
  * solve α = (K + αI)⁻¹ y with sklearn's defaults (kernel "linear",
  * alpha 1.0, no intercept; "rbf" with gamma, default 1/p, selected by
  * hyperparam).
  *
  * Scale position, per the guard-and-route convention: the Gram matrix
  * is O(n²) memory and the solve O(n³), so this estimator runs
  * driver-side under a hard row cap and REFUSES bigger inputs, routing
  * to the RFF + ridge approximation (the `kernel_ridge` default
  * dispatch) — the same shape as `AffinityPropagation` for quadratic
  * plans. Prediction is distributed as usual: the support matrix rides
  * inside the persisted model and scoring is one k(x, Xᵢ) pass per
  * row. Opt in from `train` with hyperparam `exact = true`.
  */
/** Kernel evaluation shared by the exact dual machines ([[KernelRidge]],
  * [[GraftSvm]]): one definition of the rbf/linear kernel, the dense
  * Gram build, and the support-vector scoring loop. */
private[ml] object KernelMath {
  def kernelValue(xi: Array[Double], xj: Array[Double], rbf: Boolean,
      g: Double): Double = {
    val p = xi.length
    var kv = 0.0
    var d = 0
    if (rbf) {
      while (d < p) { val t = xi(d) - xj(d); kv += t * t; d += 1 }
      math.exp(-g * kv)
    } else {
      while (d < p) { kv += xi(d) * xj(d); d += 1 }
      kv
    }
  }

  def gram(feats: Array[Array[Double]], rbf: Boolean,
      g: Double): Array[Array[Double]] = {
    val n = feats.length
    val km = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i until n) {
      val kv = kernelValue(feats(i), feats(j), rbf, g)
      km(i)(j) = kv; km(j)(i) = kv
    }
    km
  }

  /** Σᵢ coefᵢ·k(supᵢ, x) over a row-major flattened support matrix. */
  def score(x: Array[Double], supFlat: Array[Double], coef: Array[Double],
      p: Int, rbf: Boolean, g: Double): Double = {
    var s = 0.0
    var i = 0
    while (i < coef.length) {
      var kv = 0.0
      var j = 0
      if (rbf) {
        while (j < p) { val t = x(j) - supFlat(i * p + j); kv += t * t; j += 1 }
        kv = math.exp(-g * kv)
      } else {
        while (j < p) { kv += x(j) * supFlat(i * p + j); j += 1 }
      }
      s += coef(i) * kv
      i += 1
    }
    s
  }
}

class GraftKernelModel(override val uid: String)
    extends PredictionModel[Vector, GraftKernelModel] with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("graftkern"))

  final val supportFlat = new DoubleArrayParam(this, "supportFlat",
    "support rows, row-major")
  final val dual = new DoubleArrayParam(this, "dual", "dual coefficients")
  final val dim = new IntParam(this, "dim", "feature dimension")
  final val gammaParam = new DoubleParam(this, "gammaParam", "rbf gamma")
  final val kernelType = new Param[String](this, "kernelType", "linear | rbf")
  setDefault(kernelType -> "linear", gammaParam -> 1.0)

  def setSupport(rows: Array[Array[Double]]): this.type = {
    set(dim, rows.head.length); set(supportFlat, rows.flatten)
  }
  def setDual(v: Array[Double]): this.type = set(dual, v)
  def setGamma(v: Double): this.type = set(gammaParam, v)
  def setKernelType(v: String): this.type = set(kernelType, v)

  override def numFeatures: Int = $(dim)

  override def predict(features: Vector): Double =
    KernelMath.score(features.toArray, $(supportFlat), $(dual), $(dim),
      $(kernelType) == "rbf", $(gammaParam))

  override def copy(extra: ParamMap): GraftKernelModel = defaultCopy(extra)
}

object GraftKernelModel extends DefaultParamsReadable[GraftKernelModel]

class KernelRidge(override val uid: String)
    extends Predictor[Vector, KernelRidge, GraftKernelModel]
    with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("kernridge"))

  final val alpha = new DoubleParam(this, "alpha", "ridge regularization")
  final val gamma = new DoubleParam(this, "gamma", "rbf gamma; <=0 derives 1/p")
  final val kernel = new Param[String](this, "kernel", "linear | rbf")
  final val maxRows = new IntParam(this, "maxRows",
    "hard cap — the dual solve is O(n^2) memory / O(n^3) compute")
  setDefault(alpha -> 1.0, gamma -> -1.0, kernel -> "linear", maxRows -> 2000)

  def setAlpha(v: Double): this.type = set(alpha, v)
  def setGamma(v: Double): this.type = set(gamma, v)
  def setKernel(v: String): this.type = set(kernel, v)
  def setMaxRows(v: Int): this.type = set(maxRows, v)

  override protected def train(ds: Dataset[_]): GraftKernelModel = {
    val cap = $(maxRows)
    val rows = ds.select(col($(featuresCol)), col($(labelCol)).cast("double"))
      .na.drop().limit(cap + 1).collect()
      .map { case Row(f: Vector, y: Double) => (f.toArray, y) }
    require(rows.nonEmpty,
      "exact kernel_ridge needs at least one non-null training row")
    require(rows.length <= cap,
      s"exact kernel_ridge is an O(n²)-memory dual solve (${rows.length} rows > " +
        s"$cap cap); drop the exact=true hyperparam to use the RFF + ridge " +
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
    val km = KernelMath.gram(rows.map(_._1), rbf, g)
    val k = BDM.tabulate[Double](n, n)((i, j) => km(i)(j))
    // linear SOLVE, never an explicit inverse: with near-duplicate rows
    // (and the GP path's tiny alpha) K is near-singular, where forming
    // inv(K + αI) amplifies error that the factorized solve does not —
    // and the solve is ~3× cheaper for a single right-hand side
    val a = (k + BDM.eye[Double](n) * $(alpha)) \ BDV(rows.map(_._2))
    val m = new GraftKernelModel(uid + "_m")
      .setSupport(rows.map(_._1)).setDual(a.toArray)
      .setGamma(g).setKernelType($(kernel))
    m.set(m.featuresCol, $(featuresCol)).set(m.predictionCol, $(predictionCol))
    m.setParent(this)
    m
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add($(predictionCol), org.apache.spark.sql.types.DoubleType)

  override def copy(extra: ParamMap): KernelRidge = defaultCopy(extra)
}

object KernelRidge extends DefaultParamsReadable[KernelRidge]
