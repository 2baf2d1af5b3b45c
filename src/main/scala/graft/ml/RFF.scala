package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.linalg.{DenseVector, Vector}
import org.apache.spark.ml.param.{DoubleParam, IntParam, LongParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, udf}
import org.apache.spark.sql.types.StructType

/** Random Fourier Features (Rahimi & Recht, "Random Features for
  * Large-Scale Kernel Machines", NIPS 2007): z(x) = sqrt(2/D) ·
  * cos(Wx + b) with W ~ N(0, 2γ·I), b ~ U[0, 2π) approximates the RBF
  * kernel exp(-γ·||x−y||²) as an explicit feature map, so a LINEAR
  * model on z(x) approximates the kernel machine — the standard way to
  * scale an rbf SVM (the reference's native linfa path,
  * `/root/reference/src/bindings/linfa.rs:241-328`) to data that no
  * single-node kernel matrix can hold.
  *
  * Weights are DERIVED, not stored: a closed-form splitmix64 hash +
  * Box–Muller on (seed, i, j) regenerates W and b anywhere from the
  * params alone, so the stage persists via DefaultParamsWritable and
  * executors rebuild identical weights with no broadcast.
  */
class RFFTransformer(override val uid: String) extends Transformer
    with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("rff"))

  final val inputCol = new Param[String](this, "inputCol", "input vector column")
  final val outputCol = new Param[String](this, "outputCol", "output vector column")
  final val numComponents = new IntParam(this, "numComponents", "feature-map width D")
  final val gamma = new DoubleParam(this, "gamma",
    "RBF gamma; <= 0 means 1/numInputFeatures at transform time")
  final val seed = new LongParam(this, "seed", "weight derivation seed")

  setDefault(inputCol -> "features", outputCol -> "rff_features",
    numComponents -> 100, gamma -> -1.0, seed -> 42L)

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setNumComponents(v: Int): this.type = set(numComponents, v)
  def setGamma(v: Double): this.type = set(gamma, v)
  def setSeed(v: Long): this.type = set(seed, v)

  /** splitmix64 finalizer — full-avalanche mixing, so consecutive
    * indices yield statistically independent uniforms. A plain LCG here
    * makes u(2i+1) a constant offset of u(2i) (mod 1) and the Box–Muller
    * output a 1-D curve instead of N(0,1). */
  private def u(i: Long): Double = {
    var z = i * 0x9E3779B97F4A7C15L + $(seed) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    (z >>> 11).toDouble / 9007199254740992.0 // 2^53
  }

  /** Standard normal via Box–Muller on two independently-mixed uniforms. */
  private def normal(i: Long): Double = {
    val u1 = math.max(u(2 * i), 1e-12)
    val u2 = u(2 * i + 1)
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** The feature map itself — also used by the row-predict path. */
  def expand(v: Vector): Vector = {
    val d = v.size
    val dOut = $(numComponents)
    val g = if ($(gamma) > 0) $(gamma) else 1.0 / d
    val scaleW = math.sqrt(2.0 * g)
    val scaleZ = math.sqrt(2.0 / dOut)
    val x = v.toArray
    val out = new Array[Double](dOut)
    var j = 0
    while (j < dOut) {
      var acc = 0.0
      var i = 0
      while (i < d) {
        acc += scaleW * normal(j.toLong * d + i) * x(i)
        i += 1
      }
      val b = u(Long.MaxValue / 2 + j) * 2.0 * math.Pi
      out(j) = scaleZ * math.cos(acc + b)
      j += 1
    }
    new DenseVector(out)
  }

  override def transform(df: Dataset[_]): DataFrame = {
    val f = udf((v: Vector) => expand(v))
    df.withColumn($(outputCol), f(col($(inputCol))))
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add($(outputCol), org.apache.spark.ml.linalg.SQLDataTypes.VectorType)

  override def copy(extra: ParamMap): RFFTransformer = defaultCopy(extra)
}

object RFFTransformer extends DefaultParamsReadable[RFFTransformer]
