package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Coarse quantizer for the IVF / kNN-graph similarity family: maps an
  * `array<double>` embedding to a cell id in `[0, numCells)`.
  *
  * The quantizer is THE scale lever for this family: every in-cell
  * operation (IVF probe, kNN-graph self-join) is quadratic in CELL
  * population, so keeping cells bounded — by growing `numCells` with the
  * corpus — is what keeps total work linear at 100 TB. Two
  * implementations:
  *
  *  - [[LcgQuantizer]]: 4 closed-form pseudo-random centroids. Exactly
  *    replayable in ANSI SQL, so it anchors the DuckDB correctness
  *    gates — but its cell count is a constant, which makes it a
  *    correctness twin, not a scale path.
  *  - [[KMeansQuantizer]]: centroids TRAINED with MLlib k-means (on the
  *    corpus or a sample), k sized to bound cell population. Assignment
  *    runs through the native codegen expression `graft_cell`, so the
  *    corpus-side scan stays inside whole-stage codegen at any k.
  */
trait CoarseQuantizer extends Serializable {
  def numCells: Int

  /** Cell id for one vector (argmin squared distance, ties → lower id). */
  def cellCol(v: Column): Column

  /** True when `cellCol` is cheap enough to RECOMPUTE per consumer
    * instead of materializing the assigned frame: a handful of flops
    * per row (the 4-centroid LCG gate grid) loses to the cost of
    * checkpoint-writing the fat vector column, while a trained
    * quantizer's O(numCells·d) assignment is the map worth paying for
    * exactly once. Consumers ([[Similarity.knnGraph]]) branch on this. */
  def cheapAssignment: Boolean = false

  /** The `nprobe` nearest cell ids, nearest first — the query-side
    * multi-probe list. Query sets are small, so this composable form
    * (sort k distance structs) is fine even where the corpus side needs
    * the native single-call assignment. */
  def probeCol(v: Column, nprobe: Int): Column

  /** Centroid for cell k, exposed for specs and plan audits. */
  def centroid(k: Int): Seq[Double]

  /** Replication list for eps-COMPLETE in-cell pair generation: the
    * owner cell plus every cell with d(v, c) ≤ d(v, owner) + 2·eps.
    * By the triangle inequality every eps-pair then shares at least one
    * cell (see [[graft.functions.HaloCells]] for the proof), which is
    * what lets `dbscanBucketed` stay EXACT while scaling as in-cell
    * work. Corpus-side, so it runs through the native codegen
    * expression at any numCells. */
  def haloCol(v: Column, eps: Double): Column =
    call_function("graft_halo_cells", v,
      typedlit((0 until numCells).map(centroid)), lit(eps))

  protected def sqdist(a: Column, b: Column): Column =
    call_function("graft_sqdist", a, b)

  /** v − centroid(cell): the residual IVF-PQ encodes (Jégou et al.
    * 2011 §IV — residuals have smaller energy than raw vectors, so the
    * same PQ code budget quantizes finer). `cell` is the row's
    * already-computed owner (corpus side) or probed cell (query side,
    * which recomputes its residual PER probed cell). */
  def residualCol(v: Column, cell: Column): Column =
    zip_with(v, element_at(
      typedlit((0 until numCells).map(centroid)), (cell + 1).cast("int")),
      (a, b) => a - b)

  /** Default probe list via a sorted array of (distance, id) structs —
    * generated-code size grows with numCells, acceptable query-side. */
  protected def probeBySort(v: Column, nprobe: Int): Column =
    probeAmongCol(v, nprobe, 0 until numCells)

  /** ADAPTIVE 2-probe: the owner cell always, the second-nearest cell
    * only when the vector sits in the boundary band — owner distance
    * within `ratio` of the runner-up (d1 ≥ ratio·d2 on SQUARED
    * distances; ratio→0 probes everything, ratio→1 probes nothing
    * extra). Interior vectors (most of a corpus) keep the cheap single
    * assignment; only the boundary band pays the 2-probe fan-out — the
    * pair volume sits between nprobe=1 and nprobe=2 while boundary
    * pairs (the ones hard assignment provably loses — SemDeDup measured
    * 0.38 recall) are still co-bucketed. A pair straddling a boundary
    * has BOTH ends near it, so either end's second probe recovers it.
    * Corpus-side cost is the same sorted-struct sweep as [[probeCol]];
    * the savings are in the downstream join, which is where the time
    * goes. */
  def probeAdaptiveCol(v: Column, ratio: Double): Column = {
    val dists = (0 until numCells).map { k =>
      struct(sqdist(v, typedlit(centroid(k))).as("d"), lit(k.toLong).as("k"))
    }
    val top2 = slice(array_sort(array(dists: _*)), 1, 2)
    val first = element_at(top2, 1)
    val second = element_at(top2, 2)
    when(lit(numCells) <= 1, array(first.getField("k")))
      .when(first.getField("d") >= lit(ratio) * second.getField("d"),
        array(first.getField("k"), second.getField("k")))
      .otherwise(array(first.getField("k")))
  }

  /** The `nprobe` nearest cells AMONG `allowed`, nearest first. k-means
    * can leave centroids that own no corpus vectors; a probe restricted
    * to the non-empty cells (the caller knows them from the one
    * assignment pass) guarantees every query meets candidates whenever
    * the pool is non-empty, instead of silently retrieving nothing when
    * its top-nprobe centroids are all empty. */
  def probeAmongCol(v: Column, nprobe: Int, allowed: Seq[Int]): Column = {
    require(allowed.nonEmpty, "probeAmongCol needs at least one allowed cell")
    val dists = allowed.map { k =>
      struct(sqdist(v, typedlit(centroid(k))).as("d"), lit(k.toLong).as("k"))
    }
    transform(slice(array_sort(array(dists: _*)), 1, nprobe), x => x.getField("k"))
  }
}

/** The 4-cell closed-form LCG quantizer — the DuckDB-replayable oracle
  * twin (see `Similarity.simIvfSql` for the matching SQL arithmetic). */
object LcgQuantizer extends CoarseQuantizer {
  override val numCells: Int = 4

  // 4 fixed centroids × 64 dims ≈ 512 flops/row — recomputing per
  // consumer beats checkpointing the fat vector column
  override val cheapAssignment: Boolean = true

  override def centroid(k: Int): Seq[Double] =
    (0 until 64).map { i =>
      ((1103515245L * (k * 64 + i) + 12345L) % 2147483648L).toDouble /
        2147483648.0 - 0.5
    }

  override def cellCol(v: Column): Column = {
    val dists = (0 until 4).map(k => sqdist(v, typedlit(centroid(k))))
    when(dists(0) <= dists(1) && dists(0) <= dists(2) && dists(0) <= dists(3), 0L)
      .when(dists(1) <= dists(2) && dists(1) <= dists(3), 1L)
      .when(dists(2) <= dists(3), 2L).otherwise(3L)
  }

  override def probeCol(v: Column, nprobe: Int): Column = probeBySort(v, nprobe)
}

/** Trained k-means coarse quantizer. Centroids ride into the plan as a
  * single `array<array<double>>` literal; assignment is one native
  * `graft_cell` call per row (codegen at any k), so the 100 TB corpus
  * scan never leaves whole-stage codegen and never shuffles — the cell
  * id is computed map-side and becomes the partition/bucket key. */
final class KMeansQuantizer(val centroids: Array[Array[Double]]) extends CoarseQuantizer {
  require(centroids.nonEmpty, "KMeansQuantizer needs at least one centroid")
  override def numCells: Int = centroids.length
  override def centroid(k: Int): Seq[Double] = centroids(k).toSeq

  private def centLit: Column = typedlit(centroids.map(_.toSeq).toSeq)

  override def cellCol(v: Column): Column = call_function("graft_cell", v, centLit)

  override def probeCol(v: Column, nprobe: Int): Column = probeBySort(v, nprobe)

  /** Native corpus-side adaptive probe (r18): the trait's composable
    * form (numCells sqdist structs → array_sort) generates code linear
    * in k and falls out of whole-stage codegen past a few dozen
    * centroids — measured ~25 s/pass of INTERPRETED struct sorting at
    * k=80 on the 10× decade corpus, 3× evaluated per pair stage. One
    * `graft_probe2` call keeps the scan codegen at any k and rides the
    * same branch-and-bound centroid index as `graft_cell` (exact top-2,
    * identical tie order to the struct sort). */
  override def probeAdaptiveCol(v: Column, ratio: Double): Column =
    call_function("graft_probe2", v, centLit, lit(ratio))

  /** Native multi-probe (r19): the trait's composable struct-sort form
    * generates code linear in k — survivable for 10-query ANN batches,
    * but the conversation retrieval eval probes a CORPUS-sized context
    * batch against an index whose cell count grows with the pool
    * (k = pool/targetCellRows), so at the 100× decade the probe ran as
    * an INTERPRETED 940-struct sort per row and dominated the gate's
    * 1.27 second-decade exponent. One `graft_probek` call keeps the
    * probe in whole-stage codegen at any k and rides the same
    * branch-and-bound centroid index as `graft_cell`/`graft_probe2`
    * (exact top-nprobe among the allowed cells, tie order identical to
    * the struct sort — QuantizerSpec pins equality at k=8 and k=160). */
  override def probeAmongCol(v: Column, nprobe: Int, allowed: Seq[Int]): Column = {
    require(allowed.nonEmpty, "probeAmongCol needs at least one allowed cell")
    // ADVICE r19: `allowed` must be DISTINCT for the documented
    // tie-for-tie equality with the composable struct-sort form — the
    // native boolean mask dedups a repeated id while the struct sort
    // would emit the duplicate cell twice. Every caller passes a
    // distinct cell set; enforce it so the stated equivalence stays
    // honest rather than silently diverging.
    require(allowed.distinct.length == allowed.length,
      "probeAmongCol: allowed cell ids must be distinct")
    call_function("graft_probek", v, centLit, lit(nprobe),
      typedlit(allowed.map(_.toLong)))
  }
}

object KMeansQuantizer {
  /** Fit k-means centroids on the `v` column of `e`.
    *
    * At 100 TB the fit runs on `sampleFraction` of the corpus (k-means
    * cell centers converge on a sample; assignment of the full corpus
    * is the map-only `graft_cell` pass) and `k` is sized as
    * corpus_rows / target_cell_rows so the downstream in-cell joins
    * stay bounded.
    *
    * The Lloyd iterations run ON THE DRIVER over the collected sample —
    * the FAISS coarse-quantizer discipline (train locally on a bounded
    * sample, assign distributedly): the sample is already bounded to
    * O(k·pointsPerCell) vectors by [[fitSampled]], and a distributed
    * k-means pays one scheduler round-trip PER ITERATION for work that
    * is milliseconds of arithmetic (measured ~3 s of pure job latency
    * for 10 MLlib iterations on a 3 840-point sample — the dominant
    * cost of every trained-quantizer gate). Deterministic by
    * construction, not by seed: the collected sample is sorted
    * lexicographically (collect order falls out), init is farthest-first
    * traversal (ties → lowest index), and Lloyd ties break to the lower
    * cell id — identical centroids on every rerun. `seed` only drives
    * the corpus sample split.
    *
    * The collected sample is ALWAYS bounded (ADVICE r17): with the
    * default `sampleFraction = 1.0` the relation is first counted and,
    * past [[FIT_POINTS_PER_CELL]]·k rows, down-sampled to that target —
    * a direct `fit()` on a corpus-sized frame costs one extra count
    * job instead of a driver OOM. Callers that already know the row
    * count should use [[fitSampled]], which skips the count. */
  def fit(e: DataFrame, k: Int, seed: Long = 42L,
      sampleFraction: Double = 1.0, maxIter: Int = 20): KMeansQuantizer = {
    val sample =
      if (sampleFraction < 1.0) e.sample(sampleFraction, seed)
      else {
        val target = math.min(FIT_POINTS_PER_CELL.toLong * k, MAX_FIT_POINTS)
        val rows = e.count()
        if (rows <= target) e else e.sample(target.toDouble / rows, seed)
      }
    fitCollected(sample, k, maxIter)
  }

  /** Collect + deterministic local Lloyd over an ALREADY-BOUNDED frame
    * — the shared tail of [[fit]] / [[fitSampled]]. */
  private def fitCollected(sample: DataFrame, k: Int,
      maxIter: Int): KMeansQuantizer = {
    val pts = sample.select(col("v").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(pts.nonEmpty, "KMeansQuantizer.fit on an empty relation")
    // deterministic regardless of partition/collect order
    java.util.Arrays.sort(pts, lexOrder)
    new KMeansQuantizer(localLloyd(pts, math.min(k, pts.length), maxIter))
  }

  /** FAISS-style coarse-quantizer training budget: centroids converge
    * on ~256 points per cell; everything past that is collect cost. */
  val FIT_POINTS_PER_CELL = 256

  private val lexOrder: java.util.Comparator[Array[Double]] =
    (a: Array[Double], b: Array[Double]) => {
      var i = 0
      var r = 0
      val n = math.min(a.length, b.length)
      while (i < n && r == 0) {
        r = java.lang.Double.compare(a(i), b(i))
        i += 1
      }
      if (r != 0) r else Integer.compare(a.length, b.length)
    }

  private def sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Squared distance with early exit once the partial sum exceeds
    * `bound` — exits only on non-minimal candidates, so every argmin
    * (and its distance) is bit-identical to the full sum. */
  private def sqBounded(a: Array[Double], b: Array[Double], bound: Double): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n && s <= bound) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Parallel per-index loop over the fit sample (JVM common pool) —
    * used ONLY where iterations are independent and write disjoint
    * slots, so the result is bit-identical to the sequential loop. The
    * driver-side fit is the one stage whose flop count grows as
    * k·sample (both linear in the corpus under chooseK), so at the
    * 100× decade the sequential Lloyd was minutes of single-threaded
    * arithmetic on a 32-core driver. */
  private def parRange(n: Int)(f: Int => Unit): Unit =
    java.util.stream.IntStream.range(0, n).parallel().forEach(i => f(i))

  /** Deterministic local k-means: Lloyd's iterations from FOUR inits —
    * sample-strided (every (n/k)-th point of the sorted sample, the
    * quantile-spread seeding that tracks data MASS), farthest-first
    * (2-approx k-center spread that covers isolated modes), and two
    * fixed-seed k-means++ draws — keeping the lowest-inertia result. Farthest-first alone anchored centroids
    * at outliers on the concentrated 64-dim gate embeddings and
    * produced a lopsided split (trained kNN co-cell recall 0.68 vs the
    * spec's 0.9 floor); strided alone can miss a small isolated
    * cluster. Lowest-id tie-breaks; an emptied cell is reseeded to the
    * point farthest from its own centroid. O(k·n·d) init +
    * O(iter·k·n·d) refinement per init — bounded because n is the
    * bounded fit sample, never the corpus. */
  private def localLloyd(pts: Array[Array[Double]], k: Int,
      maxIter: Int): Array[Array[Double]] = {
    val strided = Array.tabulate(k)(c => pts((c.toLong * pts.length / k).toInt).clone())
    val inits = Seq(strided, farthestFirst(pts, k),
      kppInit(pts, k, 42L), kppInit(pts, k, 4242L))
    inits.map(lloydFrom(pts, _, maxIter)).minBy(_._2)._1
  }

  /** k-means++ D²-weighted seeding (Arthur & Vassilvitskii 2007) under
    * `java.util.Random(seed)` — the JDK generator's algorithm is
    * spec-fixed, so the init (and hence the whole fit) is bit-stable
    * across JVMs given the sorted sample. */
  private def kppInit(pts: Array[Array[Double]], k: Int,
      seed: Long): Array[Array[Double]] = {
    val rng = new java.util.Random(seed)
    val n = pts.length
    val centers = new Array[Array[Double]](k)
    centers(0) = pts(rng.nextInt(n)).clone()
    val minD = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < k) {
      val prev = centers(c - 1)
      parRange(n) { i =>
        val dd = sqBounded(pts(i), prev, minD(i))
        if (dd < minD(i)) minD(i) = dd
      }
      var total = 0.0
      var i = 0
      while (i < n) { total += minD(i); i += 1 } // fixed-order sum
      var pick = 0
      if (total > 0) {
        val target = rng.nextDouble() * total
        var acc = 0.0
        i = 0
        var found = -1
        while (i < n && found < 0) {
          acc += minD(i)
          if (acc >= target) found = i
          i += 1
        }
        pick = if (found >= 0) found else n - 1
      }
      centers(c) = pts(pick).clone()
      c += 1
    }
    centers
  }

  /** Farthest-first traversal from the lexicographic minimum. */
  private def farthestFirst(pts: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    val n = pts.length
    val centers = new Array[Array[Double]](k)
    centers(0) = pts(0).clone()
    val minD = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < k) {
      val prev = centers(c - 1)
      parRange(n) { i =>
        val dd = sqBounded(pts(i), prev, minD(i))
        if (dd < minD(i)) minD(i) = dd
      }
      var best = 0; var bestD = -1.0; var i = 0
      while (i < n) { // fixed-order argmax → lowest index on ties
        if (minD(i) > bestD) { bestD = minD(i); best = i }
        i += 1
      }
      centers(c) = pts(best).clone()
      c += 1
    }
    centers
  }

  /** Lloyd's from the given init; returns (centers, inertia). */
  private def lloydFrom(pts: Array[Array[Double]], init: Array[Array[Double]],
      maxIter: Int): (Array[Array[Double]], Double) = {
    val n = pts.length
    val d = pts(0).length
    val k = init.length
    val centers = init.map(_.clone())
    val assign = new Array[Int](n)
    java.util.Arrays.fill(assign, -1)
    var iter = 0
    var changed = true
    val changedFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
    while (iter < maxIter && changed) {
      changedFlag.set(false)
      parRange(n) { i =>
        var bk = 0; var bd = Double.MaxValue; var kk = 0
        while (kk < k) {
          val dd = sqBounded(pts(i), centers(kk), bd)
          if (dd < bd) { bd = dd; bk = kk } // strict < → lowest id wins ties
          kk += 1
        }
        if (assign(i) != bk) { assign(i) = bk; changedFlag.set(true) }
      }
      changed = changedFlag.get()
      if (changed) {
        val sums = Array.fill(k, d)(0.0)
        val cnt = new Array[Int](k)
        var i = 0
        while (i < n) {
          val a = assign(i); cnt(a) += 1
          var j = 0; while (j < d) { sums(a)(j) += pts(i)(j); j += 1 }
          i += 1
        }
        var kk = 0
        while (kk < k) {
          if (cnt(kk) > 0) {
            var j = 0
            while (j < d) { centers(kk)(j) = sums(kk)(j) / cnt(kk); j += 1 }
          } else {
            // reseed an emptied cell to the point farthest from its own
            // centroid (ties → lowest index) — deterministic
            var best = 0; var bestD = -1.0; var i2 = 0
            while (i2 < n) {
              val dd = sq(pts(i2), centers(assign(i2)))
              if (dd > bestD) { bestD = dd; best = i2 }
              i2 += 1
            }
            centers(kk) = pts(best).clone()
          }
          kk += 1
        }
      }
      iter += 1
    }
    var inertia = 0.0
    var i = 0
    while (i < n) { inertia += sq(pts(i), centers(assign(i))); i += 1 }
    (centers, inertia)
  }

  /** k sized from the corpus: rows / targetCellRows, clamped to
    * [2, maxK]. The knob a 1000-executor deployment would set. */
  def chooseK(rows: Long, targetCellRows: Long, maxK: Int = 65536): Int =
    math.max(2, math.min(maxK, math.ceil(rows.toDouble / targetCellRows).toInt))

  /** Fit on a BOUNDED sample: coarse-quantizer centroids converge on
    * ~`pointsPerCell`·k points (the classic IVF training discipline —
    * FAISS trains its coarse quantizer on max(256·k) points for the
    * same reason), so the fit cost is O(k·pointsPerCell·d·iters)
    * regardless of corpus size while the full-corpus assignment stays
    * the map-only `graft_cell` pass. `rows` is the caller's already-
    * known corpus count (every call site has just counted for
    * [[chooseK]]), so bounding adds no extra pass. Deterministic under
    * the fixed seed. */
  /** Absolute training-set cap on top of the per-cell budget: k grows
    * linearly with the corpus under [[chooseK]], so pointsPerCell·k —
    * and with it the O(k·points·d·iters) Lloyd cost — grows
    * QUADRATICALLY across decades (measured: 3.5 s at the 10× decade's
    * k=80 → 55 s at 100×'s k=800 even with the parallel assignment).
    * FAISS applies the same discipline (subsample past
    * max_points_per_centroid, cap total training points): 65 536
    * points is ≥ 80/cell up to k=800 — far above the ~39/cell
    * convergence guideline — and pins the fit cost CONSTANT per
    * decade; gate-scale fits (≤ 65k target) are unchanged, and the
    * trained gates' inline recall floors are the quality check. */
  val MAX_FIT_POINTS: Long = 65536L

  def fitSampled(e: DataFrame, k: Int, rows: Long, seed: Long = 42L,
      pointsPerCell: Int = 256, maxIter: Int = 20): KMeansQuantizer = {
    val target = math.min(pointsPerCell.toLong * k, MAX_FIT_POINTS)
    if (rows <= target) fitCollected(e, k, maxIter) // bound known — no recount
    else fit(e, k, seed, sampleFraction = target.toDouble / rows, maxIter = maxIter)
  }
}
