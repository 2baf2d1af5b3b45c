package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Pre-extracted, optionally group-pruned centroid structure behind
  * `graft_cell` / `graft_halo_cells` (r17).
  *
  * The flat static calls re-read every centroid element through the
  * boxed `ArrayData` accessors on EVERY row, and their per-row work is
  * O(k·d) — fine at the gate sizes (k ≤ 20), but the coarse-assignment
  * map is the one IVF-family stage whose per-row cost GROWS with the
  * corpus (cells scale as k = n/targetCellRows, so a fixed box pays
  * O(n·k·d) ≈ quadratic across decades — measured e(10×→100×) ≈ 1.6 on
  * the clustered DBSCAN decade before this index). Two fixes, both
  * exact:
  *
  *  1. one-time extraction of the centroid matrix into primitive
  *     `double[][]` (+ null/dim validation), memoized per THREAD on the
  *     literal's object identity — the centroid operand is a
  *     constant-folded literal, one instance per task, so the per-row
  *     cost of the memo is a single reference comparison;
  *  2. for k ≥ [[CentroidIndex.GROUP_THRESHOLD]], branch-and-bound
  *     group pruning: centroids are strided into G ≈ √k groups, each
  *     with its mean (super-centroid) and covering radius R_g =
  *     max_c∈g d(c, super_g). For any v and c ∈ g the triangle
  *     inequality gives d(v, c) ≥ d(v, super_g) − R_g, so a group whose
  *     lower bound already exceeds the best distance (or the halo cut)
  *     is skipped WITHOUT touching its members — argmin and halo sets
  *     are EXACT, ties still break to the lowest centroid index, and
  *     per-row work drops to O((√k + scanned members)·d).
  *
  * Groups are formed by k-means over the CENTROIDS (driver of the
  * call = executor thread, one-time O(k·√k·d)), so super-centroids
  * track real centroid geometry and radii stay tight.
  */
private[functions] final class CentroidIndex(cents: ArrayData,
    allowGrouping: Boolean = true) {
  val k: Int = cents.numElements()
  /** False when any centroid is null, any element is null, or dims are
    * inconsistent — the callers' strict null contract. */
  var valid: Boolean = k > 0
  var dim: Int = 0
  val flat: Array[Array[Double]] = if (k == 0) null else {
    val out = new Array[Array[Double]](k)
    var c = 0
    while (c < k && valid) {
      if (cents.isNullAt(c)) valid = false
      else {
        val a = cents.getArray(c)
        val n = a.numElements()
        if (c == 0) dim = n
        if (n != dim) valid = false
        else {
          val row = new Array[Double](n)
          var i = 0
          while (i < n && valid) {
            if (a.isNullAt(i)) valid = false else row(i) = a.getDouble(i)
            i += 1
          }
          out(c) = row
        }
      }
      c += 1
    }
    out
  }

  // ---- group structure (k ≥ GROUP_THRESHOLD only; disabled on the
  // per-row no-memo path, where the mini-k-means build would run for
  // every row instead of once per task) ----
  val grouped: Boolean =
    allowGrouping && valid && k >= CentroidIndex.GROUP_THRESHOLD
  var numGroups: Int = 0
  var superCents: Array[Array[Double]] = null
  var radius: Array[Double] = null
  var members: Array[Array[Int]] = null

  if (grouped) {
    val g = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    // mini k-means over the centroids: strided init, few Lloyd rounds
    val assign = new Array[Int](k)
    val sup = Array.tabulate(g)(i => flat((i.toLong * k / g).toInt).clone())
    var iter = 0
    while (iter < 5) {
      var c = 0
      while (c < k) {
        var bg = 0; var bd = Double.MaxValue; var gg = 0
        while (gg < g) {
          val d2 = CentroidIndex.sq(flat(c), sup(gg))
          if (d2 < bd) { bd = d2; bg = gg }
          gg += 1
        }
        assign(c) = bg
        c += 1
      }
      val sums = Array.fill(g, dim)(0.0)
      val cnt = new Array[Int](g)
      c = 0
      while (c < k) {
        val a = assign(c); cnt(a) += 1
        var i = 0; while (i < dim) { sums(a)(i) += flat(c)(i); i += 1 }
        c += 1
      }
      var gg = 0
      while (gg < g) {
        if (cnt(gg) > 0) {
          var i = 0
          while (i < dim) { sup(gg)(i) = sums(gg)(i) / cnt(gg); i += 1 }
        }
        gg += 1
      }
      iter += 1
    }
    val byGroup = Array.fill(g)(new scala.collection.mutable.ArrayBuffer[Int])
    var c = 0
    while (c < k) { byGroup(assign(c)) += c; c += 1 }
    numGroups = g
    superCents = sup
    radius = Array.tabulate(g) { gg =>
      var r = 0.0
      byGroup(gg).foreach { c2 =>
        val d = math.sqrt(CentroidIndex.sq(flat(c2), sup(gg)))
        if (d > r) r = d
      }
      r
    }
    members = byGroup.map(_.toArray)
  }

  /** Exact argmin cell for `v` (length already checked == dim);
    * lowest index on ties. */
  def assign(v: Array[Double]): Long = {
    var best = Double.PositiveInfinity
    var bestK = -1
    if (!grouped) {
      var c = 0
      while (c < k) {
        val s = CentroidIndex.sqBounded(v, flat(c), best)
        if (s < best) { best = s; bestK = c }
        c += 1
      }
    } else {
      // group order: ascending lower bound; exact — a skipped group
      // cannot contain the argmin, and ties resolve to the lowest
      // index because equal distances update only on strict < or
      // lower index
      val lb = new Array[Double](numGroups)
      var gg = 0
      while (gg < numGroups) {
        val dg = math.sqrt(CentroidIndex.sq(v, superCents(gg)))
        val l = dg - radius(gg)
        lb(gg) = if (l > 0) l * l else 0.0
        gg += 1
      }
      val order = Array.range(0, numGroups).sortBy(lb)
      var oi = 0
      while (oi < numGroups) {
        val g2 = order(oi)
        if (lb(g2) > best) oi = numGroups // every later bound is larger
        else {
          val ms = members(g2)
          var mi = 0
          while (mi < ms.length) {
            val c = ms(mi)
            val s = CentroidIndex.sqBounded(v, flat(c), best)
            if (s < best || (s == best && c < bestK)) { best = s; bestK = c }
            mi += 1
          }
        }
        oi += 1
      }
      // sqBounded early-exits above the bound, which can leave an
      // equal-distance lower-index centroid unseen only when its
      // partial sum already exceeded best — impossible for s == best
      // reached without exit; ties remain exact
    }
    bestK.toLong
  }

  /** All cells with d²(v, c) ≤ cut, ascending — the halo set. */
  def halo(v: Array[Double], cut: Double): Array[Long] = {
    val buf = new scala.collection.mutable.ArrayBuffer[Long](8)
    if (!grouped) {
      var c = 0
      while (c < k) {
        if (CentroidIndex.sqBounded(v, flat(c), cut + 1e-12) <= cut)
          buf += c.toLong
        c += 1
      }
    } else {
      var gg = 0
      while (gg < numGroups) {
        val dg = math.sqrt(CentroidIndex.sq(v, superCents(gg)))
        val l = dg - radius(gg)
        val lb = if (l > 0) l * l else 0.0
        if (lb <= cut) {
          val ms = members(gg)
          var mi = 0
          while (mi < ms.length) {
            val c = ms(mi)
            if (CentroidIndex.sqBounded(v, flat(c), cut + 1e-12) <= cut)
              buf += c.toLong
            mi += 1
          }
        }
        gg += 1
      }
    }
    val out = buf.toArray
    java.util.Arrays.sort(out)
    out
  }

  /** Exact two nearest centroids under lexicographic (distance², index)
    * order — the adaptive-2-probe kernel. Returns (k1, d1, k2, d2);
    * k2 = -1 when k == 1. Group pruning bounds against the CURRENT
    * second-best (a group whose lower bound exceeds d2 can contain
    * neither of the two smallest), so per-row work stays
    * O((√k + scanned)·d); tie discipline identical to sorting (d, k)
    * structs ascending — the composable `array_sort` form this
    * replaces. */
  def top2(v: Array[Double]): (Int, Double, Int, Double) = {
    var d1 = Double.PositiveInfinity; var k1 = -1
    var d2 = Double.PositiveInfinity; var k2 = -1
    def offer(c: Int, s: Double): Unit = {
      if (s < d1 || (s == d1 && (k1 < 0 || c < k1))) {
        d2 = d1; k2 = k1; d1 = s; k1 = c
      } else if (s < d2 || (s == d2 && (k2 < 0 || c < k2))) {
        d2 = s; k2 = c
      }
    }
    if (!grouped) {
      var c = 0
      while (c < k) {
        val s = CentroidIndex.sqBounded(v, flat(c), d2)
        if (s <= d2) offer(c, s)
        c += 1
      }
    } else {
      val lb = new Array[Double](numGroups)
      var gg = 0
      while (gg < numGroups) {
        val dg = math.sqrt(CentroidIndex.sq(v, superCents(gg)))
        val l = dg - radius(gg)
        lb(gg) = if (l > 0) l * l else 0.0
        gg += 1
      }
      val order = Array.range(0, numGroups).sortBy(lb)
      var oi = 0
      while (oi < numGroups) {
        val g2 = order(oi)
        if (lb(g2) > d2) oi = numGroups // every later bound is larger
        else {
          val ms = members(g2)
          var mi = 0
          while (mi < ms.length) {
            val c = ms(mi)
            val s = CentroidIndex.sqBounded(v, flat(c), d2)
            if (s <= d2) offer(c, s)
            mi += 1
          }
        }
        oi += 1
      }
    }
    (k1, d1, k2, d2)
  }

  /** Exact `n` nearest centroids under lexicographic (distance², index)
    * order, restricted to cells whose id is set in `allowed` (null =
    * every cell) — the query-side multi-probe kernel behind
    * `graft_probek` (r19). Tie discipline is identical to sorting
    * (d, k) structs ascending (the composable `probeAmongCol` form
    * this replaces): a bounded insertion list keeps the current n best
    * ordered by (d², id), and branch-and-bound group pruning bounds
    * against the CURRENT worst of the full list — a group whose lower
    * bound exceeds it can contribute nothing (triangle inequality), so
    * per-row work stays O((√k + scanned)·d) instead of O(k·d).
    * Returns ids nearest-first, length min(n, allowed population). */
  def topK(v: Array[Double], n: Int, allowed: Array[Boolean]): Array[Long] = {
    if (n <= 0) return Array.emptyLongArray
    val cap = math.min(n, k)
    val ds = new Array[Double](cap)
    val ids = new Array[Int](cap)
    var size = 0
    // worst accepted (d², id) — the prune bound once the list is full
    def worst: Double = if (size < cap) Double.PositiveInfinity else ds(size - 1)
    def offer(c: Int, s: Double): Unit = {
      if (size == cap &&
        (s > ds(size - 1) || (s == ds(size - 1) && c > ids(size - 1)))) return
      var i = if (size < cap) { size += 1; size - 1 } else size - 1
      while (i > 0 && (ds(i - 1) > s || (ds(i - 1) == s && ids(i - 1) > c))) {
        ds(i) = ds(i - 1); ids(i) = ids(i - 1); i -= 1
      }
      ds(i) = s; ids(i) = c
    }
    @inline def ok(c: Int): Boolean = allowed == null || allowed(c)
    if (!grouped) {
      var c = 0
      while (c < k) {
        if (ok(c)) {
          val s = CentroidIndex.sqBounded(v, flat(c), worst)
          if (s <= worst) offer(c, s)
        }
        c += 1
      }
    } else {
      val lb = new Array[Double](numGroups)
      var gg = 0
      while (gg < numGroups) {
        val dg = math.sqrt(CentroidIndex.sq(v, superCents(gg)))
        val l = dg - radius(gg)
        lb(gg) = if (l > 0) l * l else 0.0
        gg += 1
      }
      val order = Array.range(0, numGroups).sortBy(lb)
      var oi = 0
      while (oi < numGroups) {
        val g2 = order(oi)
        if (lb(g2) > worst) oi = numGroups // every later bound is larger
        else {
          val ms = members(g2)
          var mi = 0
          while (mi < ms.length) {
            val c = ms(mi)
            if (ok(c)) {
              val s = CentroidIndex.sqBounded(v, flat(c), worst)
              if (s <= worst) offer(c, s)
            }
            mi += 1
          }
        }
        oi += 1
      }
    }
    val out = new Array[Long](size)
    var i = 0
    while (i < size) { out(i) = ids(i).toLong; i += 1 }
    out
  }

  /** Exact min distance² (no pruning) — the halo owner distance. */
  def minDist2(v: Array[Double]): Double = {
    var best = Double.PositiveInfinity
    if (!grouped) {
      var c = 0
      while (c < k) {
        val s = CentroidIndex.sqBounded(v, flat(c), best)
        if (s < best) best = s
        c += 1
      }
    } else {
      val lb = new Array[Double](numGroups)
      var gg = 0
      while (gg < numGroups) {
        val dg = math.sqrt(CentroidIndex.sq(v, superCents(gg)))
        val l = dg - radius(gg)
        lb(gg) = if (l > 0) l * l else 0.0
        gg += 1
      }
      val order = Array.range(0, numGroups).sortBy(lb)
      var oi = 0
      while (oi < numGroups) {
        val g2 = order(oi)
        if (lb(g2) > best) oi = numGroups
        else {
          val ms = members(g2)
          var mi = 0
          while (mi < ms.length) {
            val s = CentroidIndex.sqBounded(v, flat(ms(mi)), best)
            if (s < best) best = s
            mi += 1
          }
        }
        oi += 1
      }
    }
    best
  }
}

private[functions] object CentroidIndex {
  /** Below this k the flat primitive scan wins (group overhead ≥ k·d —
    * and the build cost matters on a cache miss: PQ codebooks are
    * k=64 × d=4, where grouping buys nothing and the mini-k-means
    * build costs more than it saves). */
  val GROUP_THRESHOLD = 128

  private def sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Squared distance with early exit once the partial sum exceeds
    * `bound` (returns a value > bound in that case — only the
    * comparison against bound is meaningful). */
  private def sqBounded(a: Array[Double], b: Array[Double], bound: Double): Double = {
    var s = 0.0; var i = 0
    while (i < a.length && s <= bound) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  // per-thread SMALL memo keyed on the literal's identity: the
  // centroid operand is constant-folded, so within a task every row
  // passes the SAME ArrayData instance per expression — but one
  // projection can carry SEVERAL such expressions (assignedCells
  // evaluates graft_cell AND graft_halo_cells per row, each with its
  // own literal object), so a one-slot cache would rebuild the index
  // on EVERY row (measured: the 100× DBSCAN decade went from 113 s to
  // >16 min on exactly that thrash). Four slots with move-to-front
  // cover any realistic expression mix; a miss is only a slowdown,
  // never a wrong result.
  private val SLOTS = 4
  private val slot = new ThreadLocal[Array[(ArrayData, CentroidIndex)]] {
    override def initialValue(): Array[(ArrayData, CentroidIndex)] =
      new Array[(ArrayData, CentroidIndex)](SLOTS)
  }

  /** Memoized (grouped) index when the caller has PROVEN the centroids
    * operand is a constant-folded literal (`expr.foldable` — one
    * immutable ArrayData instance per task, so reference identity is a
    * sound cache key); otherwise a fresh FLAT index per call: the
    * identity assumption cannot hold for a per-row operand (a reused
    * mutable ArrayData would silently serve stale centroids), and the
    * O(k^1.5·d) group build must not run per row (ADVICE r17). */
  def forCentroids(cents: ArrayData, foldable: Boolean): CentroidIndex =
    if (foldable) forCentroids(cents)
    else new CentroidIndex(cents, allowGrouping = false)

  def forCentroids(cents: ArrayData): CentroidIndex = {
    val s = slot.get()
    var i = 0
    while (i < SLOTS) {
      val e = s(i)
      if (e != null && (e._1 eq cents)) {
        if (i != 0) { // move-to-front so the hot pair stays cheap
          System.arraycopy(s, 0, s, 1, i)
          s(0) = e
        }
        return e._2
      }
      i += 1
    }
    val idx = new CentroidIndex(cents)
    System.arraycopy(s, 0, s, 1, SLOTS - 1)
    s(0) = (cents, idx)
    idx
  }

  /** v extracted to primitives; null when v has nulls or wrong length. */
  def extract(v: ArrayData, dim: Int): Array[Double] = {
    if (v.numElements() != dim) return null
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      out(i) = v.getDouble(i)
      i += 1
    }
    out
  }
}
