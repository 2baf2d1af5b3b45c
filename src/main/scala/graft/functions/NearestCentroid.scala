package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: `graft_cell(v, centroids)` = argmin over
  * k of Σ (v(i) − centroids(k)(i))², ties broken toward the lower index
  * — the coarse-quantizer cell assignment under the IVF/kNN-graph
  * similarity family.
  *
  * The composable form (an `array_min` over k `graft_sqdist` struct
  * columns) materializes k structs per row and grows the generated code
  * linearly with k, falling out of codegen past Janino's method limit
  * around a few hundred centroids. This expression keeps the assignment
  * a single static call at ANY k: the centroid matrix is one literal
  * operand (constant-folded once per plan), the scan stays inside
  * whole-stage codegen, and per-row work is one tight k×dim loop with
  * early exit once a partial sum exceeds the best distance so far
  * (early exit only shortcuts accumulation ordering for distances that
  * are NOT the minimum — the argmin itself is exact).
  */
case class NearestCentroid(left: Expression, right: Expression) extends BinaryExpression {
  // input typing handled by the registry builder (casts to array<double>
  // / array<array<double>>), same scheme as the VectorFold expressions
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cell"

  override protected def nullSafeEval(v: Any, cents: Any): Any =
    NearestCentroid.assign(v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData],
      right.foldable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val r = ctx.freshName("cell")
      s"""
         |java.lang.Long $r = graft.functions.NearestCentroid.assign($v, $c, ${right.foldable});
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCentroid =
    copy(left = l, right = r)
}

object NearestCentroid {
  /** Static codegen target. Null on: empty centroid list, null element
    * anywhere, or a centroid whose length mismatches `v` — the same
    * strict null propagation as the VectorFold primitives. Since r17
    * the per-row work runs on the thread-memoized [[CentroidIndex]]:
    * primitive extraction once per task, and for
    * k ≥ [[CentroidIndex.GROUP_THRESHOLD]] exact branch-and-bound
    * group pruning — O((√k + scanned)·d) per row instead of O(k·d),
    * identical results (argmin, lowest-index ties, null contract).
    * `centsFoldable` is the expression's proof that the centroids
    * operand is a constant-folded literal; false bypasses the
    * identity memo (flat scan, no grouping) — see
    * [[CentroidIndex.forCentroids]]. */
  def assign(v: ArrayData, cents: ArrayData,
      centsFoldable: Boolean): java.lang.Long = {
    val idx = CentroidIndex.forCentroids(cents, centsFoldable)
    if (!idx.valid) return null
    val vv = CentroidIndex.extract(v, idx.dim)
    if (vv == null) return null
    java.lang.Long.valueOf(idx.assign(vv))
  }

  /** Back-compat entry (memoized path) for existing call sites/tests
    * that pass a literal-backed ArrayData. */
  def assign(v: ArrayData, cents: ArrayData): java.lang.Long =
    assign(v, cents, centsFoldable = true)
}

/** Native Catalyst expression: `graft_halo_cells(v, centroids, eps)` =
  * the owner cell (argmin distance) PLUS every cell k with
  * d(v, c_k) ≤ d(v, owner) + 2·eps, ascending.
  *
  * This is the replication list that makes in-cell pair generation
  * eps-COMPLETE: for any pair (p, q) with |pq| ≤ eps, the triangle
  * inequality gives d(q, owner(p)) ≤ eps + d(p, owner(p)) ≤
  * 2·eps + d(q, owner(q)), so q's halo always contains owner(p) — every
  * eps-pair meets in at least one cell, no matter how clusters straddle
  * the Voronoi boundaries. The factor is the per-point replication
  * count, which stays O(1) once cells are ≫ eps (the quantizer-k sizing
  * rule already enforces that).
  *
  * Same codegen story as [[NearestCentroid]]: one static call, the
  * centroid matrix a constant-folded literal, per-row work two tight
  * k×dim loops (one for the owner distance, one cut-off pass to collect
  * the halo), so the corpus scan stays inside whole-stage codegen at
  * any k. */
case class HaloCells(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  // input typing handled by the registry builder, as with graft_cell
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_halo_cells"

  override protected def nullSafeEval(v: Any, cents: Any, eps: Any): Any =
    HaloCells.halo(v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData],
      eps.asInstanceOf[Double], second.foldable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c, e) => {
      val r = ctx.freshName("halo")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.HaloCells.halo($v, $c, $e, ${second.foldable});
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): HaloCells =
    copy(first = f, second = s, third = t)
}

object HaloCells {
  /** Static codegen target. Null propagation identical to
    * [[NearestCentroid.assign]]; additionally null for eps < 0.
    * r17: runs on the thread-memoized [[CentroidIndex]] — the exact
    * owner distance and the ≤-cut membership sweep both group-prune
    * for k ≥ [[CentroidIndex.GROUP_THRESHOLD]] (a group whose lower
    * bound exceeds the cut cannot contribute a halo cell — triangle
    * inequality), output still the ascending cell list.
    * `centsFoldable` as in [[NearestCentroid.assign]]. */
  def halo(v: ArrayData, cents: ArrayData, eps: Double,
      centsFoldable: Boolean): ArrayData = {
    if (eps < 0 || java.lang.Double.isNaN(eps)) return null
    val idx = CentroidIndex.forCentroids(cents, centsFoldable)
    if (!idx.valid) return null
    val vv = CentroidIndex.extract(v, idx.dim)
    if (vv == null) return null
    val cutRoot = math.sqrt(idx.minDist2(vv)) + 2.0 * eps
    new GenericArrayData(idx.halo(vv, cutRoot * cutRoot))
  }

  /** Back-compat entry (memoized path), as with NearestCentroid. */
  def halo(v: ArrayData, cents: ArrayData, eps: Double): ArrayData =
    halo(v, cents, eps, centsFoldable = true)
}

/** Native Catalyst expression: `graft_probe2(v, centroids, ratio)` =
  * the ADAPTIVE 2-probe cell list — `[owner]` when the vector sits
  * deep inside its cell (owner d² < ratio · runner-up d²), `[owner,
  * runnerUp]` in the boundary band (owner d² ≥ ratio · runner-up d²).
  *
  * This replaces the composable form (k `graft_sqdist` structs →
  * `array_sort` → slice) on the CORPUS side: that form's generated
  * code grows linearly with k and falls out of whole-stage codegen
  * past a few dozen centroids, after which every row pays an
  * INTERPRETED k-struct sort (measured: the trained semantic-pair scan
  * at k=80 spent ~25 s/pass in the interpreted probe at the 10× decade
  * — 3× evaluated, it dominated the stage). Here the probe is one
  * static call on the thread-memoized [[CentroidIndex]]: exact top-2
  * with branch-and-bound group pruning for k ≥ GROUP_THRESHOLD, tie
  * discipline identical to the struct sort's (distance, index)
  * ascending order. The composable form stays the query-side default
  * ([[graft.operators.CoarseQuantizer.probeAdaptiveCol]]); trained
  * quantizers override to this expression. */
case class ProbeCells(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  // input typing handled by the registry builder, as with graft_cell
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_probe2"

  override protected def nullSafeEval(v: Any, cents: Any, ratio: Any): Any =
    ProbeCells.probe2(v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData],
      ratio.asInstanceOf[Double], second.foldable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c, r) => {
      val out = ctx.freshName("probe")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.ProbeCells.probe2($v, $c, $r, ${second.foldable});
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ProbeCells =
    copy(first = f, second = s, third = t)
}

object ProbeCells {
  /** Static codegen target. Null propagation identical to
    * [[NearestCentroid.assign]]. Two-cell condition replicates the
    * composable `when(d1 >= ratio * d2, ...)` exactly — including its
    * NaN-ratio behavior (comparison false → single cell). */
  def probe2(v: ArrayData, cents: ArrayData, ratio: Double,
      centsFoldable: Boolean): ArrayData = {
    val idx = CentroidIndex.forCentroids(cents, centsFoldable)
    if (!idx.valid) return null
    val vv = CentroidIndex.extract(v, idx.dim)
    if (vv == null) return null
    val (k1, d1, k2, d2) = idx.top2(vv)
    if (k2 >= 0 && d1 >= ratio * d2)
      new GenericArrayData(Array(k1.toLong, k2.toLong))
    else new GenericArrayData(Array(k1.toLong))
  }
}

/** Native Catalyst expression: `graft_probek(v, centroids, nprobe,
  * allowed)` = the `nprobe` nearest centroid ids AMONG the `allowed`
  * cell set, nearest first — the multi-probe list
  * [[graft.operators.CoarseQuantizer.probeAmongCol]] builds
  * composably (k sqdist structs → array_sort → slice → transform).
  *
  * The composable form's generated code grows linearly with k — the
  * same defect `graft_probe2` fixed on the corpus-side adaptive probe
  * (r18): past Janino's limit every row pays an INTERPRETED k-struct
  * sort. That was survivable while only 10-query batches probed, but
  * the conversation retrieval eval probes a CORPUS-sized context
  * batch against an index whose cell count grows with the pool
  * (k = pool/500), so the probe is n·k = quadratic-over-500 work and
  * it ran interpreted — the dominant term of the ft_conversation
  * decade row's 1.27 second-decade exponent (r19). One static call on
  * the thread-memoized [[CentroidIndex]] keeps the scan in
  * whole-stage codegen at any k, and branch-and-bound group pruning
  * makes per-row work O((√k + scanned)·d). Tie discipline is
  * identical to the struct sort: (distance², index) ascending;
  * output length = min(nprobe, |allowed|). `allowed` must be a
  * DISTINCT id set (enforced by `KMeansQuantizer.probeAmongCol`,
  * ADVICE r19): with a repeated id the struct-sort form would emit
  * the duplicate cell twice where this mask-based form dedups —
  * the equality claim holds only on distinct sets. */
case class ProbeKCells(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  // input typing handled by the registry builder, as with graft_cell
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_probek"

  override protected def nullSafeEval(
      v: Any, cents: Any, n: Any, allowed: Any): Any =
    ProbeKCells.probeK(v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData],
      n.asInstanceOf[Int], allowed.asInstanceOf[ArrayData], second.foldable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c, n, a) => {
      val out = ctx.freshName("probek")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.ProbeKCells.probeK($v, $c, $n, $a, ${second.foldable});
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): ProbeKCells =
    copy(first = f, second = s, third = t, fourth = q)
}

object ProbeKCells {
  /** Static codegen target. Null propagation identical to
    * [[NearestCentroid.assign]]; additionally null when `allowed`
    * contains a null or an id outside [0, k) — the composable form
    * would have failed at plan build on such an id, so a defensive
    * null (never a silent skip) keeps the strict contract. An empty
    * probe (nprobe ≤ 0) returns an empty array, mirroring
    * `slice(..., 1, 0)`. */
  def probeK(v: ArrayData, cents: ArrayData, nprobe: Int,
      allowed: ArrayData, centsFoldable: Boolean): ArrayData = {
    val idx = CentroidIndex.forCentroids(cents, centsFoldable)
    if (!idx.valid) return null
    val vv = CentroidIndex.extract(v, idx.dim)
    if (vv == null) return null
    var mask: Array[Boolean] = null
    if (allowed != null) {
      val na = allowed.numElements()
      mask = new Array[Boolean](idx.k)
      var i = 0
      while (i < na) {
        if (allowed.isNullAt(i)) return null
        val id = allowed.getLong(i)
        if (id < 0 || id >= idx.k) return null
        mask(id.toInt) = true
        i += 1
      }
    }
    new GenericArrayData(idx.topK(vv, nprobe, mask))
  }
}
