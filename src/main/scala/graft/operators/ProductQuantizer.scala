package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze & Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search" — the PQ/ADC half of the
  * FAISS IVF-PQ architecture; the IVF half is [[Quantizer]]):
  * the d-dim space splits into `m` subspaces of d/m dims, each with
  * its own k-codeword codebook; a vector stores as m small codes
  * (m bytes at k ≤ 256 — a 32× compression of a 64-dim float vector),
  * and a query computes ONE m×k distance table, after which every
  * candidate's approximate squared distance is m table lookups
  * (`graft_pq_adc`, codegen'd).
  *
  * Scale position: this is the 100 TB scan format. The IVF cell
  * prunes candidates; PQ codes make the in-cell scan touch m bytes
  * per vector instead of 4d, with no per-candidate float math. The
  * CODEBOOK is model, not data: it trains driver-side on a seeded
  * bounded sample (like HistGB's bin cuts) and broadcasts as a plan
  * literal; encoding is a stateless map (`graft_cell` per subspace)
  * and never shuffles.
  */
object ProductQuantizer {
  final case class Codebook(m: Int, subDim: Int, k: Int,
      centers: Array[Array[Array[Double]]]) {
    /** Query's per-subspace distance table: table(j)(c) =
      * ‖q_sub(j) − center(j)(c)‖². */
    def adcTable(q: Array[Double]): Seq[Seq[Double]] =
      (0 until m).map { j =>
        (0 until k).map { c =>
          var s = 0.0
          var i = 0
          while (i < subDim) {
            val t = q(j * subDim + i) - centers(j)(c)(i)
            s += t * t
            i += 1
          }
          s
        }
      }
  }

  /** Driver-side Lloyd iterations per subspace over a seeded bounded
    * sample (deterministic: seeded sample, first-k-distinct init, ties
    * to the lower centroid id). O(sampleCap · k · d · iters) driver
    * work — independent of corpus size, like HistGB's quantile cuts. */
  def train(e: DataFrame, vCol: String, m: Int = 8, k: Int = 16,
      sampleCap: Int = 20000, iters: Int = 10, seed: Long = 42L): Codebook = {
    val n = e.count()
    require(n > 0, "PQ training needs a non-empty corpus")
    val frac = math.min(1.0, sampleCap.toDouble / n)
    val sample: Array[Array[Double]] =
      (if (frac >= 1.0) e else e.sample(withReplacement = false, frac, seed))
        .select(col(vCol).cast("array<double>")).collect()
        .map(_.getSeq[Double](0).toArray)
    val d = sample.head.length
    require(d % m == 0, s"dim $d must divide into $m subspaces")
    val sub = d / m
    val centers = Array.tabulate(m) { j =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      // init: first k DISTINCT subvectors in sample order
      val init = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      var i = 0
      while (i < pts.length && init.length < k) {
        if (!init.exists(c => java.util.Arrays.equals(c, pts(i)))) init += pts(i).clone()
        i += 1
      }
      // pad with copies of the first centroid — inert duplicates (the
      // strict < tie-break routes every point to the lower id)
      while (init.length < k) init += init(0).clone()
      var cs = init.toArray
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k, sub)(0.0)
        val cnts = new Array[Long](k)
        pts.foreach { p =>
          var best = 0; var bd = Double.MaxValue
          var c = 0
          while (c < k) {
            var s = 0.0; var x = 0
            while (x < sub) { val t = p(x) - cs(c)(x); s += t * t; x += 1 }
            if (s < bd) { bd = s; best = c }
            c += 1
          }
          var x = 0
          while (x < sub) { sums(best)(x) += p(x); x += 1 }
          cnts(best) += 1
        }
        cs = Array.tabulate(k)(c =>
          if (cnts(c) == 0) cs(c)
          else Array.tabulate(sub)(x => sums(c)(x) / cnts(c)))
        it += 1
      }
      cs
    }
    Codebook(m, sub, k, centers)
  }

  /** Append `codesCol`: array of m codeword ids — one `graft_cell`
    * (codegen'd nearest-centroid) per subspace over a sliced view.
    * Stateless map; the codebook rides as a plan literal. */
  def encode(df: DataFrame, vCol: String, cb: Codebook,
      codesCol: String = "pq_codes"): DataFrame = {
    val codes = array((0 until cb.m).map { j =>
      call_function("graft_cell",
        slice(col(vCol), j * cb.subDim + 1, cb.subDim),
        typedlit(cb.centers(j).map(_.toSeq).toSeq))
    }: _*)
    df.withColumn(codesCol, codes)
  }

  /** ADC distance of encoded rows against a query table column. */
  def adcDist(codes: Column, table: Column): Column =
    call_function("graft_pq_adc", codes, table)

  /** The query-side m×k distance table as ONE nested higher-order
    * expression over the codebook literal — queries stay a distributed
    * DataFrame (no driver collect, any query count). Interpreted HOF
    * eval is fine HERE: the table computes once per QUERY row
    * (m·k·subDim flops) and amortizes over every candidate through the
    * broadcast join, while the per-candidate hot loop stays on the
    * codegen'd `graft_pq_adc`. (The earlier spelling — m·k separate
    * `graft_sqdist` calls — produced a 1,024-node expression tree
    * whose analysis/codegen dwarfed the query itself.) */
  def adcTableCol(v: Column, cb: Codebook): Column = {
    val cents = typedlit(cb.centers.map(_.map(_.toSeq).toSeq).toSeq) // m×k×sub
    transform(cents, (subCents, j) =>
      transform(subCents, c =>
        aggregate(
          zip_with(slice(v, j * cb.subDim + 1, lit(cb.subDim)), c,
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x)))
  }
}
