package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-decade scale measurement for the bucketed-DBSCAN route
  * (VERDICT r16 item 7).
  *
  * The gate corpus cannot measure this route's scaling: the driver's
  * 64-dim embeddings are fully distance-concentrated (pair-distance
  * quantiles at sf0.1: 0.1% = 1.12, median = 1.414 ≈ √2), so NO eps
  * separates quantizer cells — the halo guard measures avg halo = k
  * (full replication) at 10× and correctly refuses: bucketing cannot
  * beat the quadratic scan on concentrated geometry (fixed-radius
  * near-neighbor hardness; SCALE.md §DBSCAN). Overriding the guard
  * there would measure k·n² by construction — the refusal, not the
  * route.
  *
  * The route's 100 TB claim is conditional: WHEN geometry admits
  * (inter-centroid spread ≫ eps), in-cell work is linear in the
  * corpus. This tool measures THAT claim: it derives, deterministically
  * from the (possibly GenScale-replicated) embedding id domain, a
  * clustered corpus in the admitting regime — cluster COUNT grows with
  * n at constant cluster size (the same per-replica density discipline
  * GenScale applies to documents), cluster centers are LCG vectors
  * (pairwise ~3.3 apart at d=64), points sit in a ±0.025/dim box around
  * their center (within-cluster pair d² ≈ 0.027 < eps² = 0.04) — so
  * eps-pairs exist ONLY within clusters and 2·eps ≪ center spread.
  * The halo guard stays LIVE at its production default: on admitting
  * geometry it admits; nothing is overridden.
  *
  * Usage: runMain graft.tools.DbscanScale <sfDir> [iters]
  * Prints one JSON line {"n":…,"cells":…,"avg_halo":…,"clusters":…,
  * "seconds":…} (best of iters).
  */
object DbscanScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    val ids = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id")
    val n = ids.count()
    val clusterSize = 200L
    val numClusters = math.max(1L, n / clusterSize)
    val d = 64
    // deterministic point: center(mix over cluster id) + per-(id,dim)
    // jitter. BOTH hashes are SplitMix64 finalizers: a multiplicative
    // LCG linear in id made GenScale's strided replica ids (b + r·10^k)
    // land in one cluster (stride·C ≡ 0 mod numClusters) with
    // CONSTANT-SHIFTED jitter across dims (the id term is
    // dim-independent), so replica pairs collapsed into spurious
    // eps-neighbors and the measured pair volume went superlinear —
    // an artifact of the weak hash, not of the operator.
    def mix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    def unit(x: Long): Double = (mix(x) >>> 11).toDouble / (1L << 53) - 0.5
    val gen = udf { (id: Long) =>
      val cluster = java.lang.Long.remainderUnsigned(mix(id), numClusters)
      val out = new Array[Double](d)
      var i = 0
      while (i < d) {
        out(i) = unit(cluster * d + i) + 0.05 * unit(-(id * d + i) - 1)
        i += 1
      }
      out.toSeq
    }
    val e = ids.select($"vec_id", gen($"vec_id").as("v")).localCheckpoint()

    // quantizer = the generative cluster centers themselves (cells ≡
    // clusters): the measurement isolates the OPERATOR — assignment,
    // halo, in-cell pairs, labeling — from fit quality. A k-means fit
    // at k ≪ numClusters puts each cell's centroid at the mean of ~5
    // well-separated cluster centers, which re-concentrates CELL-level
    // distances and made the halo factor drift with k (1.10 → 2.93
    // across one decade — a fit artifact, not operator behavior);
    // the quantizer-quality question has its own gates.
    val k = numClusters.toInt
    val quant = new graft.operators.KMeansQuantizer(
      Array.tabulate(k)(c => Array.tabulate(d)(i => unit(c.toLong * d + i))))
    val eps = 0.2
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (avgHalo, tHalo) = timed(
      e.select(avg(size(quant.haloCol($"v", eps)))).head.getDouble(0))
    // cell-population balance: the in-cell pair volume is Σ own·halo per
    // cell, so a fat cell is the quadratic failure mode to surface
    val (cellPop, tAssign) = timed(e.select(quant.cellCol($"v").as("cell"))
      .groupBy($"cell").count()
      .agg(max($"count").as("mx"), avg($"count").as("av")).head)
    val (maxCell, avgCell) = (cellPop.getLong(0), cellPop.getDouble(1))
    // pair volume + eps-match count, separately from the labeling cost
    val (pairStats, tPairs) = timed {
      val p = graft.operators.Dbscan.epsPairsBucketed(e, quant, eps,
        maxAvgHalo = graft.operators.Dbscan.MAX_AVG_HALO)
      p.count()
    }

    val times = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      graft.operators.Dbscan.dbscanBucketed(e, quant, eps, minPts = 4).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"""{"metric":"dbscan_bucketed_clustered","sf":"$sfDir","n":$n,""" +
      s""""cells":$k,"avg_halo":$avgHalo,"clusters":$numClusters,""" +
      s""""max_cell":$maxCell,"avg_cell":$avgCell,""" +
      s""""eps_pairs":$pairStats,"t_halo_scan":$tHalo,""" +
      s""""t_assign_scan":$tAssign,"t_pairs":$tPairs,""" +
      s""""seconds":${times.min}}""")
    spark.stop()
  }
}
