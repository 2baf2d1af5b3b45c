package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Density clustering (DBSCAN) over the embeddings table — an enum
  * entry the reference declares (`src/orm/algorithm.rs:11` `dbscan`)
  * but never dispatches; here it runs Spark-first and oracle-gated.
  *
  * Semantics (sklearn contract): core point iff |N_eps(p)| ≥ minPts
  * counting p itself; clusters = connected components of the core-core
  * eps-graph; border points (non-core with ≥1 core neighbor) join a
  * cluster; the rest are noise (cluster −1). One deviation, documented:
  * sklearn assigns a border point to the FIRST cluster that visits it
  * (scan-order dependent); here it joins the MINIMUM cluster label
  * among its core neighbors — deterministic, so a SQL oracle can replay
  * it. Everything else is exact.
  *
  * Scale shape: the eps-pair generation is the only quadratic stage, so
  * it follows the repo's guard-and-route convention — the exact variant
  * counts the corpus and refuses past `maxRows` (same bound as
  * `nearDupBruteForce`, same broadcast nested-loop plan, left side
  * repartitioned); `dbscanBucketed` is the scale path AND is exact:
  * one join side keeps each point in its OWNER cell, the other
  * replicates into the eps-halo of quantizer cells (`graft_halo_cells`
  * — triangle-inequality guarantee that owner(p) ∈ halo(q) for every
  * eps-pair), so pairs meet via the cell equi-join exactly once, with
  * no dedup shuffle. Work is quadratic per CELL, linear overall with
  * corpus-sized k; the replication factor is O(1) once cells ≫ eps. Everything
  * downstream of the pair list — degrees, core flags, components
  * (O(log d) pointer jumping), border assignment — is map-combinable
  * joins/aggregations at any scale.
  */
object Dbscan {
  private def sqdist(a: Column, b: Column): Column =
    call_function("graft_sqdist", a, b)

  /** Pair list → (vec_id, cluster, is_core); see object doc. `pairs`
    * must hold each undirected eps-edge once as (i < j). */
  private def label(ids: DataFrame, pairs: DataFrame, minPts: Int): DataFrame = {
    val p = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = p.select(col("i").as("id")).union(p.select(col("j").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val core = ids.join(deg, Seq("id"), "left")
      .select(col("id"), (coalesce(col("deg"), lit(0L)) + 1 >= minPts).as("is_core"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val coreIds = core.filter(col("is_core")).select(col("id"))
    val coreEdges = p
      .join(coreIds.withColumnRenamed("id", "i"), "i")
      .join(coreIds.withColumnRenamed("id", "j"), "j")
    val comps = Components.connectedComponents(coreEdges, "i", "j")
    // isolated core points (no core neighbor) are their own cluster
    val coreLab = core.filter(col("is_core"))
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("cluster"))
    // border: min cluster among core neighbors (deterministic rule)
    val nbr = p.select(col("i").as("id"), col("j").as("nb"))
      .union(p.select(col("j").as("id"), col("i").as("nb")))
    val borderLab = core.filter(!col("is_core"))
      .join(nbr, Seq("id"))
      .join(coreLab.select(col("id").as("nb"), col("cluster")), Seq("nb"))
      .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
    val out = core
      .join(coreLab.withColumnRenamed("cluster", "cc"), Seq("id"), "left")
      .join(borderLab.withColumnRenamed("cluster", "bc"), Seq("id"), "left")
      .select(col("id").as("vec_id"),
        coalesce(col("cc"), col("bc"), lit(-1L)).as("cluster"),
        col("is_core"))
      // materialize the (n-row) labeling so the (potentially huge) pair
      // and core caches can be released NOW instead of living for the
      // session — one eager pass over the small output buys the big
      // intermediates back
      .localCheckpoint()
    p.unpersist()
    core.unpersist()
    out
  }

  /** Exact DBSCAN — guarded: the eps-pair scan is O(n²). */
  def dbscan(e: DataFrame, eps: Double, minPts: Int,
      maxRows: Long = Similarity.NEARDUP_MAX_ROWS): DataFrame = {
    val n = e.count()
    require(n <= maxRows,
      s"exact DBSCAN's eps-pair scan is O(n²) ($n rows > $maxRows); use " +
        "dbscanBucketed with a trained quantizer at scale")
    val a = e.repartition(32).select(col("vec_id").as("i"), col("v").as("va"))
    val b = e.select(col("vec_id").as("j"), col("v").as("vb"))
    val pairs = a.join(broadcast(b), col("i") < col("j"))
      .filter(sqdist(col("va"), col("vb")) <= eps * eps)
      .select(col("i"), col("j"))
    label(e.select(col("vec_id").as("id")), pairs, minPts)
  }

  /** Scale-path DBSCAN — EXACT: one join side carries each point's OWNER
    * cell, the other replicates each point into its eps-halo (owner +
    * cells with d(v,c) ≤ d(v,owner) + 2·eps). The halo guarantee is
    * symmetric — owner(p) ∈ halo(q) for EVERY eps-pair — so the
    * one-sided join is already eps-complete, and because the owner cell
    * is unique each pair meets exactly once: no duplicate-collapsing
    * distinct() shuffle, and join input inflates by the halo factor on
    * ONE side instead of both. Identical labels to [[dbscan]] at any
    * quantizer (DbscanSpec equality gate at sf0.01), with in-cell
    * quadratic work instead of a corpus self-join.
    *
    * The (cell, halo) assignment — the expensive k×dim map at scale —
    * is computed ONCE into a persisted frame serving the replication
    * guard and both join sides, released as soon as the labeling stage
    * has checkpointed its output. */
  def dbscanBucketed(e: DataFrame, quant: CoarseQuantizer, eps: Double,
      minPts: Int, maxAvgHalo: Double = MAX_AVG_HALO): DataFrame = {
    val assigned = assignedCells(e, quant, eps)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      requireHaloGuard(assigned, maxAvgHalo)
      label(assigned.select(col("vec_id").as("id")),
        pairsFromAssigned(assigned, eps), minPts)
    } finally { assigned.unpersist(); () }
  }

  private def assignedCells(e: DataFrame, quant: CoarseQuantizer,
      eps: Double): DataFrame =
    e.select(col("vec_id"), col("v"), quant.cellCol(col("v")).as("cell"),
      quant.haloCol(col("v"), eps).as("halo"))

  /** Replication-factor guard: one cheap agg pass. Null-safe — an empty
    * (or all-null-vector) corpus has no replication to guard against. */
  private def requireHaloGuard(assigned: DataFrame, maxAvgHalo: Double): Unit = {
    val row = assigned.agg(avg(size(col("halo")))).head
    val avgHalo = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    require(avgHalo <= maxAvgHalo,
      f"eps-halo replication averages $avgHalo%.1f cells/point (quantizer " +
        f"cells are not >> eps for this corpus geometry), so the bucketed " +
        f"plan degenerates toward k*n^2; coarsen the quantizer (smaller k), " +
        f"shrink eps, or use the guarded exact dbscan / ANN near-dup " +
        f"operators instead")
  }

  private def pairsFromAssigned(assigned: DataFrame, eps: Double): DataFrame = {
    val a = assigned.select(col("vec_id").as("i"), col("v").as("va"), col("cell"))
    val b = assigned.select(col("vec_id").as("j"), col("v").as("vb"),
      explode(col("halo")).as("cell"))
    a.join(b, Seq("cell")).filter(col("i") < col("j"))
      .filter(sqdist(col("va"), col("vb")) <= eps * eps)
      .select(col("i"), col("j"))
  }

  /** Mean halo cells per point above which the bucketed plan has
    * degenerated: work scales with Σ_cell |cell|², and replication ≈ k
    * means every cell holds every point — k·n²/2, WORSE than the exact
    * scan. Measured on the synthetic embeddings: 64-dim distance
    * concentration puts every centroid within d_min + 2·eps of every
    * point, so avg halo = k exactly. The guard routes such geometries
    * to the guarded exact variant or the ANN operators instead of
    * silently melting. */
  val MAX_AVG_HALO = 4.0

  /** The eps-COMPLETE candidate-pair stage of [[dbscanBucketed]] —
    * public so the plan audit can assert the halo-cell equi-join shape
    * before the labeling stage's checkpoint collapses the lineage.
    * GUARDED on the measured replication factor (one cheap agg pass).
    * Lazy (no caching) so the audited plan is the raw lineage;
    * [[dbscanBucketed]] wraps the same stages around a persisted
    * assignment frame. */
  def epsPairsBucketed(e: DataFrame, quant: CoarseQuantizer, eps: Double,
      maxAvgHalo: Double = MAX_AVG_HALO): DataFrame = {
    val assigned = assignedCells(e, quant, eps)
    requireHaloGuard(assigned, maxAvgHalo)
    pairsFromAssigned(assigned, eps)
  }

  /** Gate: eps picked at the ~1% pairwise-distance quantile of the
    * synthetic embeddings (≈1.2) so the eps-graph has mean degree ~5 —
    * real cluster/border/noise structure, not a degenerate labeling. */
  def sim_dbscan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    dbscan(e, eps = 1.2, minPts = 4).orderBy($"vec_id")
  }

  /** The SCALE path under the ORACLE: `dbscanBucketed` with a trained,
    * corpus-sized quantizer must reproduce the exact labeling, so it
    * gates hash-exact against the SAME recursive-CTE oracle as
    * `sim_dbscan`. DuckDB never sees the quantizer — this gate passing
    * is the eps-halo exactness proof replayed at every sf, not just the
    * spec's fixed corpus. */
  def sim_dbscan_bucketed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val n = e.count()
    // the halo guarantees exact output for ANY centroids, so the gate
    // fits its quantizer CHEAPLY (bounded sample, few iterations) and
    // COARSELY (large target cells): on this corpus's 64-dim geometry
    // the replication guard caps how fine the cells can usefully be —
    // cell-balance quality only moves the constant factor, never labels
    val q = KMeansQuantizer.fit(e,
      KMeansQuantizer.chooseK(n, targetCellRows = 1000L),
      sampleFraction = math.min(1.0, 2000.0 / math.max(n, 1L)), maxIter = 5)
    dbscanBucketed(e, q, eps = 1.2, minPts = 4).orderBy($"vec_id")
  }

  val simDbscanSql: String = {
    val d = "list_sum(list_transform(range(1, len(a.v) + 1), k -> (a.v[k] - b.v[k]) * (a.v[k] - b.v[k])))"
    s"""WITH RECURSIVE e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |p AS (
       |  SELECT a.vec_id AS i, b.vec_id AS j
       |  FROM e a JOIN e b ON a.vec_id < b.vec_id AND $d <= 1.2 * 1.2),
       |deg AS (
       |  SELECT id, count(*) AS deg FROM (
       |    SELECT i AS id FROM p UNION ALL SELECT j AS id FROM p) u
       |  GROUP BY id),
       |core AS (
       |  SELECT e.vec_id AS id, coalesce(deg.deg, 0) + 1 >= 4 AS is_core
       |  FROM e LEFT JOIN deg ON e.vec_id = deg.id),
       |ce AS (
       |  SELECT p.i, p.j FROM p
       |  JOIN core ci ON ci.id = p.i AND ci.is_core
       |  JOIN core cj ON cj.id = p.j AND cj.is_core),
       |und AS (SELECT i AS v, j AS u FROM ce UNION ALL SELECT j AS v, i AS u FROM ce),
       |reach AS (
       |  SELECT v, v AS u FROM (SELECT DISTINCT v FROM und) n
       |  UNION
       |  SELECT r.v, e2.u FROM reach r JOIN und e2 ON e2.v = r.u),
       |comps AS (SELECT v AS id, min(u) AS comp FROM reach GROUP BY v),
       |corelab AS (
       |  SELECT c.id, coalesce(comps.comp, c.id) AS cluster
       |  FROM core c LEFT JOIN comps ON comps.id = c.id
       |  WHERE c.is_core),
       |nbr AS (SELECT i AS id, j AS nb FROM p UNION ALL SELECT j AS id, i AS nb FROM p),
       |borderlab AS (
       |  SELECT c.id, min(cl.cluster) AS cluster
       |  FROM core c JOIN nbr ON nbr.id = c.id
       |  JOIN corelab cl ON cl.id = nbr.nb
       |  WHERE NOT c.is_core
       |  GROUP BY c.id)
       |SELECT c.id AS vec_id,
       |  CAST(coalesce(cl.cluster, bl.cluster, -1) AS BIGINT) AS cluster,
       |  c.is_core
       |FROM core c
       |LEFT JOIN corelab cl ON cl.id = c.id
       |LEFT JOIN borderlab bl ON bl.id = c.id
       |ORDER BY vec_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_dbscan" -> sim_dbscan _,
    "sim_dbscan_bucketed" -> sim_dbscan_bucketed _)

  val oracles: Map[String, String] = Map(
    "sim_dbscan" -> simDbscanSql,
    "sim_dbscan_bucketed" -> simDbscanSql)
}
