package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]` column).
  *
  * - sim_topk_cosine: brute-force exact top-k — the correctness baseline.
  *   At cluster scale this is a broadcast of the (small) query set against
  *   a partitioned scan of the corpus: no shuffle of the corpus at all;
  *   per-partition top-k then a tiny final merge (Spark's TakeOrdered).
  * - sim_neardup_cosine: threshold self-join — embedding near-dup dedup.
  * - sim_ann_lsh: random-hyperplane LSH (8-bit signatures) — the scale
  *   path: candidates meet via an equi-join on the bucket id, turning
  *   O(n²) scoring into per-bucket work, the standard ANN shuffle shape.
  *
  * FP parity with the oracle: all cosine math is double, computed as a
  * strict left-to-right fold from identical float inputs; hyperplanes
  * are closed-form LCG arithmetic (no RNG state) so DuckDB replays them
  * bit-for-bit.
  *
  * The folds run through the native codegen expressions
  * `graft.functions.DotProduct`/`SumSqDiff` — bit-identical to the
  * `aggregate(zip_with(...))` HOF form but inside whole-stage codegen:
  * the HOF form evaluates an interpreted lambda per element per pair,
  * which made the O(n²) near-dup scan the top bench line (31 s → ~1 s
  * at sf0.1 from this swap alone).
  */
object Similarity {
  /** dot(a, b) as a strict left-to-right double fold (native codegen). */
  private def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** Σ (a−b)² as a strict left-to-right double fold (native codegen). */
  private def sqdist(a: Column, b: Column): Column =
    call_function("graft_sqdist", a, b)

  /** Embeddings with doubled vectors and precomputed L2 norm. */
  /** One dim probe per (dir, JVM): the closed-form LCG twins (LSH
    * planes, IVF cells, kNN grid) hard-code a 64-stride in BOTH the
    * Spark arithmetic and the DuckDB oracles. On a regenerated corpus
    * with a different dim, `graft_dot(v, 64-dim-plane)` would go NULL
    * on the Spark side while the oracle computes real sums — a silent
    * divergence (and a silent single-bucket LSH). Fail loudly instead;
    * the trained-quantizer and PQ paths adapt to any dim. */
  private val checkedDims = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private[operators] def emb(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val df = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot($"v", $"v")))
    checkedDims.computeIfAbsent(dir, _ => {
      df.select(size($"v")).limit(1).collect().headOption.foreach { r =>
        require(r.getInt(0) == 64,
          s"embeddings at $dir have dim ${r.getInt(0)}; the LCG oracle-twin " +
            "arithmetic (LSH planes / IVF cells / kNN grid) is pinned to 64 " +
            "dims on both engines — regenerate the oracles for the new dim")
      }
      64
    })
    df
  }

  private val embSqlCte =
    """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |      FROM embeddings),
      |n AS (SELECT vec_id, v,
      |        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      |      FROM e)""".stripMargin

  /** Exact top-5 cosine neighbors for query vectors vec_id < 10. */
  def sim_topk_cosine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"v".as("vq"), $"nrm".as("nq"))
    val c = e.select($"vec_id".as("cid"), $"v".as("vc"), $"nrm".as("nc"))
    val scored = broadcast(q).join(c, $"qid" =!= $"cid")
      .withColumn("cos", dot($"vq", $"vc") / ($"nq" * $"nc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"cos".desc, $"cid")
    scored.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"qid", $"cid", $"cos", $"rn".cast("long").as("rank"))
      .orderBy($"qid", $"rank")
  }

  val simTopkSql: String =
    s"""WITH $embSqlCte,
       |pairs AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))
       |      / (q.nrm * c.nrm) AS cos
       |  FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id != q.vec_id)
       |SELECT qid, cid, cos, CAST(rn AS BIGINT) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
       |  FROM pairs) t
       |WHERE rn <= 5 ORDER BY qid, rank""".stripMargin

  /** Rows above which the brute-force near-dup refuses to run: the plan
    * broadcasts the whole corpus into a nested-loop join — O(n²) compute
    * plus a driver/executor-memory broadcast — so past this bound the
    * bucketed paths (`sim_ann_lsh`, `sim_ann_ivf`) are the answer. */
  val NEARDUP_MAX_ROWS = 200000L

  /** Exact embedding-cosine near-duplicate pairs over a small corpus.
    * GUARDED: counts the corpus first and errors past `maxRows`, routing
    * callers to the LSH/IVF ANN operators — the all-pairs baseline is a
    * correctness oracle, not a scale path. */
  def nearDupBruteForce(e: DataFrame, threshold: Double,
      maxRows: Long = NEARDUP_MAX_ROWS): DataFrame = {
    val n = e.count()
    require(n <= maxRows,
      s"brute-force cosine near-dup is O(n²) and broadcasts the corpus " +
        s"($n rows > $maxRows); use sim_ann_lsh or sim_ann_ivf instead")
    // left side repartitioned: the corpus arrives as one parquet file =
    // one partition, which would serialize the O(n²) scoring loop; the
    // right side stays broadcast (nested-loop join with a tiny build).
    val a = e.repartition(32).select(col("vec_id").as("da"),
      col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("db"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(broadcast(b), col("da") < col("db"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("da"), col("db"), col("cos"))
  }

  /** Gate query: threshold 0.45 over the sf corpus. */
  def sim_neardup_cosine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    nearDupBruteForce(emb(s, dir), 0.45).orderBy($"da", $"db")
  }

  val simNeardupSql: String =
    s"""WITH $embSqlCte
       |SELECT a.vec_id AS da, b.vec_id AS db,
       |  list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
       |    / (a.nrm * b.nrm) AS cos
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
       |    / (a.nrm * b.nrm) >= 0.45
       |ORDER BY da, db""".stripMargin

  // --------------------------------------------------------------- LSH ANN
  private val NUM_PLANES = 8

  /** Deterministic pseudo-random hyperplane r(k) ∈ [-0.5, 0.5)^64 —
    * the SAME closed-form LCG grid the IVF gate quantizer uses
    * ([[LcgQuantizer.centroid]]); one definition so the oracle
    * arithmetic cannot drift between the LSH and IVF twins. */
  private def plane(k: Int): Seq[Double] = LcgQuantizer.centroid(k)

  private def sigCol(v: Column): Column =
    (0 until NUM_PLANES).map { k =>
      when(dot(v, typedlit(plane(k))) > 0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  private val sigSql: String = {
    val r = s"(CAST((1103515245 * (k * 64 + (i - 1)) + 12345) % 2147483648 AS DOUBLE) / 2147483648.0 - 0.5)"
    s"""(SELECT vec_id,
       |   CAST(sum(CASE WHEN list_sum(list_transform(range(1, len(v) + 1),
       |     i -> v[i] * $r)) > 0
       |     THEN (1::BIGINT << k) ELSE 0 END) AS BIGINT) AS sig
       | FROM e, (SELECT unnest(range(0, $NUM_PLANES)) AS k) ks
       | GROUP BY vec_id)""".stripMargin
  }

  /** LSH-bucketed approximate top-3: candidates = same 8-bit hyperplane
    * signature bucket; exact cosine within the bucket. */
  def sim_ann_lsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).withColumn("sig", sigCol($"v"))
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"v".as("vq"), $"nrm".as("nq"), $"sig")
    val c = e.select($"vec_id".as("cid"), $"v".as("vc"), $"nrm".as("nc"), $"sig")
    val scored = q.join(c, Seq("sig")).filter($"qid" =!= $"cid")
      .withColumn("cos", dot($"vq", $"vc") / ($"nq" * $"nc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"cos".desc, $"cid")
    scored.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"qid", $"sig", $"cid", $"cos", $"rn".cast("long").as("rank"))
      .orderBy($"qid", $"rank")
  }

  val simAnnSql: String =
    s"""WITH $embSqlCte,
       |sg AS $sigSql,
       |ns AS (SELECT n.vec_id, v, nrm, sig FROM n JOIN sg ON n.vec_id = sg.vec_id),
       |pairs AS (
       |  SELECT q.vec_id AS qid, q.sig AS sig, c.vec_id AS cid,
       |    list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))
       |      / (q.nrm * c.nrm) AS cos
       |  FROM ns q JOIN ns c ON q.sig = c.sig AND q.vec_id < 10 AND c.vec_id != q.vec_id)
       |SELECT qid, sig, cid, cos, CAST(rn AS BIGINT) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
       |  FROM pairs) t
       |WHERE rn <= 3 ORDER BY qid, rank""".stripMargin

  // --------------------------------------------------------------- IVF ANN
  /** IVF-style ANN, generic in the coarse quantizer: cells partition the
    * corpus; queries probe their `nprobe` nearest cells and rank by
    * exact cosine. The inverted-file shape at scale: the corpus is
    * PARTITIONED by cell id (a real deployment writes it partitioned/
    * bucketed by cell), so a probe touches 1/k of the data and
    * candidates meet via the cell equi-join, never a cross join. The
    * probe list explodes QUERY-side only; the corpus keeps its single
    * map-computed cell. Gates run [[LcgQuantizer]] (DuckDB-replayable);
    * the scale path is a trained [[KMeansQuantizer]] with k sized to
    * bound cell population. */
  def annIvf(e: DataFrame, quant: CoarseQuantizer, queryPred: Column,
      topK: Int = 3, nprobe: Int = 1): DataFrame = {
    val probes =
      if (nprobe == 1)
        e.filter(queryPred).withColumn("cell", quant.cellCol(col("v")))
      else
        e.filter(queryPred)
          .withColumn("cell", explode(quant.probeCol(col("v"), nprobe)))
    val q = probes.select(col("vec_id").as("qid"), col("v").as("vq"),
      col("nrm").as("nq"), col("cell"))
    val c = e.withColumn("cell", quant.cellCol(col("v")))
      .select(col("vec_id").as("cid"), col("v").as("vc"),
        col("nrm").as("nc"), col("cell"))
    val scored = q.join(c, Seq("cell")).filter(col("qid") =!= col("cid"))
      .withColumn("cos", dot(col("vq"), col("vc")) / (col("nq") * col("nc")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("qid"), col("cell"), col("cid"), col("cos"),
        col("rn").cast("long").as("rank"))
  }

  def sim_ann_ivf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    annIvf(emb(s, dir), LcgQuantizer, col("vec_id") < 10)
      .orderBy($"qid", $"rank")
  }

  /** DuckDB spelling of ||v − centroid(k)||² against the shared LCG
    * grid — ONE definition for the IVF / probe2 / kNN-graph oracles so
    * the closed-form constants cannot drift between them (the Spark
    * side likewise routes through [[LcgQuantizer.centroid]]). */
  private def lcgSqDistSql(k: Int): String =
    s"""list_sum(list_transform(range(1, len(v) + 1),
       |  i -> (v[i] - (CAST((1103515245 * ($k * 64 + (i - 1)) + 12345) % 2147483648 AS DOUBLE)
       |    / 2147483648.0 - 0.5))
       |    * (v[i] - (CAST((1103515245 * ($k * 64 + (i - 1)) + 12345) % 2147483648 AS DOUBLE)
       |    / 2147483648.0 - 0.5))))""".stripMargin

  /** SemDeDup — semantic deduplication via embedding clusters (Abbas,
    * Tirumala, Simig, Ganguli & Morcos, "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication", 2023):
    * embeddings cluster into quantizer cells, cosine pairs above `tau`
    * form only WITHIN a cell (the paper's within-cluster restriction —
    * exactly what makes web-scale semantic dedup tractable: the pair
    * space is Σ cellRows², never n²), connected components group the
    * transitive semantic duplicates, and each group keeps its minimum
    * id. One row per vector: (vec_id, group_id, status) with status ∈
    * unique | canonical | duplicate — the keep-list is
    * status != 'duplicate' (the [[Components.dd_keep_list]] decision
    * table, on meaning instead of text).
    *
    * 100 TB shape: the cell self-join is the DBSCAN family's bounded
    * equi-join (per-cell work capped by targetCellRows when the
    * quantizer is trained via chooseK — the gate's LCG quantizer is the
    * oracle-replayable twin, the trained entry is the scale path), CC
    * is the shared frontier fixpoint, and the verdict is one
    * corpus-sized left join. Cosine math is the codegen graft_dot fold
    * from identical float inputs — bit-equal in DuckDB. */
  /** The ≥tau cosine pairs that share a quantizer cell — SemDeDup's
    * bounded pair space, shared by the dedup itself and the trained
    * gate's recall floor (which replays it on the LCG reference grid).
    * `nprobe > 1` assigns each vector to its `nprobe` nearest cells
    * (the multi-probe/halo trick): a pair is found when the cell SETS
    * intersect, which recovers the near-duplicate pairs a hard
    * assignment cuts at cell boundaries — measured 0.38 → 0.90 recall
    * at sf0.1 for the trained gate — at a ≤ nprobe² fan-out factor. */
  /** `maxFanout` caps the TOTAL within-cell pair space — right for the
    * fixed-cell oracle quantizers, whose pair space growing with the
    * corpus IS the failure to refuse. `maxPairsPerRow > 0` replaces it
    * with the SCALE-FREE guard for trained chooseK quantizers: their
    * total pair volume legitimately grows linearly (cells ∝ corpus at
    * bounded population), so an absolute cap wrongly refuses a healthy
    * linear route at some fixed scale (measured: the 80M cap tripped
    * the 100× decade at a steady ~500 candidates/row), while
    * candidates-per-row IN THE FATTEST CELL (max cell population) is
    * the quantity that actually signals the quadratic failure mode at
    * ANY corpus size — the corpus-wide mean dilutes a single fat cell
    * (ADVICE r18). */
  private def withinCellPairs(e: DataFrame, quant: CoarseQuantizer,
      tau: Double, maxFanout: Long, nprobe: Int = 1,
      probeRatio: Double = 0.0, maxPairsPerRow: Double = 0.0): DataFrame = {
    import e.sparkSession.implicits._
    // probeRatio ∈ (0,1) takes precedence: ADAPTIVE 2-probe — only
    // vectors in the boundary band (owner distance within ratio of the
    // runner-up) pay the second cell's fan-out; interior vectors keep
    // the single hard assignment. Near-duplicate pairs live at small
    // distance, so a boundary-crossing pair has both ends in the band —
    // the recall-carrying probes survive while interior fan-out
    // (most of a CLUSTERED corpus) is skipped.
    val multiProbe = probeRatio > 0.0 || nprobe > 1
    val assigned =
      if (probeRatio > 0.0)
        e.withColumn("cell", explode(quant.probeAdaptiveCol($"v", probeRatio)))
      else if (nprobe > 1) e.withColumn("cell", explode(quant.probeCol($"v", nprobe)))
      else e.withColumn("cell", quant.cellCol($"v"))
    // assign ONCE: the frame below is consumed three times (fan-out
    // guard + both join sides), and a trained quantizer's assignment
    // is O(numCells·d) per row — the "assign once, fan out" discipline
    // KMeansQuantizer's scaladoc prescribes. Cheap closed-form
    // quantizers (the 4-cell LCG grid) recompute instead of paying a
    // fat-vector checkpoint write (cheapAssignment contract).
    val cells =
      if (quant.cheapAssignment) assigned else assigned.localCheckpoint()
    // fan-out guard, same discipline as ngramJaccardPairs: the
    // within-cell pair space is Σ cellRows² of KB-sized vector rows —
    // a FIXED-cell quantizer (the LCG oracle twin) goes quadratic as
    // the corpus grows, so compute the actual fan-out in one tiny agg
    // and refuse past the cap instead of melting the join; the trained
    // chooseK quantizer bounds cellRows and stays linear (the scale
    // path, measured in SCALE.md).
    val fanStats = cells.groupBy($"cell").agg(count(lit(1)).as("n"))
      .agg(coalesce(sum($"n" * $"n"), lit(0L)).as("fan"),
        coalesce(max($"n"), lit(0L)).as("maxCell")).head()
    val fanout = fanStats.getLong(0)
    val maxCell = fanStats.getLong(1)
    if (maxPairsPerRow > 0.0) {
      // guard the MAX cell population, not the corpus-wide mean
      // (ADVICE r18): a row in a cell of population n scores n
      // candidates, and averaging sum(n²)/sum(n) dilutes one fat cell
      // below the cap at large N — at 1e8 rows a 300k-row cell
      // (~4.5e10 within-cell pairs) reads ~900 mean candidates/row and
      // would pass. max(n) is the per-row candidate count in the
      // worst cell; it trips on that cell at ANY corpus size while
      // still admitting linear total-volume growth.
      require(maxCell <= maxPairsPerRow,
        f"semanticDedup's fattest cell holds $maxCell%d rows — every row " +
          f"there scores $maxCell%d candidate pairs (> ${maxPairsPerRow}%.0f); " +
          "a cell population far above the chooseK target; refit the " +
          "quantizer (fat cells are the quadratic failure mode; TOTAL " +
          "volume growing with the corpus is expected and linear)")
    } else require(fanout <= maxFanout,
      s"semanticDedup would score $fanout within-cell pairs (> $maxFanout); " +
        "use a trained quantizer sized by KMeansQuantizer.chooseK " +
        "(bounded cell population) as dd_semantic_dedup_trained does")
    val a = cells.select($"cell", $"vec_id".as("da"), $"v".as("va"), $"nrm".as("na"))
    val b = cells.select($"cell", $"vec_id".as("db"), $"v".as("vb"), $"nrm".as("nb"))
    val raw = a.join(b, Seq("cell")).filter($"da" < $"db")
      .filter(dot($"va", $"vb") / ($"na" * $"nb") >= tau)
      .select($"da", $"db")
    // multi-probe can find one pair in two shared cells
    if (multiProbe) raw.distinct() else raw
  }

  /** The LCG-grid ≥tau cosine pair set keyed by embedding id — the
    * SQL-replayable semantic-duplicate edges the curation pipeline's
    * semantic stage consumes (vec_id ↔ doc_id in the driver's data
    * model). Same arithmetic as [[dd_semantic_dedup]]'s pair stage. */
  def semanticPairsLcg(s: SparkSession, dir: String, tau: Double): DataFrame =
    withinCellPairs(emb(s, dir), LcgQuantizer, tau, 20000000L)

  /** The trained-quantizer twin of [[semanticPairsLcg]] — the pair set
    * the curation pipeline's semantic stage uses at SCALE: chooseK
    * bounds cell population as the corpus grows (the LCG grid is a
    * fixed 4 cells, so its pair space goes quadratic and its fan-out
    * guard correctly refuses past ~10k vectors — measured at the 10×
    * corpus), with the adaptive boundary-band probe recovering
    * cell-boundary pairs. Same trimmed fit as the dd trained gate. */
  def semanticPairsTrained(s: SparkSession, dir: String, tau: Double): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).localCheckpoint()
    val n = e.count()
    val quant = KMeansQuantizer.fitSampled(e,
      KMeansQuantizer.chooseK(n, targetCellRows = 250L), n, maxIter = 10,
      pointsPerCell = 192)
    withinCellPairs(e, quant, tau, maxFanout = Long.MaxValue,
      probeRatio = 0.5, maxPairsPerRow = 4000.0)
  }

  def semanticDedup(s: SparkSession, e: DataFrame, quant: CoarseQuantizer,
      tau: Double, maxFanout: Long = 20000000L, nprobe: Int = 1,
      probeRatio: Double = 0.0, maxPairsPerRow: Double = 0.0): DataFrame = {
    import s.implicits._
    val pairs = withinCellPairs(e, quant, tau, maxFanout, nprobe, probeRatio,
      maxPairsPerRow)
    val labels = Components.connectedComponents(pairs, "da", "db")
      .select($"id".as("vec_id"), $"comp".as("group_id"))
    e.select($"vec_id").join(labels, Seq("vec_id"), "left")
      .select($"vec_id", coalesce($"group_id", $"vec_id").as("group_id"),
        when($"group_id".isNull, lit("unique"))
          .when($"group_id" === $"vec_id", lit("canonical"))
          .otherwise(lit("duplicate")).as("status"))
  }

  def dd_semantic_dedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    semanticDedup(s, emb(s, dir), LcgQuantizer, 0.45).orderBy($"vec_id")
  }

  /** The trained-quantizer scale path (SemDeDup proper clusters with
    * k-means; k sized so cell population — and hence the within-cell
    * pair space — stays bounded as the corpus grows). k-means is not
    * ANSI-SQL-expressible → rows-only gate; the hash-exact twin is
    * [[dd_semantic_dedup]] (LCG cells) and QuantizerSpec owns the
    * cell-population contract. */
  /** The trained-gate body, parametrized on the probe policy so the
    * gate and the measurement harness (graft.tools.KnnRecall) share one
    * implementation: returns the deduped output (checkpointed) and its
    * measured duplicate recall vs the LCG-grid truth. */
  def trainedSemanticDedupWithRecall(s: SparkSession, dir: String,
      nprobe: Int, probeRatio: Double): (DataFrame, Double) = {
    import s.implicits._
    // the gate consumes the corpus ~6 times (count, fit sample, cell
    // assignment, verdict join, truth base, fan-out guard) — pin one
    // materialization instead of six parquet-scan jobs
    val e = emb(s, dir).localCheckpoint()
    val n = e.count()
    // Multi-probe assignment: HARD k-means assignment cuts
    // near-duplicate pairs at cell boundaries — measured recall vs the
    // LCG-grid truth was 0.38 at sf0.1 with nprobe=1; the 2-probe halo
    // recovers them (0.81 at sf0.1, 1.0 at sf0.01). Since r16 the gate
    // probes ADAPTIVELY (probeRatio 0.5): only boundary-band vectors
    // pay the second cell, recovering part of the honest 1.83× the r15
    // recall fix cost while the measured recall holds (VERDICT r15
    // item 8). targetCellRows stays halved at 250 so the EFFECTIVE
    // probed population per cell keeps the pre-probe pair-space bound,
    // and per-vector candidate work stays a corpus-size-independent
    // constant (the SemDeDup cost profile).
    // maxIter 10 (down from the 20 default): a COARSE quantizer only
    // needs cells good enough that near-dup pairs co-bucket — the
    // inline recall floor below measures exactly that, and it is
    // unchanged at 10 iterations while the fit time halves
    val quant = KMeansQuantizer.fitSampled(e,
      KMeansQuantizer.chooseK(n, targetCellRows = 250L), n, maxIter = 10,
      pointsPerCell = 192)
    // trained chooseK path → the SCALE-FREE per-row guard (r18): total
    // pair volume grows linearly with the corpus by design; what must
    // stay bounded is candidates per row (~500 measured at every
    // decade; 4000 trips a fat-cell pathology at any scale)
    val out = semanticDedup(s, e, quant, 0.45, maxFanout = Long.MaxValue,
      nprobe = nprobe, probeRatio = probeRatio,
      maxPairsPerRow = 4000.0).localCheckpoint()
    // Inline quality floor (VERDICT r14 item 5): duplicate-RECALL
    // against the LCG reference grid's exact within-cell ≥tau pair set
    // (the hash-exact twin's own truth — bounded by the same fan-out
    // guard). A truth pair is recalled when the trained dedup put both
    // ends in one group. Measured at the gate's two operating scales:
    // 1.0 at sf0.01, 0.81 at sf0.1 — while the nprobe=1 boundary-miss
    // regression mode measures 0.38, so 0.6 separates healthy from
    // broken (k-means, cosine, CC, probe) with margin on both sides.
    // Gate-quality work, not serving: one LCG pair join + two
    // label joins against the checkpointed output. The LCG grid is
    // FIXED-cell, so its pair space grows quadratically with the
    // corpus — past the cap the truth set is computed on a
    // deterministic vec_id stride subsample sized to bring the
    // fan-out back under it (recall over a uniform pair subsample,
    // same floor semantics, corpus-scale-safe).
    val lcgCap = 20000000L
    val lcgFan = e.withColumn("cell", LcgQuantizer.cellCol($"v"))
      .groupBy($"cell").agg(count(lit(1)).as("n"))
      .agg(coalesce(sum($"n" * $"n"), lit(0L))).head().getLong(0)
    val stride = math.max(1L,
      math.ceil(math.sqrt(lcgFan.toDouble / lcgCap)).toLong)
    val truthBase = if (stride == 1L) e else e.filter($"vec_id" % stride === 0)
    // checkpoint: the truth set is pair-id-sized and is consumed twice
    // (count + recall join) — one brute pass, not two
    val truth = withinCellPairs(truthBase, LcgQuantizer, 0.45, 2 * lcgCap)
      .localCheckpoint()
    val lbl = out.select($"vec_id", $"group_id")
    val total = truth.count()
    val recalled =
      if (total == 0L) 0L
      else truth
        .join(lbl.select($"vec_id".as("da"), $"group_id".as("ga")), Seq("da"))
        .join(lbl.select($"vec_id".as("db"), $"group_id".as("gb")), Seq("db"))
        .filter($"ga" === $"gb").count()
    val recall = if (total == 0L) 1.0 else recalled.toDouble / total
    (out, recall)
  }

  def dd_semantic_dedup_trained(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Adaptive boundary-band probe (ratio 0.5): measured recall 1.0 at
    // sf0.01 / 0.81 at sf0.1 — identical to full 2-probe on this
    // corpus — while only band vectors pay the probe fan-out. Floor =
    // measured-minus-margin (VERDICT r19 item 3): 0.7 sits ~0.1 under
    // the worst measured value and still clears the 0.38 nprobe=1
    // boundary-miss mode with margin on both sides.
    val (out, recall) = trainedSemanticDedupWithRecall(s, dir,
      nprobe = 1, probeRatio = 0.5)
    if (recall >= 0.7) out.orderBy($"vec_id") else out.limit(0)
  }

  /** Semantic decontamination — the embedding-space analogue of the
    * shingle pass (dd_contamination): flag every corpus vector whose
    * cosine to ANY benchmark vector sharing a quantizer cell clears
    * `tau`. The pass modern pipelines run against eval benchmarks
    * before training (same within-cell restriction as SemDeDup keeps
    * the pair space bounded; a trained chooseK quantizer is the scale
    * path, the LCG grid the oracle twin). Benchmark side is
    * benchmark-sized → BROADCAST; the corpus never shuffles — per-cell
    * candidate work is benchmark-bounded, one map-side join + one
    * map-combinable agg at any corpus size. */
  def semanticContamination(s: SparkSession, corpus: DataFrame,
      benchmark: DataFrame, quant: CoarseQuantizer, tau: Double): DataFrame = {
    import s.implicits._
    val c = corpus.withColumn("cell", quant.cellCol($"v"))
      .select($"cell", $"vec_id", $"v", $"nrm")
    val b = benchmark.withColumn("cell", quant.cellCol($"v"))
      .select($"cell", $"vec_id".as("bid"), $"v".as("vb"), $"nrm".as("nb"))
    val hits = c.join(broadcast(b), Seq("cell"))
      .withColumn("cos", dot($"v", $"vb") / ($"nrm" * $"nb"))
      .filter($"cos" >= tau)
      .groupBy($"vec_id")
      .agg(count(lit(1)).as("n_hits"), max($"cos").as("max_cos"))
    corpus.select($"vec_id").join(hits, Seq("vec_id"), "left")
      .select($"vec_id", coalesce($"n_hits", lit(0L)).as("n_hits"),
        $"max_cos", $"n_hits".isNotNull.as("contaminated"))
  }

  /** Gate: benchmark = vectors 0..19, corpus = the rest, LCG cells. */
  def dd_semantic_contamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    semanticContamination(s, e.filter($"vec_id" >= 20),
      e.filter($"vec_id" < 20), LcgQuantizer, 0.45).orderBy($"vec_id")
  }

  val ddSemanticContaminationSql: String = {
    def d(k: Int) = lcgSqDistSql(k)
    s"""WITH $embSqlCte,
       |cells AS (
       |  SELECT n.vec_id, v, nrm,
       |    CAST(CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN 0
       |         WHEN d1 <= d2 AND d1 <= d3 THEN 1
       |         WHEN d2 <= d3 THEN 2 ELSE 3 END AS BIGINT) AS cell
       |  FROM (SELECT vec_id, v, nrm, ${d(0)} AS d0, ${d(1)} AS d1,
       |          ${d(2)} AS d2, ${d(3)} AS d3 FROM n) n),
       |hits AS (
       |  SELECT c.vec_id, CAST(count(*) AS BIGINT) AS n_hits,
       |    max(list_sum(list_transform(range(1, len(c.v) + 1), i -> c.v[i] * b.v[i]))
       |      / (c.nrm * b.nrm)) AS max_cos
       |  FROM (SELECT * FROM cells WHERE vec_id >= 20) c
       |  JOIN (SELECT * FROM cells WHERE vec_id < 20) b ON c.cell = b.cell
       |  WHERE list_sum(list_transform(range(1, len(c.v) + 1), i -> c.v[i] * b.v[i]))
       |      / (c.nrm * b.nrm) >= 0.45
       |  GROUP BY c.vec_id),
       |corp AS (SELECT vec_id FROM n WHERE vec_id >= 20)
       |SELECT corp.vec_id, coalesce(h.n_hits, 0) AS n_hits, h.max_cos,
       |  h.n_hits IS NOT NULL AS contaminated
       |FROM corp LEFT JOIN hits h ON h.vec_id = corp.vec_id
       |ORDER BY corp.vec_id""".stripMargin
  }

  /** CTE chain (e, n, scells, sempairs) defining the LCG-cell >= 0.45
    * cosine pair set in SQL — ONE definition shared by
    * [[ddSemanticDedupSql]] and the curation-pipeline oracle
    * ([[Curation.dsCurationSql]]), names prefixed so they compose with
    * the minhash CTEs without collision. */
  val semanticPairsSqlCte: String = semanticPairsSqlCteAt(0.45)

  /** The same pair CTE at a caller-chosen cosine threshold — the
    * full-rule curation oracle runs its semantic stage at a lower tau
    * so the stage stays discriminating on its enriched pool. */
  private[operators] def semanticPairsSqlCteAt(tau: Double): String = {
    def d(k: Int) = lcgSqDistSql(k)
    s"""$embSqlCte,
       |scells AS (
       |  SELECT n.vec_id, v, nrm,
       |    CAST(CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN 0
       |         WHEN d1 <= d2 AND d1 <= d3 THEN 1
       |         WHEN d2 <= d3 THEN 2 ELSE 3 END AS BIGINT) AS cell
       |  FROM (SELECT vec_id, v, nrm, ${d(0)} AS d0, ${d(1)} AS d1,
       |          ${d(2)} AS d2, ${d(3)} AS d3 FROM n) n),
       |sempairs AS (
       |  SELECT a.vec_id AS da, b.vec_id AS db
       |  FROM scells a JOIN scells b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
       |      / (a.nrm * b.nrm) >= $tau)""".stripMargin
  }

  val ddSemanticDedupSql: String = {
    s"""WITH RECURSIVE $semanticPairsSqlCte,
       |und AS (SELECT da AS v, db AS u FROM sempairs
       |        UNION ALL SELECT db AS v, da AS u FROM sempairs),
       |reach AS (
       |  SELECT v, v AS u FROM (SELECT DISTINCT v FROM und) nn
       |  UNION
       |  SELECT r.v, e2.u FROM reach r JOIN und e2 ON e2.v = r.u),
       |comps AS (SELECT v AS vec_id, min(u) AS group_id FROM reach GROUP BY v)
       |SELECT n.vec_id,
       |  coalesce(c.group_id, n.vec_id) AS group_id,
       |  CASE WHEN c.group_id IS NULL THEN 'unique'
       |       WHEN c.group_id = n.vec_id THEN 'canonical'
       |       ELSE 'duplicate' END AS status
       |FROM n LEFT JOIN comps c ON c.vec_id = n.vec_id
       |ORDER BY n.vec_id""".stripMargin
  }

  val simIvfSql: String = {
    def d(k: Int) = lcgSqDistSql(k)
    s"""WITH $embSqlCte,
       |cells AS (
       |  SELECT n.vec_id, v, nrm,
       |    CAST(CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN 0
       |         WHEN d1 <= d2 AND d1 <= d3 THEN 1
       |         WHEN d2 <= d3 THEN 2 ELSE 3 END AS BIGINT) AS cell
       |  FROM (SELECT vec_id, v, nrm, ${d(0)} AS d0, ${d(1)} AS d1,
       |          ${d(2)} AS d2, ${d(3)} AS d3 FROM n) n),
       |pairs AS (
       |  SELECT q.vec_id AS qid, q.cell AS cell, c.vec_id AS cid,
       |    list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))
       |      / (q.nrm * c.nrm) AS cos
       |  FROM cells q JOIN cells c ON q.cell = c.cell
       |    AND q.vec_id < 10 AND c.vec_id != q.vec_id)
       |SELECT qid, cell, cid, cos, CAST(rn AS BIGINT) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
       |  FROM pairs) t
       |WHERE rn <= 3 ORDER BY qid, rank""".stripMargin
  }

  /** Multi-probe IVF (nprobe=2): each query probes its TWO nearest
    * cells — the standard recall lever, same cell equi-join plan (probe
    * list explodes query-side only; the corpus stays partitioned by its
    * single cell). At scale, raising nprobe trades one extra partition
    * read per query for recall, never a cross join. */
  def sim_ann_ivf_probe2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    annIvf(emb(s, dir), LcgQuantizer, col("vec_id") < 10, nprobe = 2)
      .select($"qid", $"cid", $"cos", $"rank")
      .orderBy($"qid", $"rank")
  }

  val simIvfProbe2Sql: String = {
    def d(k: Int) = lcgSqDistSql(k)
    s"""WITH $embSqlCte,
       |dd AS (SELECT vec_id, v, nrm, ${d(0)} AS d0, ${d(1)} AS d1,
       |         ${d(2)} AS d2, ${d(3)} AS d3 FROM n),
       |cells AS (
       |  SELECT vec_id, v, nrm,
       |    CAST(CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN 0
       |         WHEN d1 <= d2 AND d1 <= d3 THEN 1
       |         WHEN d2 <= d3 THEN 2 ELSE 3 END AS BIGINT) AS cell
       |  FROM dd),
       |probes AS (
       |  SELECT vec_id, v, nrm,
       |    CAST(unnest(list_transform(
       |      list_sort([{'d': d0, 'k': 0}, {'d': d1, 'k': 1},
       |                 {'d': d2, 'k': 2}, {'d': d3, 'k': 3}])[1:2],
       |      x -> x.k)) AS BIGINT) AS cell
       |  FROM dd WHERE vec_id < 10),
       |pairs AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))
       |      / (q.nrm * c.nrm) AS cos
       |  FROM probes q JOIN cells c ON q.cell = c.cell AND c.vec_id != q.vec_id)
       |SELECT qid, cid, cos, CAST(rn AS BIGINT) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
       |  FROM pairs) t
       |WHERE rn <= 3 ORDER BY qid, rank""".stripMargin
  }

  /** Rows per cell above which the kNN-graph self-join refuses to run:
    * in-cell work is quadratic in cell population, so a fat cell means
    * the quantizer's k is too small for the corpus — the fix is a
    * bigger-k [[KMeansQuantizer]], not a longer wait. The bound is
    * measurement-derived (SCALE.md r11): 5000-row cells ran ~1 min of
    * single-task pair work each; 4000 caps a cell's pair space at 16M
    * (~8× the trained path's 500-row target squared) while any honest
    * quantizer refit lands far below it. */
  val KNN_MAX_CELL_ROWS = 4000L

  /** kNN-graph construction: top-k in-cell cosine neighbors for EVERY
    * node (not just a query set) — the edge list that graph-based dedup
    * clustering and NN-descent-style ANN refinement start from.
    *
    * Scale shape: the within-cell self-join is quadratic in CELL size,
    * not corpus size — with #cells grown proportionally to the corpus
    * (a trained [[KMeansQuantizer]] with k = rows / target_cell_rows),
    * total work stays linear and every cell is an independent
    * partition. GUARDED: counts the fattest cell first and errors past
    * `maxCellRows`, routing callers to a larger quantizer — the same
    * convention as `nearDupBruteForce`. The per-node top-k is a keyed
    * window (partitionBy src), partition-parallel. */
  def knnGraph(e: DataFrame, quant: CoarseQuantizer, topK: Int = 3,
      maxCellRows: Long = KNN_MAX_CELL_ROWS, nprobe: Int = 1,
      probeRatio: Double = 0.0): DataFrame = {
    // A TRAINED quantizer's assignment is the expensive map at scale
    // (O(k·d) flops per row with corpus-proportional k), so it runs
    // EXACTLY ONCE: localCheckpoint materializes the assigned frame
    // eagerly, and the guard aggregate plus both self-join sides read
    // the materialized rows. (Joining a narrow (vec_id, cell)
    // checkpoint back to the parquet scan was rejected: it adds a fat
    // shuffle on vec_id per side before the cell shuffle the join needs
    // anyway. cache() was rejected too: a returned-lazy frame can never
    // be explicitly unpersisted, and CacheManager pins cached plans
    // until unpersist — the checkpoint RDD by contrast is freed by the
    // ContextCleaner when the returned frame goes out of scope.) The
    // TRADE: localCheckpoint blocks are executor-local and
    // non-replicated, so an executor loss after this point fails the
    // query instead of recomputing — acceptable for a deterministic
    // re-runnable batch job; use reliable checkpointing if running
    // on preemptible nodes. The OUTPUT stays lazy, so the audited plan
    // keeps the in-cell join + keyed window visible.
    //
    // A CHEAP quantizer (pure-expression cells, e.g. the LCG gate grid)
    // skips the materialization: re-deriving a ~512-flop column on each
    // of the three consumers rides the columnar scan, while
    // checkpoint-writing the fat vector column costs a full
    // serialize+store pass (same-session A/B at sf0.1: within noise —
    // the win is structural, not local). INVARIANT the skip assumes:
    // `e` has deterministic lineage (a parquet scan, as in both gates) —
    // the three consumers re-execute the plan, so a nondeterministic
    // source (sampling, monotonically_increasing_id) could show them
    // different rows; checkpointing pins one snapshot when in doubt.
    // nprobe > 1 (or an adaptive boundary band via probeRatio ∈ (0,1))
    // assigns each node to its nprobe nearest cells: a candidate pair
    // forms when the cell SETS intersect, recovering true-NN edges that
    // a hard assignment cuts at cell boundaries — the failure mode the
    // SemDeDup recall floor measured at 0.38 under single-cell
    // assignment. probeRatio takes precedence: the second cell is
    // probed only for vectors whose owner distance is within ratio of
    // the runner-up, so interior vectors keep single-cell fan-out.
    val assigned =
      if (probeRatio > 0.0)
        e.withColumn("cell", explode(quant.probeAdaptiveCol(col("v"), probeRatio)))
      else if (nprobe > 1)
        e.withColumn("cell", explode(quant.probeCol(col("v"), nprobe)))
      else e.withColumn("cell", quant.cellCol(col("v")))
    val multiProbe = probeRatio > 0.0 || nprobe > 1
    val cells =
      if (quant.cheapAssignment) assigned else assigned.localCheckpoint()
    // coalesce: an empty corpus aggregates to one null row — the guard
    // should let the naturally-empty graph through, not NPE
    val fattest = cells.groupBy(col("cell")).count()
      .agg(coalesce(max(col("count")), lit(0L))).head.getLong(0)
    require(fattest <= maxCellRows,
      s"kNN-graph in-cell join is quadratic in cell population and the " +
        s"fattest cell has $fattest rows > $maxCellRows; refit the " +
        s"quantizer with larger k (KMeansQuantizer.fit with " +
        s"k ≈ rows/${maxCellRows / 2}) instead of scaling this plan")
    val a = cells.select(col("vec_id").as("src"), col("v").as("va"),
      col("nrm").as("na"), col("cell"))
    val b = cells.select(col("vec_id").as("dst"), col("v").as("vb"),
      col("nrm").as("nb"), col("cell"))
    val scored = a.join(b, Seq("cell")).filter(col("src") =!= col("dst"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .select(col("src"), col("dst"), col("cos"))
    if (multiProbe) {
      // Multi-probe can surface one pair from up to `probes` shared
      // cells, as `probes` bit-identical (cos, dst) candidate rows (cos
      // is deterministic per pair — identical float inputs). Rather
      // than a dropDuplicates exchange over EVERY scored pair, keep the
      // top topK·probes candidates WITH multiplicity in the bounded
      // map-combinable graft_topk_min (one shuffle of ≤ topK·probes
      // entries per src, partial-aggregated map-side), then dedupe
      // inside the tiny sorted array: duplicates are adjacent identical
      // entries, and a multiset prefix of length topK·probes must
      // contain ≥ topK distinct pairs (each appears ≤ probes times), so
      // array_distinct + slice yields exactly the top topK distinct
      // pairs. (-cos, dst) ordering is the window twin's (cos desc,
      // dst asc); -(-cos) round-trips bit-exact.
      val probes = if (probeRatio > 0.0) 2 else nprobe
      scored.groupBy(col("src"))
        .agg(call_function("graft_topk_min", -col("cos"), col("dst"),
          lit(topK * probes)).as("topm"))
        .select(col("src"),
          posexplode(slice(array_distinct(col("topm")), 1, topK)).as(Seq("pos", "t")))
        .select(col("src"), col("t.id").as("dst"),
          (-col("t.score")).as("cos"), (col("pos") + 1).cast("long").as("rank"))
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= topK)
        .select(col("src"), col("dst"), col("cos"), col("rn").cast("long").as("rank"))
    }
  }

  // ------------------------------------------------ persistent IVF index
  /** Root for persistent index stores. Resolution order:
    *  1. the `graft.index.root` runtime conf — set it to a shared DFS
    *     path on a real cluster (s3://…, hdfs://…) so an index built by
    *     one job serves every later job;
    *  2. default: `<spark.sql.warehouse.dir>/graft_indexes` — already a
    *     durable, usually-shared location, so train-once-serve-many
    *     holds across JVM sessions out of the box.
    * There is deliberately NO delete-on-exit: a persistent index is a
    * build-once-serve-many artifact whose lifecycle belongs to the
    * owner of the root (content-addressed names make stale entries
    * inert, never wrong — a changed corpus lands in a new directory). */
  def indexRoot(s: org.apache.spark.sql.SparkSession): String =
    s.conf.getOption("graft.index.root").getOrElse(
      s.conf.get("spark.sql.warehouse.dir").stripSuffix("/") + "/graft_indexes")

  /** Content-addressed index directory name under [[indexRoot]]: a
    * SHA-256 hex digest of the key parts. Fixed 64-char length (Base64
    * of a raw path overflowed the 255-byte filename limit past
    * ~190-byte paths), collision-free for practical purposes, and
    * shared by every persistent-index consumer (the
    * `sim_ann_ivf_indexed` gate, the conversation retrieval index in
    * [[graft.llm.Finetune]]). */
  def indexPath(s: org.apache.spark.sql.SparkSession, keyParts: String*): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    keyParts.foreach { p =>
      md.update(p.getBytes("UTF-8")); md.update(0.toByte)
    }
    indexRoot(s) + "/" + md.digest().map("%02x".format(_)).mkString
  }

  /** Write the corpus as a PERSISTENT IVF index: one parquet table
    * PARTITIONED BY the quantizer cell id. This is the inverted-file
    * layout the `annIvf` scaladoc promises at scale, as real storage:
    * cell assignment is the map-side `graft_cell`/LCG expression (no
    * shuffle — `partitionBy` splits files within each task's output),
    * and every downstream probe becomes a PARTITION-PRUNED read of the
    * probed cells' directories instead of a full-corpus scan. Build cost
    * is one corpus pass; the index amortizes across every query batch
    * that follows — the 100 TB serving shape. */
  def writeIvfIndex(e: DataFrame, quant: CoarseQuantizer, path: String): Unit =
    e.withColumn("cell", quant.cellCol(col("v")))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Probe a persistent IVF index: queries map to their `nprobe` cells
    * and join the index on its PARTITION column, so Catalyst's dynamic
    * partition pruning turns the (runtime-known) probe list into a
    * scan-time partition filter — the index scan reads ONLY the probed
    * cells' files, 1/numCells of the data per probe, with no change to
    * the join shape. The explicit read schema pins `cell` to BIGINT so
    * the join key matches the probe side without a cast on the partition
    * column (a cast there would defeat pruning). Plan-audited in
    * PLANS.md: the index scan must carry a dynamicpruning partition
    * filter. Same cosine arithmetic as [[annIvf]], so the gate
    * hash-matches the SAME DuckDB oracle. */
  def annIvfIndexed(s: SparkSession, indexPath: String, queries: DataFrame,
      quant: CoarseQuantizer, topK: Int = 3, nprobe: Int = 1): DataFrame = {
    val idx = s.read.schema("vec_id BIGINT, v ARRAY<DOUBLE>, nrm DOUBLE, cell BIGINT")
      .parquet(indexPath)
      .select(col("vec_id").as("cid"), col("v").as("vc"),
        col("nrm").as("nc"), col("cell"))
    val probes =
      if (nprobe == 1) queries.withColumn("cell", quant.cellCol(col("v")))
      else queries.withColumn("cell", explode(quant.probeCol(col("v"), nprobe)))
    val q = probes.select(col("vec_id").as("qid"), col("v").as("vq"),
      col("nrm").as("nq"), col("cell"))
    val scored = q.join(idx, Seq("cell")).filter(col("qid") =!= col("cid"))
      .withColumn("cos", dot(col("vq"), col("vc")) / (col("nq") * col("nc")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("qid"), col("cell"), col("cid"), col("cos"),
        col("rn").cast("long").as("rank"))
  }

  /** The persistent-index twin of `sim_ann_ivf`: build the
    * cell-partitioned index (one corpus pass), then serve the probe off
    * the partition-pruned read. Same quantizer, same probe, same
    * oracle — the hash match proves the storage round-trip changes
    * nothing; the plan audit proves the scan is pruned. */
  def sim_ann_ivf_indexed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    // collision-free path key: digest the FULL dir — String.hashCode
    // collisions would alias two corpora onto one index directory.
    // Build-vs-read follows the repo's single-writer discipline (the
    // returned plan is lazy so the audit sees the dynamicpruning scan;
    // rebuilding an index while another invocation reads it is the same
    // unsupported pattern as concurrent catalog writers).
    val path = indexPath(s, "sim_ann_ivf_indexed", dir)
    writeIvfIndex(e, LcgQuantizer, path)
    annIvfIndexed(s, path, e.filter($"vec_id" < 10), LcgQuantizer)
      .orderBy($"qid", $"rank")
  }

  def sim_knn_graph(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    knnGraph(emb(s, dir), LcgQuantizer).orderBy($"src", $"rank")
  }

  /** The SCALE path through the same operator: kNN graph over a TRAINED
    * k-means quantizer, k sized from the corpus so cell population (and
    * therefore in-cell join cost) stays bounded as the corpus grows.
    * k-means is not ANSI-SQL-expressible, so this entry has no DuckDB
    * oracle — the driver records the weaker rows-only check; the
    * hash-exact twin is `sim_knn_graph` (LCG cells), and QuantizerSpec
    * proves the cell-population contract. Since r16 the gate carries an
    * INLINE edge-recall floor vs the exact graph (see
    * [[sim_knn_graph_trained]]) — the rows-only check can no longer
    * pass on a structurally-valid but boundary-blind graph. */
  /** Exact top-`topK` cosine edges for a bounded query subset — the
    * truth side of the kNN-graph recall floor. Queries are a
    * deterministic vec_id stride subsample sized so query·corpus pair
    * work stays ≤ `cap` (the SemDeDup floor's subsampling discipline,
    * `dd_semantic_dedup_trained`): recall over a uniform query
    * subsample, corpus-scale-safe. The query side is subsample-sized →
    * BROADCAST; the corpus never shuffles. */
  private def exactKnnEdges(e: DataFrame, topK: Int,
      cap: Long = 20000000L, maxQueries: Long = 1000L): DataFrame = {
    import e.sparkSession.implicits._
    val n = e.count()
    // stride bounds BOTH the pair work (≤ cap) and the query count
    // (≤ maxQueries — a 1000-query / 3000-edge sample estimates recall
    // to ±~2% at the floor's decision points, and holds the floor's
    // cost constant as the corpus grows)
    val stride = math.max(math.ceil(n.toDouble * n / cap),
      math.ceil(n.toDouble / maxQueries)).toLong.max(1L)
    val q = e.filter($"vec_id" % stride === 0)
      .select($"vec_id".as("qid"), $"v".as("vq"), $"nrm".as("nq"))
    // top-k per query via the bounded map-combinable graft_topk_min
    // aggregate (negated score = top-k LARGEST cosine, id tiebreak
    // ascending — the identical (cos desc, dst asc) ranking knnGraph's
    // window uses), so the brute-force sweep partial-aggregates
    // map-side instead of sort-shuffling every scored pair
    e.crossJoin(broadcast(q)).filter($"vec_id" =!= $"qid")
      .withColumn("negcos", -dot($"v", $"vq") / ($"nrm" * $"nq"))
      .groupBy($"qid")
      .agg(call_function("graft_topk_min", $"negcos", $"vec_id",
        lit(topK)).as("top"))
      .select($"qid".as("src"), explode($"top").as("t"))
      .select($"src", $"t.id".as("dst"))
  }

  /** Edge recall of `graph` (src, dst rows) against the exact top-k
    * truth for the strided query subset: |truth ∩ graph| / |truth|.
    * The truth is checkpointed (it is query-sample-sized) so the
    * brute-force sweep runs once, not once per consumer. */
  def knnEdgeRecall(e: DataFrame, graph: DataFrame, topK: Int = 3): Double = {
    val truth = exactKnnEdges(e, topK).localCheckpoint()
    val total = truth.count()
    if (total == 0L) 1.0
    else truth.join(graph.select(col("src"), col("dst")),
      Seq("src", "dst")).count().toDouble / total
  }

  def sim_knn_graph_trained(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val n = e.count()
    // targetCellRows halves to 250 (from r14's 500) so the 3-probe's
    // effective per-cell candidate population stays bounded; per-vector
    // candidate work is 3·~750 — a corpus-size-independent constant
    // (4.5× the r14 single-probe constant, the honest price of the
    // recall fix below), and total pair work stays linear in the corpus.
    val k = KMeansQuantizer.chooseK(n, targetCellRows = 250L)
    // maxIter 10 / pointsPerCell 192 (from 20/256): a coarse quantizer
    // only needs cells good enough that true-NN edges co-bucket — the
    // inline recall floor measures exactly that (unchanged at the
    // trimmed fit), while the fit cost halves
    val quant = KMeansQuantizer.fitSampled(e, k, n, maxIter = 10,
      pointsPerCell = 192)
    // nprobe=3 multi-probe (VERDICT r15 item 1): single-cell hard
    // assignment measurably loses true-NN edges that cross a cell
    // boundary — 3-NN edge recall vs the EXACT graph measured 0.34 at
    // sf0.1 / 0.99 at sf0.01 with nprobe=1 (graft.tools.KnnRecall;
    // exact NNs in this 64-dim corpus are barely closer than random
    // points, so nearly every edge is boundary-adjacent — the worst
    // case for hard assignment). Probing each node's 3 nearest cells
    // co-buckets an edge when the probe SETS intersect: recall 0.96 at
    // sf0.1 (2-probe plateaus at 0.76; the probeRatio adaptive band
    // matches 2-probe here because high-dim margins make every vector
    // boundary-band — it pays off on clustered corpora, see
    // dd_semantic_dedup_trained).
    val out = knnGraph(e, quant, topK = 3, nprobe = 3)
      .localCheckpoint()
    // Inline quality floor (the SemDeDup floor's sibling): 3-NN edge
    // recall against the EXACT graph on a strided query subsample.
    // Floor = measured-minus-margin (VERDICT r19 item 3, rule in
    // SCALE.md): healthy re-measured r20 at 0.957 (sf0.1) / 1.0
    // (sf0.01); the nprobe=1 boundary-miss regression mode measures
    // 0.34/0.99. 0.85 sits ~0.1 under the worst measured value — a
    // regression losing a tenth of the edges trips it (the old 0.6
    // tolerated losing a third). A broken graph EMPTIES the gate
    // instead of shipping silently-missing edges.
    val recall = knnEdgeRecall(e, out, topK = 3)
    if (recall >= 0.85) out.orderBy($"src", $"rank") else out.limit(0)
  }

  val simKnnGraphSql: String = {
    def d(k: Int) = lcgSqDistSql(k)
    s"""WITH $embSqlCte,
       |cells AS (
       |  SELECT vec_id, v, nrm,
       |    CAST(CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN 0
       |         WHEN d1 <= d2 AND d1 <= d3 THEN 1
       |         WHEN d2 <= d3 THEN 2 ELSE 3 END AS BIGINT) AS cell
       |  FROM (SELECT vec_id, v, nrm, ${d(0)} AS d0, ${d(1)} AS d1,
       |          ${d(2)} AS d2, ${d(3)} AS d3 FROM n) n),
       |pairs AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst,
       |    list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
       |      / (a.nrm * b.nrm) AS cos
       |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id != b.vec_id)
       |SELECT src, dst, cos, CAST(rn AS BIGINT) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
       |  FROM pairs) t
       |WHERE rn <= 3 ORDER BY src, rank""".stripMargin
  }

  /** PQ/ADC ANN over the embeddings table (rows-only gate — the
    * codebook is a trained artifact with no SQL twin; PqSpec pins the
    * ADC arithmetic bit-exactly on hand-built codebooks): train a
    * 16-subspace × 64-codeword product quantizer (ProductQuantizer
    * scaladoc — the 100 TB scan format: m bytes per vector, query =
    * one m×k table + m lookups per candidate, `graft_pq_adc`
    * codegen'd), encode the corpus, answer the standard 10 queries by
    * ADC top-10, and emit per-query recall against the EXACT L2
    * top-10 computed in the same pass — quality-floored on mean
    * recall at 0.6 (r18, shortlist 100: measured mean 0.99 / min 0.90
    * at sf0.01, mean 0.95 / min 0.90 at sf0.1). */
  def sim_ann_pq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    // m adapts to the corpus dim (driver-regenerated testdata has
    // changed schemas between rounds — the r10 events lesson): largest
    // power-of-two subspace count ≤16 dividing d, so a dim change
    // degrades granularity instead of throwing on d % m != 0
    val d = e.select(size($"v")).head().getInt(0)
    val m = Seq(16, 8, 4, 2, 1).find(d % _ == 0).get
    val cb = ProductQuantizer.train(e, "v", m = m, k = 64)
    val codes = ProductQuantizer.encode(e, "v", cb)
      .select($"vec_id".as("cid"), $"v".as("vc"), $"pq_codes")
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"v".as("vq"))
      .withColumn("tbl", ProductQuantizer.adcTableCol($"vq", cb))
    // narrow (qid, cid, adc, ex) frame materialized ONCE — the truth
    // ranking and the shortlist rerank both read it, and without the
    // checkpoint each window would re-run the encode+join upstream
    val scored = broadcast(q).join(codes, $"qid" =!= $"cid")
      .withColumn("adc", ProductQuantizer.adcDist($"pq_codes", $"tbl"))
      .withColumn("ex", sqdist($"vq", $"vc"))
      .select($"qid", $"cid", $"adc", $"ex")
      .localCheckpoint()
    // production PQ pipeline: ADC prunes to a candidate shortlist, the
    // shortlist re-ranks by EXACT distance (the FAISS refine stage) —
    // only shortlisted rows ever touch the full vector
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"adc".asc, $"cid")
    val wE = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"ex".asc, $"cid")
    // shortlist 100 (was 50 through r17): the sf0.1 MINIMUM recall sat
    // exactly on the 0.6 floor — one unlucky query on regenerated
    // testdata away from an empty gate (VERDICT r17 item 3). Matching
    // IVF-PQ's depth is a constant factor on an already-bounded frame;
    // the same change on IVF-PQ measured a NEGATIVE cost delta.
    val answered = scored.withColumn("rnA", row_number().over(wA))
      .filter($"rnA" <= 100)
      .withColumn("rnR", row_number().over(wE)) // exact rerank WITHIN shortlist
      .filter($"rnR" <= 10).select($"qid", $"cid")
    val truth = scored.withColumn("rnE", row_number().over(wE))
      .filter($"rnE" <= 10).select($"qid", $"cid")
    val per = truth.join(answered, Seq("qid", "cid"), "left_semi")
      .groupBy($"qid").agg(count(lit(1)).as("n_overlap"))
    val allQ = e.filter($"vec_id" < 10).select($"vec_id".as("qid"))
    val filled = allQ.join(per, Seq("qid"), "left")
      .select($"qid", coalesce($"n_overlap", lit(0L)).as("n_overlap"))
      .withColumn("recall", $"n_overlap".cast("double") / lit(10.0))
    // floor = measured-minus-margin (VERDICT r19 item 3, rule in
    // SCALE.md): mean recall re-measured r20 at 0.99/0.95 (min
    // 0.90/0.90) at sf0.01/0.1 with the 100-deep shortlist — the floor
    // sits ~0.1 under the worst measured mean, so losing a tenth of
    // the quality trips it (0.6 could coast through a one-third loss)
    val bar = filled.agg(avg($"recall").as("__m")).filter($"__m" >= 0.85)
    filled.join(broadcast(bar)).drop("__m").orderBy($"qid")
  }

  /** IVF-PQ ANN — the two halves composed the way FAISS's IndexIVFPQ
    * does (Jégou, Douze & Schmid 2011 §IV, residual encoding): a
    * trained coarse quantizer prunes the search to `nprobe` cells, and
    * WITHIN a cell every candidate is scanned as m PQ bytes encoding
    * its RESIDUAL v − centroid(cell) (residuals have smaller energy
    * than raw vectors, so the same code budget quantizes finer); the
    * query recomputes its own residual — and hence its ADC table — per
    * probed cell, then the ADC shortlist reranks by exact distance.
    *
    * Scale position: this is the missing link between the repo's IVF
    * gates (cell-pruned but full-vector in-cell math) and the PQ gate
    * (m-byte scan but over the WHOLE corpus — its measured exponent
    * 0.64 is exactly that full scan). Here per-query work is
    * nprobe · targetCellRows CODE scans + a 50-row exact rerank: the
    * corpus never shuffles (residual encode is a stateless map; the
    * serve join broadcasts the query batch against the cell-keyed
    * codes), and per-query cost is corpus-size-independent by
    * construction. Rows-only gate (two trained artifacts — centroids
    * and codebook — have no SQL twin); mean recall vs the exact top-10,
    * computed in-gate, floors the output at 0.45 (measured 0.56 at 1×
    * and 10× — the floor trips on a real regression, not on noise). */
  /** Trained IVF-PQ bundle: the residual codebook plus the corpus's
    * non-empty cell set. The cell set is TRAIN-time metadata (VERDICT
    * r14 item 8): deriving it per serve call put a `distinct().collect()`
    * on the per-batch path; bundling it here makes the in-memory serve
    * match the persistent handle path's zero-per-call discipline. */
  final case class PqTrained(cb: ProductQuantizer.Codebook, nonEmpty: Seq[Int])

  /** Train the residual PQ codebook the IVF-PQ family shares: m = the
    * largest power-of-two ≤ 16 dividing the dim (a dim change degrades
    * granularity instead of throwing — the r10 events lesson), k = 64
    * codewords, fitted on the corpus residuals. ONE definition so the
    * gate, the persistence spec, and the streaming twin cannot drift
    * on hyperparameters. Train-once-serve-many: serve entry points
    * take the trained bundle as a parameter rather than refitting per
    * call. Alongside the codebook fit, ONE extra map-combinable agg
    * (O(numCells) result) records which cells own candidates — k-means
    * can leave empty centroids, and a probe set drawn from all cells
    * would silently answer nothing for queries whose top cells are
    * empty (the same guard Finetune's conversation serve applies). */
  def trainResidualCodebook(e: DataFrame, quant: CoarseQuantizer,
      vCol: String = "v"): PqTrained = {
    val dRow = e.select(size(col(vCol))).head(1)
    require(dRow.nonEmpty, "IVF-PQ needs a non-empty corpus")
    val d = dRow(0).getInt(0)
    val m = Seq(16, 8, 4, 2, 1).find(d % _ == 0).get
    val withCell = e.withColumn("__cell", quant.cellCol(col(vCol)))
    val resid = withCell
      .select(quant.residualCol(col(vCol), col("__cell")).as("resid"))
    val cb = ProductQuantizer.train(resid, "resid", m = m, k = 64)
    val nonEmpty = withCell.groupBy(col("__cell")).agg(count(lit(1)))
      .collect().map(_.getLong(0).toInt).toSeq.sorted
    PqTrained(cb, nonEmpty)
  }

  /** The IVF-PQ SERVE path alone (what a production retrieval job runs
    * per batch, and what PLANS.md audits — the gate wraps this in an
    * O(n) exact-truth recall audit whose broadcast-nested-loop shapes
    * are quality-check machinery, not serving): residual-encode the
    * corpus once, then per query probe its cells, ADC-scan their
    * codes, exact-rerank the 50-row shortlist. `trained` comes from
    * [[trainResidualCodebook]] — trained once (codebook AND non-empty
    * cell set), served many times: per-call work here is the batch's
    * own probe, no collect or distinct ever touches the corpus
    * (VERDICT r14 item 8 — parity with the persistent handle path). */
  def annIvfPqServe(e: DataFrame, quant: CoarseQuantizer,
      trained: PqTrained, queryPred: Column,
      topK: Int = 10, shortlist: Int = 100): DataFrame = {
    import e.sparkSession.implicits._
    val cb = trained.cb
    val nonEmpty = trained.nonEmpty
    val withCell = e.withColumn("cell", quant.cellCol($"v"))
      .withColumn("resid", quant.residualCol($"v", $"cell"))
    val codes = ProductQuantizer.encode(withCell, "resid", cb)
      .select($"vec_id".as("cid"), $"cell", $"v".as("vc"), $"pq_codes")
    // query side: one residual ADC table PER probed cell. nprobe grows
    // as √numCells — the standard recall-stability rule as nlist grows
    // with the corpus (per-query candidates = nprobe·targetCellRows =
    // O(√n·cellRows): recall holds while work stays strongly sublinear;
    // a FIXED nprobe keeps work constant but lets recall decay toward
    // nprobe/numCells on weakly clustered corpora). Minimum 4 (r16
    // item 5 set 3; VERDICT r18 item 5 raised it): at the sf0.1 4-cell
    // configuration nprobe=2 measured 0.59 mean top-10 recall vs the
    // exact truth and nprobe=3 left the MINIMUM recall sitting exactly
    // on the 0.6 floor (one unlucky query from an empty gate); 4
    // probes buy measured min-recall headroom above the floor at a
    // constant-factor cost (at 4 cells it is an exhaustive coarse
    // scan — still m-byte ADC, not full vectors). Constant factors
    // only — the √numCells asymptote is unchanged.
    val nprobe = math.max(4, math.ceil(math.sqrt(quant.numCells)).toInt)
    val q = e.filter(queryPred)
      .select($"vec_id".as("qid"), $"v".as("vq"))
      .withColumn("cell", explode(quant.probeAmongCol($"vq", nprobe, nonEmpty)))
      .withColumn("qresid", quant.residualCol($"vq", $"cell"))
      .withColumn("tbl", ProductQuantizer.adcTableCol($"qresid", cb))
    val scored = broadcast(q).join(codes, Seq("cell"))
      .filter($"qid" =!= $"cid")
      .withColumn("adc", ProductQuantizer.adcDist($"pq_codes", $"tbl"))
      .select($"qid", $"cid", $"adc", $"vq", $"vc")
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"adc".asc, $"cid")
    // exact math only on the shortlist (the FAISS refine)
    scored.withColumn("rnA", row_number().over(wA))
      .filter($"rnA" <= shortlist)
      .withColumn("ex", sqdist($"vq", $"vc"))
      .withColumn("rnR", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"qid").orderBy($"ex".asc, $"cid")))
      .filter($"rnR" <= topK).select($"qid", $"cid")
  }

  /** Write the corpus as a PERSISTENT IVF-PQ index: one parquet table
    * PARTITIONED BY the quantizer cell, holding the full vector AND the
    * m-byte PQ codes of the RESIDUAL v − centroid(cell). Serving prunes
    * on two independent axes: partition pruning limits every scan to
    * the probed cells, and parquet COLUMN pruning keeps the ADC pass on
    * the codes column alone — the full-vector column is only read by
    * the shortlist rerank's second, equally partition-pruned scan.
    * Same train-once-serve-many store discipline as [[writeIvfIndex]]
    * (content-addressed path under `graft.index.root`). */
  def writeIvfPqIndex(e: DataFrame, quant: CoarseQuantizer,
      cb: ProductQuantizer.Codebook, path: String): Unit = {
    val withCell = e.withColumn("cell", quant.cellCol(col("v")))
      .withColumn("resid", quant.residualCol(col("v"), col("cell")))
    ProductQuantizer.encode(withCell, "resid", cb)
      .select(col("vec_id"), col("v"), col("pq_codes"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    // Metadata sidecar (VERDICT r13 item 2): record the non-empty cell
    // list at BUILD time — it is exactly the partition directories that
    // exist, O(numCells) filesystem metadata, no Spark job — so no serve
    // batch ever re-derives it with a distinct() over the index (the
    // conversation store's CONV_INDEX_DONE discipline,
    // Finetune.buildConvIndex). Probe centroids + the residual codebook
    // ride along so a fresh serving session needs no trained objects in
    // memory: [[preparePqIndex]] reconstructs both with exact double
    // round-trip fidelity.
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(e.sparkSession.sessionState.newHadoopConf())
    val nonEmpty = fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("cell=")).map(_.stripPrefix("cell=").toInt).sorted
    val out = new java.io.DataOutputStream(
      fs.create(new org.apache.hadoop.fs.Path(p, PQ_META), true))
    try {
      out.writeInt(quant.numCells)
      val d = quant.centroid(0).length
      out.writeInt(d)
      (0 until quant.numCells).foreach(i =>
        quant.centroid(i).foreach(out.writeDouble))
      out.writeInt(cb.m); out.writeInt(cb.subDim); out.writeInt(cb.k)
      cb.centers.foreach(_.foreach(_.foreach(out.writeDouble)))
      out.writeInt(nonEmpty.size)
      nonEmpty.foreach(out.writeInt)
    } finally out.close()
  }

  /** Sidecar filename for persistent IVF-PQ index metadata; the leading
    * underscore keeps Spark's parquet reader from listing it as data
    * (the `_SUCCESS` convention). */
  private val PQ_META = "_graft_pqmeta.bin"

  /** Prepared, reusable IVF-PQ index handle: everything the serve path
    * needs — probe centroids, residual codebook, non-empty cell list —
    * read ONCE from the index sidecar. Obtain via [[preparePqIndex]];
    * serve any number of batches through [[annIvfPqServeIndexed]] with
    * per-batch work independent of index size (no scan, no collect, no
    * distinct touches the index outside the pruned probe itself). */
  final case class PqIndexHandle private[operators] (
      path: String,
      quant: KMeansQuantizer,
      cb: ProductQuantizer.Codebook,
      nonEmpty: Seq[Int])

  /** Read an index's sidecar into a serve handle — O(numCells·dim)
    * metadata off the index FileSystem, zero Spark jobs. The quantizer
    * comes back as a centroid table: serving needs only centroid
    * LOOKUPS (probe ranking via probeAmongCol, residuals via
    * residualCol) — cell assignment is already baked into the partition
    * column at build time — so even an index built with a non-k-means
    * quantizer serves identically through the stored centroids. */
  def preparePqIndex(s: SparkSession, path: String): PqIndexHandle = {
    val p = new org.apache.hadoop.fs.Path(path, PQ_META)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    // a pre-sidecar or foreign parquet directory must fail NAMED, not
    // with a raw FileNotFoundException deep in the read (ADVICE r14)
    require(fs.exists(p),
      s"no IVF-PQ metadata sidecar at $p — indexes written before the " +
        "sidecar era (or by hand) lack it; rebuild with writeIvfPqIndex")
    val in = new java.io.DataInputStream(fs.open(p))
    try {
      val nc = in.readInt(); val d = in.readInt()
      val cents = Array.fill(nc)(Array.fill(d)(in.readDouble()))
      val m = in.readInt(); val sd = in.readInt(); val k = in.readInt()
      val centers = Array.fill(m)(Array.fill(k)(Array.fill(sd)(in.readDouble())))
      val nonEmpty = Seq.fill(in.readInt())(in.readInt())
      PqIndexHandle(path, new KMeansQuantizer(cents),
        ProductQuantizer.Codebook(m, sd, k, centers), nonEmpty)
    } finally in.close()
  }

  /** Probe a persistent IVF-PQ index (the indexed twin of
    * [[annIvfPqServe]]): the ADC pass reads ONLY (pq_codes, vec_id) of
    * the probed cells — dynamic partition pruning from the cell
    * equi-join plus column pruning from the pinned read schema — and
    * the exact rerank re-fetches full vectors for the ≤`shortlist`
    * survivors per query through a second (cell, cid)-keyed
    * partition-pruned scan with the tiny shortlist broadcast. Returns
    * (qid, cid, ex, rank) — exact squared distance on the reranked
    * top-k. */
  def annIvfPqIndexed(s: SparkSession, indexPath: String, queries: DataFrame,
      quant: CoarseQuantizer, cb: ProductQuantizer.Codebook,
      topK: Int = 10, shortlist: Int = 50, nprobe: Int = -1): DataFrame = {
    // route through the handle so the serve path is ONE code path that
    // never re-derives the cell set from the data. The caller's trained
    // objects must BE the build-time ones (writeIvfPqIndex stored them
    // with exact double round-trip); passing different objects would
    // silently serve from the sidecar's, so verify instead of ignore
    // (ADVICE r14) — O(numCells·dim) driver-side comparison.
    val handle = preparePqIndex(s, indexPath)
    require(handle.quant.numCells == quant.numCells &&
      (0 until quant.numCells).forall(i =>
        handle.quant.centroid(i) == quant.centroid(i)),
      s"quantizer mismatch: the index at $indexPath was built with different " +
        "coarse centroids than the ones passed — serve via preparePqIndex/" +
        "annIvfPqServeIndexed, or rebuild with writeIvfPqIndex")
    require(handle.cb.m == cb.m && handle.cb.subDim == cb.subDim &&
      handle.cb.k == cb.k &&
      handle.cb.centers.map(_.map(_.toSeq).toSeq).toSeq ==
        cb.centers.map(_.map(_.toSeq).toSeq).toSeq,
      s"codebook mismatch: the index at $indexPath was built with a different " +
        "residual codebook than the one passed — serve via preparePqIndex/" +
        "annIvfPqServeIndexed, or rebuild with writeIvfPqIndex")
    annIvfPqServeIndexed(s, handle, queries, topK, shortlist, nprobe)
  }

  /** Handle-first IVF-PQ serve (the per-batch production entry): all
    * index metadata comes from the prepared handle, so per-batch work is
    * the batch's own probe — nothing here scales with the index beyond
    * the pruned cell reads. `nprobe <= 0` selects the √numCells rule
    * (the same recall-stability default as [[annIvfPqServe]] — a FIXED
    * nprobe silently loses recall as nlist grows with the corpus). */
  def annIvfPqServeIndexed(s: SparkSession, handle: PqIndexHandle,
      queries: DataFrame, topK: Int = 10, shortlist: Int = 50,
      nprobe: Int = -1): DataFrame = {
    val indexPath = handle.path
    val quant = handle.quant
    val cb = handle.cb
    val nonEmpty = handle.nonEmpty
    val np =
      if (nprobe > 0) nprobe
      // same minimum-4 rule as annIvfPqServe (VERDICT r18 item 5): the
      // indexed path serves the identical family and shares the
      // one-unlucky-query exposure at small cell counts
      else math.max(4, math.ceil(math.sqrt(quant.numCells)).toInt)
    val codes = s.read
      .schema("vec_id BIGINT, pq_codes ARRAY<BIGINT>, cell BIGINT")
      .parquet(indexPath)
      .select(col("vec_id").as("cid"), col("pq_codes"), col("cell"))
    val q = queries
      .withColumn("cell", explode(quant.probeAmongCol(col("v"), np, nonEmpty)))
      .withColumn("qresid", quant.residualCol(col("v"), col("cell")))
      .select(col("vec_id").as("qid"), col("v").as("vq"), col("cell"),
        ProductQuantizer.adcTableCol(col("qresid"), cb).as("tbl"))
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adc").asc, col("cid"))
    val short = q.join(codes, Seq("cell")).filter(col("qid") =!= col("cid"))
      .withColumn("adc", ProductQuantizer.adcDist(col("pq_codes"), col("tbl")))
      .withColumn("rnA", row_number().over(wA)).filter(col("rnA") <= shortlist)
      .select(col("qid"), col("vq"), col("cell"), col("cid"))
    val full = s.read
      .schema("vec_id BIGINT, v ARRAY<DOUBLE>, cell BIGINT")
      .parquet(indexPath)
      .select(col("vec_id").as("cid"), col("v").as("vc"), col("cell"))
    val wE = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("ex").asc, col("cid"))
    broadcast(short).join(full, Seq("cell", "cid"))
      .withColumn("ex", sqdist(col("vq"), col("vc")))
      .withColumn("rnR", row_number().over(wE)).filter(col("rnR") <= topK)
      .select(col("qid"), col("cid"), col("ex"),
        col("rnR").cast("long").as("rank"))
  }

  def sim_ann_ivfpq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val n = e.count()
    val quant = KMeansQuantizer.fitSampled(e,
      KMeansQuantizer.chooseK(n, targetCellRows = 500L), n)
    val trained = trainResidualCodebook(e, quant)
    val answered = annIvfPqServe(e, quant, trained, $"vec_id" < 10)
    // truth for the recall floor: EXACT top-10 over the full corpus
    // (10 fixed queries broadcast — O(n) gate-quality work, not serving)
    val allQ = e.filter($"vec_id" < 10).select($"vec_id".as("qid"), $"v".as("vq"))
    val truth = broadcast(allQ)
      .join(e.select($"vec_id".as("cid"), $"v".as("vc")), $"qid" =!= $"cid")
      .withColumn("ex", sqdist($"vq", $"vc"))
      .withColumn("rnE", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"qid").orderBy($"ex".asc, $"cid")))
      .filter($"rnE" <= 10).select($"qid", $"cid")
    val per = truth.join(answered, Seq("qid", "cid"), "left_semi")
      .groupBy($"qid").agg(count(lit(1)).as("n_overlap"))
    val filled = allQ.select($"qid").join(per, Seq("qid"), "left")
      .select($"qid", coalesce($"n_overlap", lit(0L)).as("n_overlap"))
      .withColumn("recall", $"n_overlap".cast("double") / lit(10.0))
    // floor = measured-minus-margin (VERDICT r19 item 3, rule in
    // SCALE.md): with nprobe min 4 + shortlist 100 the mean recall
    // re-measured r20 at 1.00/0.98 (min 1.00/0.90) at sf0.01/0.1 — the
    // floor sits ~0.1 under the worst measured mean so a codebook /
    // residual / probe regression that costs a tenth of the quality
    // empties the gate instead of coasting
    val bar = filled.agg(avg($"recall").as("__m")).filter($"__m" >= 0.85)
    filled.join(broadcast(bar)).drop("__m").orderBy($"qid")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_cosine"    -> sim_topk_cosine _,
    "sim_neardup_cosine" -> sim_neardup_cosine _,
    "sim_ann_lsh"        -> sim_ann_lsh _,
    "sim_ann_ivf"        -> sim_ann_ivf _,
    "sim_ann_ivf_probe2" -> sim_ann_ivf_probe2 _,
    "sim_ann_ivf_indexed" -> sim_ann_ivf_indexed _,
    "sim_knn_graph"      -> sim_knn_graph _,
    "sim_knn_graph_trained" -> sim_knn_graph_trained _,
    "sim_ann_pq"         -> sim_ann_pq _,
    "sim_ann_ivfpq"      -> sim_ann_ivfpq _,
    "dd_semantic_dedup"  -> dd_semantic_dedup _,
    "dd_semantic_dedup_trained" -> dd_semantic_dedup_trained _,
    "dd_semantic_contamination" -> dd_semantic_contamination _
  )

  val oracles: Map[String, String] = Map(
    "sim_topk_cosine"    -> simTopkSql,
    "sim_neardup_cosine" -> simNeardupSql,
    "sim_ann_lsh"        -> simAnnSql,
    "sim_ann_ivf"        -> simIvfSql,
    "sim_ann_ivf_probe2" -> simIvfProbe2Sql,
    "sim_ann_ivf_indexed" -> simIvfSql,
    "sim_knn_graph"      -> simKnnGraphSql,
    "dd_semantic_dedup"  -> ddSemanticDedupSql,
    "dd_semantic_contamination" -> ddSemanticContaminationSql
  )
}
