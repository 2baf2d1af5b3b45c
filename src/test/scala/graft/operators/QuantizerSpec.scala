package graft.operators

import graft.functions.GraftFunctions
import graft.ml.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The coarse-quantizer seam of the similarity family: trained k-means
  * centroids bound cell population (the scale lever for IVF / kNN-graph),
  * the native `graft_cell` assignment matches a composable argmin, and
  * the kNN-graph guard refuses fat cells. */
class QuantizerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = {
    GraftFunctions.register(spark)
    graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(call_function("graft_dot", $"v", $"v")))
      .cache()
  }

  test("graft_cell equals the composable sqdist argmin on trained centroids") {
    val q = KMeansQuantizer.fit(emb, k = 8)
    // composable reference: array_min over (distance, id) structs — ties
    // break to the lower id via the struct's lexicographic order, the
    // same rule graft_cell implements natively
    val structs = (0 until q.numCells).map { k =>
      struct(call_function("graft_sqdist", $"v", typedlit(q.centroid(k))).as("d"),
        lit(k.toLong).as("k"))
    }
    val mismatches = emb
      .withColumn("native", q.cellCol($"v"))
      .withColumn("composed", array_min(array(structs: _*)).getField("k"))
      .filter($"native" =!= $"composed").count()
    assert(mismatches == 0)
  }

  test("graft_cell / graft_halo_cells above the group threshold equal the flat forms (BB pruning exact)") {
    // 160 centroids > CentroidIndex.GROUP_THRESHOLD (128): assignment and
    // halo run the branch-and-bound group path — results must be
    // IDENTICAL to the composable flat argmin / threshold sweep,
    // including lowest-index ties
    val cents = (0 until 160).map { c =>
      (0 until 64).map { i =>
        ((1103515245L * (c * 64 + i) + 12345L) % 2147483648L).toDouble /
          2147483648.0 - 0.5
      }
    }
    val q = new KMeansQuantizer(cents.map(_.toArray).toArray)
    val structs = (0 until q.numCells).map { k =>
      struct(call_function("graft_sqdist", $"v", typedlit(q.centroid(k))).as("d"),
        lit(k.toLong).as("k"))
    }
    val withBoth = emb
      .withColumn("native", q.cellCol($"v"))
      .withColumn("composed", array_min(array(structs: _*)).getField("k"))
    assert(withBoth.filter($"native" =!= $"composed").count() == 0)
    // halo: native BB list vs the composable distance-threshold sweep
    val eps = 0.6
    val dists = (0 until q.numCells).map { k =>
      call_function("graft_sqdist", $"v", typedlit(q.centroid(k)))
    }
    val minD = array_min(array(dists: _*))
    val cutExpr = (sqrt(minD) + lit(2.0 * eps)) * (sqrt(minD) + lit(2.0 * eps))
    val composedHalo = filter(
      array((0 until q.numCells).map(k => struct(dists(k).as("d"), lit(k.toLong).as("k"))): _*),
      s => s.getField("d") <= cutExpr)
    val mism = emb
      .withColumn("nh", q.haloCol($"v", eps))
      .withColumn("ch", transform(composedHalo, s => s.getField("k")))
      .filter(!($"nh" <=> $"ch")).count()
    assert(mism == 0)
  }

  test("graft_cell stays inside whole-stage codegen and is null-safe") {
    GraftFunctions.register(spark)
    val plan = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("graft_cell(CAST(embedding AS ARRAY<DOUBLE>), array(array(0.0d), array(1.0d))) AS c")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(spark.sql(
      "SELECT graft_cell(CAST(NULL AS ARRAY<DOUBLE>), array(array(0.0d)))")
      .head().isNullAt(0))
    // length-mismatched centroid → null, not a wrong cell
    assert(spark.sql(
      "SELECT graft_cell(array(1.0d, 2.0d), array(array(0.0d)))")
      .head().isNullAt(0))
  }

  test("graft_cell / graft_halo_cells with a NON-FOLDABLE per-row centroid operand bypass the memo and stay exact") {
    GraftFunctions.register(spark)
    // per-row centroid arrays (built from the row's own values — not a
    // constant-foldable literal): ADVICE r17 — the identity memo must
    // not be consulted, results must equal the literal-operand path
    val df = spark.range(0, 50).selectExpr(
      "CAST(id AS DOUBLE) AS x")
    val viaRowCents = df.selectExpr(
      // centroids differ per row: [[x], [x+10]] — nearest is always cell 0
      "graft_cell(array(x + 1.0d), array(array(x), array(x + 10.0d))) AS c",
      "graft_halo_cells(array(x + 1.0d), array(array(x), array(x + 10.0d)), 0.1d) AS h")
      .collect()
    viaRowCents.foreach { r =>
      assert(r.getLong(0) == 0L)
      assert(r.getSeq[Long](1) == Seq(0L))
    }
    // and a wide-eps per-row halo returns both cells, ascending
    val both = df.limit(5).selectExpr(
      "graft_halo_cells(array(x + 1.0d), array(array(x), array(x + 10.0d)), 5.0d) AS h")
      .collect()
    both.foreach(r => assert(r.getSeq[Long](0) == Seq(0L, 1L)))
  }

  test("native graft_probe2 equals the composable sorted-struct adaptive probe") {
    GraftFunctions.register(spark)
    // both below and above the group threshold, on trained centroids
    // 8 below / 160 above CentroidIndex.GROUP_THRESHOLD (128)
    for (k <- Seq(8, 160)) {
      val q = KMeansQuantizer.fit(emb, k)
      // the trait's composable form, invoked explicitly (the override
      // would route to the native expression)
      val composable = new CoarseQuantizer {
        override def numCells: Int = q.numCells
        override def centroid(c: Int): Seq[Double] = q.centroid(c)
        override def cellCol(v: org.apache.spark.sql.Column) = q.cellCol(v)
        override def probeCol(v: org.apache.spark.sql.Column, n: Int) = q.probeCol(v, n)
      }
      for (ratio <- Seq(0.25, 0.5, 0.9)) {
        val native = emb.select($"vec_id", q.probeAdaptiveCol($"v", ratio).as("p"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        val viaSort = emb.select($"vec_id", composable.probeAdaptiveCol($"v", ratio).as("p"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        assert(native == viaSort, s"k=$k ratio=$ratio")
      }
    }
  }

  test("graft_probe2 exact-tie discipline: equal distances order by centroid index") {
    GraftFunctions.register(spark)
    // centroids 0 and 1 IDENTICAL, centroid 2 far: owner=0, runner-up=1
    // at d1 == d2 exactly — the two-cell band condition (d1 >= ratio*d2)
    // holds for any ratio <= 1, and the pair must come back [0, 1]
    val r = spark.sql(
      """SELECT graft_probe2(array(1.0d, 2.0d),
        |  array(array(1.0d, 1.0d), array(1.0d, 1.0d), array(9.0d, 9.0d)),
        |  0.5d) AS p""".stripMargin).head().getSeq[Long](0)
    assert(r == Seq(0L, 1L))
    // v equidistant from two DIFFERENT centroids (symmetric): same rule
    val r2 = spark.sql(
      """SELECT graft_probe2(array(0.0d),
        |  array(array(-1.0d), array(1.0d), array(10.0d)), 0.9d) AS p""".stripMargin)
      .head().getSeq[Long](0)
    assert(r2 == Seq(0L, 1L))
    // deep-interior vector with ratio near 1: single cell
    val r3 = spark.sql(
      """SELECT graft_probe2(array(1.0d, 1.0d),
        |  array(array(1.0d, 1.0d), array(9.0d, 9.0d)), 0.5d) AS p""".stripMargin)
      .head().getSeq[Long](0)
    assert(r3 == Seq(0L))
  }

  test("native graft_probek equals the composable sorted-struct multi-probe") {
    GraftFunctions.register(spark)
    // 8 below / 160 above CentroidIndex.GROUP_THRESHOLD (128) — the
    // branch-and-bound path must be tie-for-tie identical to the
    // array_sort form at both routes
    for (k <- Seq(8, 160)) {
      val q = KMeansQuantizer.fit(emb, k)
      val composable = new CoarseQuantizer {
        override def numCells: Int = q.numCells
        override def centroid(c: Int): Seq[Double] = q.centroid(c)
        override def cellCol(v: org.apache.spark.sql.Column) = q.cellCol(v)
        override def probeCol(v: org.apache.spark.sql.Column, n: Int) =
          probeAmongCol(v, n, 0 until numCells)
      }
      // full cell set and a restricted allowed subset; nprobe beyond
      // the allowed population must return all allowed, nearest first
      val subsets = Seq(0 until k, 0 until k by 3)
      for (allowed <- subsets; nprobe <- Seq(1, 2, 5, allowed.length + 3)) {
        val native = emb.select($"vec_id",
          q.probeAmongCol($"v", nprobe, allowed).as("p"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        val viaSort = emb.select($"vec_id",
          composable.probeAmongCol($"v", nprobe, allowed).as("p"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        assert(native == viaSort, s"k=$k nprobe=$nprobe |allowed|=${allowed.length}")
      }
    }
  }

  test("graft_probek exact-tie discipline and strict null contract") {
    GraftFunctions.register(spark)
    // centroids 0 and 1 IDENTICAL: equal distances order by index
    val r = spark.sql(
      """SELECT graft_probek(array(1.0d, 2.0d),
        |  array(array(1.0d, 1.0d), array(1.0d, 1.0d), array(9.0d, 9.0d)),
        |  2, array(0L, 1L, 2L)) AS p""".stripMargin).head().getSeq[Long](0)
    assert(r == Seq(0L, 1L))
    // symmetric equidistance from two DIFFERENT centroids: same rule
    val r2 = spark.sql(
      """SELECT graft_probek(array(0.0d),
        |  array(array(-1.0d), array(1.0d), array(10.0d)),
        |  2, array(0L, 1L, 2L)) AS p""".stripMargin).head().getSeq[Long](0)
    assert(r2 == Seq(0L, 1L))
    // the allowed set excludes the nearest cell: ranking is among the rest
    val r3 = spark.sql(
      """SELECT graft_probek(array(0.0d, 0.0d),
        |  array(array(0.0d, 0.0d), array(1.0d, 0.0d), array(2.0d, 0.0d)),
        |  2, array(1L, 2L)) AS p""".stripMargin).head().getSeq[Long](0)
    assert(r3 == Seq(1L, 2L))
    // nprobe = 0 mirrors slice(..., 1, 0): empty, not null
    val r4 = spark.sql(
      """SELECT graft_probek(array(0.0d), array(array(1.0d)), 0, array(0L))
        | AS p""".stripMargin).head().getSeq[Long](0)
    assert(r4 == Seq.empty)
    // an out-of-range allowed id is a defensive NULL, never a skip
    val r5 = spark.sql(
      """SELECT graft_probek(array(0.0d), array(array(1.0d)), 1, array(5L))
        | AS p""".stripMargin).head()
    assert(r5.isNullAt(0))
  }

  test("max cell population shrinks as k grows") {
    def maxCell(k: Int): Long = {
      val q = KMeansQuantizer.fit(emb, k)
      emb.withColumn("cell", q.cellCol($"v"))
        .groupBy("cell").count().agg(max("count")).head().getLong(0)
    }
    val m4 = maxCell(4)
    val m16 = maxCell(16)
    val m64 = maxCell(64)
    assert(m16 < m4, s"k=16 max cell $m16 should shrink below k=4's $m4")
    assert(m64 < m16, s"k=64 max cell $m64 should shrink below k=16's $m16")
  }

  test("chooseK sizes the quantizer from corpus rows / target cell rows") {
    assert(KMeansQuantizer.chooseK(100L, 1000L) == 2) // clamped low
    assert(KMeansQuantizer.chooseK(1000000L, 10000L) == 100)
    assert(KMeansQuantizer.chooseK(Long.MaxValue, 1L) == 65536) // clamped high
  }

  test("knnGraph with a trained quantizer yields topK edges per node") {
    val q = KMeansQuantizer.fit(emb, k = 16)
    val g = Similarity.knnGraph(emb, q, topK = 3).cache()
    // every node with >= 3 in-cell neighbors has exactly 3 edges, ranked 1..3
    val perNode = g.groupBy("src").agg(count("*").as("deg"), max("rank").as("mr"))
    assert(perNode.filter($"deg" > 3).count() == 0)
    assert(g.filter($"rank" < 1 || $"rank" > 3).count() == 0)
    assert(g.count() > 0)
    // edges never cross cells: src and dst always share the assigned cell
    val cells = emb.withColumn("cell", q.cellCol($"v")).select($"vec_id", $"cell")
    val crossCell = g
      .join(cells.withColumnRenamed("vec_id", "src").withColumnRenamed("cell", "cs"), "src")
      .join(cells.withColumnRenamed("vec_id", "dst").withColumnRenamed("cell", "cd"), "dst")
      .filter($"cs" =!= $"cd").count()
    assert(crossCell == 0)
  }

  test("graft_halo_cells contains the owner, stays codegen, and is null-safe") {
    GraftFunctions.register(spark)
    val q = KMeansQuantizer.fit(emb, k = 8)
    // the halo must always include the assigned cell, at any eps
    val missingOwner = emb
      .withColumn("cell", q.cellCol($"v"))
      .withColumn("halo", q.haloCol($"v", 0.7))
      .filter(!array_contains($"halo", $"cell")).count()
    assert(missingOwner == 0)
    // monotone: a larger eps never shrinks the halo
    val shrunk = emb
      .withColumn("h1", size(q.haloCol($"v", 0.3)))
      .withColumn("h2", size(q.haloCol($"v", 1.5)))
      .filter($"h2" < $"h1").count()
    assert(shrunk == 0)
    val plan = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("graft_halo_cells(CAST(embedding AS ARRAY<DOUBLE>), array(array(0.0d)), 1.0d) AS h")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(spark.sql(
      "SELECT graft_halo_cells(CAST(NULL AS ARRAY<DOUBLE>), array(array(0.0d)), 1.0d)")
      .head().isNullAt(0))
    // negative eps / length mismatch → null, not a wrong replication list
    assert(spark.sql(
      "SELECT graft_halo_cells(array(1.0d), array(array(0.0d)), -1.0d)")
      .head().isNullAt(0))
    assert(spark.sql(
      "SELECT graft_halo_cells(array(1.0d, 2.0d), array(array(0.0d)), 1.0d)")
      .head().isNullAt(0))
  }

  test("trained kNN graph neighbor recall vs brute force (production multi-probe config)") {
    // the trained path's QUALITY contract, measured in the GATE's
    // configuration (targetCellRows=250, nprobe=3): 3-probe edges must
    // recover ≥ 90% of the exact brute-force top-3 edges. The previous
    // pin (k=2 SINGLE-probe, floor 0.9) was data-fragile, not
    // code-sensitive: the driver's r17 regenerated embeddings have no
    // 2-cluster structure — a numpy sweep of 12 random-restart 2-means
    // splits topped out at 0.71 single-probe recall, for ANY fit
    // (MLlib included) — while the multi-probe production path holds
    // 0.96 on both the old and the regenerated corpus.
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(call_function("graft_dot", $"v", $"v")))
      .cache()
    val n = e.count()
    val q = KMeansQuantizer.fit(e, KMeansQuantizer.chooseK(n, targetCellRows = 250L))
    val approx = Similarity.knnGraph(e, q, topK = 3, nprobe = 3)
      .select($"src", $"dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = e.select($"vec_id".as("src"), $"v".as("va"), $"nrm".as("na"))
    val b = e.select($"vec_id".as("dst"), $"v".as("vb"), $"nrm".as("nb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"src").orderBy($"cos".desc, $"dst")
    val exact = a.join(b, $"src" =!= $"dst")
      .withColumn("cos",
        call_function("graft_dot", $"va", $"vb") / ($"na" * $"nb"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" <= 3)
      .select($"src", $"dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    e.unpersist()
    val recall = (approx & exact).size.toDouble / exact.size
    info(f"neighbor recall=$recall%.3f (${exact.size} exact edges, ${approx.size} approx)")
    assert(recall >= 0.9, f"trained kNN graph recall $recall%.3f < 0.9 at targetCellRows=250/nprobe=3")
  }

  test("knnGraph guard refuses a fat cell and routes to a larger k") {
    val err = intercept[IllegalArgumentException] {
      Similarity.knnGraph(emb, LcgQuantizer, maxCellRows = 10L)
    }
    assert(err.getMessage.contains("larger k"))
  }

  test("LCG quantizer probe list: nprobe=1 head equals the assigned cell") {
    val bad = emb
      .withColumn("cell", LcgQuantizer.cellCol($"v"))
      .withColumn("probe", LcgQuantizer.probeCol($"v", 1).getItem(0))
      .filter($"cell" =!= $"probe").count()
    assert(bad == 0)
  }

  test("probeAmongCol restricts the probe ranking to the allowed cells") {
    import spark.implicits._
    val df = emb.limit(20)
    // exclude cell 0: no probe may return it, and each row's first
    // probe must be its nearest cell among {1,2,3}
    val probed = df.select($"v",
      LcgQuantizer.probeAmongCol($"v", 2, Seq(1, 2, 3)).as("p"),
      LcgQuantizer.probeAmongCol($"v", 4, Seq(1, 2, 3)).as("pAll"))
      .collect()
    probed.foreach { r =>
      val p = r.getSeq[Long](1)
      assert(p.length == 2 && !p.contains(0L), p.mkString(","))
      // asking for more probes than allowed cells returns all allowed
      assert(r.getSeq[Long](2).sorted == Seq(1L, 2L, 3L))
    }
  }

  test("persistent IVF index: probe equals the in-memory join and prunes partitions") {
    val path = java.nio.file.Files.createTempDirectory("graft_ivfidx_spec").toString
    Similarity.writeIvfIndex(emb, LcgQuantizer, path)
    // one directory per cell on disk — the inverted-file layout
    val cellDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName).sorted
    assert(cellDirs.length == LcgQuantizer.numCells, cellDirs.mkString(","))

    val probe = Similarity.annIvfIndexed(spark, path,
      emb.filter($"vec_id" < 10), LcgQuantizer)
    val mem = Similarity.annIvf(emb, LcgQuantizer, $"vec_id" < 10)
    assert(probe.except(mem).count() == 0 && mem.except(probe).count() == 0,
      "indexed probe must reproduce the in-memory cell join exactly")

    // the scan-time contract: the index read carries a dynamicpruning
    // partition filter fed by the (broadcast) probe side
    val plan = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("dynamicpruning"), plan)
  }

  test("semanticDedup: transitive groups, canonical = min id, trained twin structural") {
    GraftFunctions.register(spark)
    // three semantically-identical vectors (tiny perturbations of one
    // direction), one chained near-neighbor, and two isolated vectors —
    // 64 dims so the LCG cell arithmetic applies
    def v(base: Double, eps: Double) =
      Seq.tabulate(64)(i => base + (if (i == 0) eps else 0.0) + i * 0.01)
    val e = Seq(
      (10L, v(1.0, 0.0)), (11L, v(1.0, 0.001)), (12L, v(1.0, 0.002)),
      (20L, Seq.tabulate(64)(i => math.sin(i * 2.1) * 5)),
      (21L, Seq.tabulate(64)(i => math.cos(i * 1.3) * 5))
    ).toDF("vec_id", "v")
      .withColumn("nrm", sqrt(call_function("graft_dot", $"v", $"v")))
    val out = Similarity.semanticDedup(spark, e, LcgQuantizer, 0.999)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // the near-identical trio groups under its minimum id
    assert(out(10L) == ((10L, "canonical")), out.toString)
    assert(out(11L) == ((10L, "duplicate")) && out(12L) == ((10L, "duplicate")))
    // isolated vectors stay unique and self-grouped
    assert(out(20L) == ((20L, "unique")) && out(21L) == ((21L, "unique")))
    // trained twin on real embeddings: structural contract — every
    // multi-member group has exactly ONE canonical and it is the
    // group's minimum id; statuses partition the corpus
    val emb2 = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(call_function("graft_dot", $"v", $"v")))
    val quant = KMeansQuantizer.fit(emb2, 4)
    val t = Similarity.semanticDedup(spark, emb2, quant, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(t.length == emb2.count())
    t.groupBy(_._2).foreach { case (gid, members) =>
      if (members.length > 1) {
        val canon = members.filter(_._3 == "canonical")
        assert(canon.length == 1 && canon.head._1 == gid &&
          gid == members.map(_._1).min, s"group $gid: ${members.mkString(",")}")
        assert(members.filter(_._3 == "duplicate").length == members.length - 1)
      } else assert(members.head._3 == "unique" && members.head._1 == gid)
    }
  }
}
