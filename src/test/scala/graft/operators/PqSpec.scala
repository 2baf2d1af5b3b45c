package graft.operators

import graft.ml.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization (ProductQuantizer scaladoc): exact ADC
  * arithmetic on hand-built codebooks, training determinism, and
  * recall on separably clustered data. */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("graft_pq_adc is the exact table-lookup sum") {
    graft.functions.GraftFunctions.register(spark)
    // m=2 subspaces, k=2 codewords; codes (1, 0); table rows (0.5, 2.0)
    // and (3.25, 9.0) -> adc = 2.0 + 3.25
    val df = Seq((Seq(1, 0), Seq(Seq(0.5, 2.0), Seq(3.25, 9.0))))
      .toDF("codes", "tbl")
    val out = df.select(expr("graft_pq_adc(codes, tbl)")).head().getDouble(0)
    assert(out == 5.25)
    // out-of-range code -> null, not a crash
    val bad = Seq((Seq(7, 0), Seq(Seq(0.5), Seq(1.0))))
      .toDF("codes", "tbl")
      .select(expr("graft_pq_adc(codes, tbl)")).head()
    assert(bad.isNullAt(0))
  }

  test("encode + adcTable reproduce exact distances when codebook = data") {
    graft.functions.GraftFunctions.register(spark)
    // 4 distinct 4-dim vectors; m=2, k=4 with enough codewords that
    // k-means converges to the exact points -> ADC distance == true
    // squared distance for every (query, candidate) pair
    val vecs = Seq(
      Seq(0.0, 0.0, 10.0, 10.0), Seq(1.0, 0.0, 10.0, 11.0),
      Seq(8.0, 8.0, 0.0, 1.0), Seq(9.0, 8.0, 0.0, 0.0))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "v")
    val cb = ProductQuantizer.train(df, "v", m = 2, k = 4, iters = 20)
    val enc = ProductQuantizer.encode(df, "v", cb)
      .select($"vec_id".as("cid"), $"v".as("vc"), $"pq_codes")
    val q = df.select($"vec_id".as("qid"), $"v".as("vq"))
      .withColumn("tbl", ProductQuantizer.adcTableCol($"vq", cb))
    val rows = broadcast(q).join(enc)
      .withColumn("adc", ProductQuantizer.adcDist($"pq_codes", $"tbl"))
      .withColumn("ex", expr("graft_sqdist(vq, vc)"))
      .select($"adc", $"ex").collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
        s"adc ${r.getDouble(0)} != exact ${r.getDouble(1)}")
    }
  }

  test("training is deterministic and nearest-cluster recall is high") {
    graft.functions.GraftFunctions.register(spark)
    // 3 well-separated 8-dim clusters with small deterministic jitter
    val vecs = (0 until 90).map { i =>
      val c = i % 3
      (i.toLong, (0 until 8).map(d =>
        c * 20.0 + (d % 3) + ((i * 7 + d * 13) % 5) * 0.1).toSeq)
    }
    val df = vecs.toDF("vec_id", "v")
    val cb1 = ProductQuantizer.train(df, "v", m = 4, k = 8)
    val cb2 = ProductQuantizer.train(df, "v", m = 4, k = 8)
    assert(cb1.centers.flatten.flatten.toSeq == cb2.centers.flatten.flatten.toSeq)

    // every vector's ADC-nearest neighbors land in ITS cluster
    val enc = ProductQuantizer.encode(df, "v", cb1)
      .select($"vec_id".as("cid"), $"pq_codes")
    val q = df.filter($"vec_id" < 9)
      .select($"vec_id".as("qid"), ProductQuantizer.adcTableCol($"v", cb1).as("tbl"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"adc".asc, $"cid")
    val top = broadcast(q).join(enc, $"qid" =!= $"cid")
      .withColumn("adc", ProductQuantizer.adcDist($"pq_codes", $"tbl"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
    val wrong = top.filter($"qid" % 3 =!= $"cid" % 3).count()
    assert(wrong == 0, s"$wrong of 45 ADC neighbors crossed clusters")
  }

  test("sim_ann_ivfpq gate: 10 queries answered, recall floored, deterministic") {
    val out = Similarity.queries("sim_ann_ivfpq")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.length == 10)
    val recalls = out.map(_.getAs[Double]("recall"))
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.45, s"IVF-PQ mean recall $mean under the gate floor")
    // trained artifacts are seeded → the gate is replay-stable
    val again = Similarity.queries("sim_ann_ivfpq")(spark, "/root/testdata/sf0.01")
      .collect().map(_.getAs[Double]("recall")).toSeq
    assert(again == recalls.toSeq)
  }

  test("persistent IVF-PQ index: storage round-trip parity + two-axis pruning") {
    graft.functions.GraftFunctions.register(spark)
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val quant = KMeansQuantizer.fit(e, 2)
    // the ONE shared codebook definition — no hand-duplicated m/k
    val trained = Similarity.trainResidualCodebook(e, quant)
    val cb = trained.cb
    val path = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString + "/idx"
    Similarity.writeIvfPqIndex(e, quant, cb, path)
    val out = Similarity.annIvfPqIndexed(spark, path,
      e.filter($"vec_id" < 5), quant, cb, topK = 5, nprobe = 2)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // in-memory serve on the same quantizer + codebook: identical ADC
    // scores → identical shortlist → identical reranked ids (the
    // storage round-trip changes nothing)
    val truth = Similarity.annIvfPqServe(e, quant, trained, $"vec_id" < 5, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty && got == truth,
      s"indexed ${got.size} pairs != in-memory serve ${truth.size}")
    // two-axis pruning: the ADC pass's scan reads codes WITHOUT the
    // full-vector column (column pruning from the pinned read schema)
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val schemas = "ReadSchema: [^\n]*".r.findAllIn(plan).toList
    assert(schemas.exists(s => s.contains("pq_codes") && !s.contains("v:array")),
      s"no codes-only scan found in:\n${schemas.mkString("\n")}")
    // handle-first serve (VERDICT r13 item 2): the sidecar round-trips
    // the trained objects exactly, and serving through the prepared
    // handle — zero pool-side work per batch — answers identically
    val handle = Similarity.preparePqIndex(spark, path)
    assert(handle.quant.numCells == quant.numCells)
    assert((0 until quant.numCells).forall(i =>
      handle.quant.centroid(i) == quant.centroid(i)),
      "sidecar centroid round-trip is not exact")
    assert(handle.cb == cb.copy(centers = handle.cb.centers) &&
      handle.cb.centers.flatten.flatten.toSeq == cb.centers.flatten.flatten.toSeq,
      "sidecar codebook round-trip is not exact")
    val viaHandle = Similarity.annIvfPqServeIndexed(spark, handle,
        e.filter($"vec_id" < 5), topK = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaHandle == got, "handle serve diverged from inline serve")
    // nprobe <= 0 selects the √numCells rule; with 2 cells that IS 2,
    // so the default must reproduce the explicit-nprobe answer
    val viaDefault = Similarity.annIvfPqServeIndexed(spark, handle,
        e.filter($"vec_id" < 5), topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaDefault == got, "sqrt-rule default nprobe diverged")
  }

  test("IVF-PQ residual advantage: same code budget, finer quantization") {
    // four tight clusters far apart with k=4 codewords: raw PQ must
    // spend its ENTIRE codebook on the between-cluster offsets, leaving
    // nothing for within-cluster detail; residual PQ spends the same
    // budget purely on the small within-cluster spread
    import graft.operators.{KMeansQuantizer, ProductQuantizer => PQ}
    graft.functions.GraftFunctions.register(spark)
    val rng = new scala.util.Random(3)
    val vecs = (0L until 120L).map { i =>
      val base = (i % 4) * 50.0
      (i, Seq.fill(4)(base + rng.nextGaussian()))
    }
    val df = vecs.toDF("vec_id", "v")
    val quant = KMeansQuantizer.fit(df, 4)
    val withCell = df.withColumn("cell", quant.cellCol($"v"))
      .withColumn("resid", quant.residualCol($"v", $"cell"))
    val cbRaw = PQ.train(df, "v", m = 2, k = 4)
    val cbRes = PQ.train(withCell.select($"resid"), "resid", m = 2, k = 4)
    def meanAdcErr(encoded: org.apache.spark.sql.DataFrame, vCol: String,
        cb: PQ.Codebook): Double = {
      // reconstruction error ‖x − decode(encode(x))‖² averaged: ADC of
      // x against its own codes IS that error
      encoded.withColumn("tbl", PQ.adcTableCol(col(vCol), cb))
        .withColumn("err", PQ.adcDist($"pq_codes", $"tbl"))
        .agg(avg($"err")).head().getDouble(0)
    }
    val rawErr = meanAdcErr(PQ.encode(df, "v", cbRaw), "v", cbRaw)
    val resErr = meanAdcErr(PQ.encode(withCell, "resid", cbRes), "resid", cbRes)
    assert(resErr < rawErr / 2,
      s"residual PQ error $resErr not clearly under raw PQ error $rawErr")
  }
  test("preparePqIndex fails NAMED on a sidecar-less directory") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("no_sidecar").toString + "/idx"
    Seq((1L, Seq(0.0, 1.0))).toDF("vec_id", "v").write.parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Similarity.preparePqIndex(spark, dir)
    }
    assert(e.getMessage.contains("writeIvfPqIndex"), e.getMessage)
  }

  test("annIvfPqIndexed refuses trained objects that differ from the sidecar's") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val quant = KMeansQuantizer.fit(e, 2)
    val trained = Similarity.trainResidualCodebook(e, quant)
    val path = java.nio.file.Files.createTempDirectory("ivfpq_mm").toString + "/idx"
    Similarity.writeIvfPqIndex(e, quant, trained.cb, path)
    // a codebook with one perturbed center must be refused, not silently
    // shadowed by the sidecar's build-time objects
    val bad = trained.cb.copy(centers =
      trained.cb.centers.map(_.map(_.map(_ + 1.0))))
    val err = intercept[IllegalArgumentException] {
      Similarity.annIvfPqIndexed(spark, path, e.filter($"vec_id" < 5),
        quant, bad, topK = 5, nprobe = 2)
    }
    assert(err.getMessage.contains("codebook mismatch"), err.getMessage)
  }
}
