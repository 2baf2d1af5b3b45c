package graft.streaming

import graft.ml.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Stage the events parquet as a streaming source dir. */
  private def stageStreamDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    graft.Tables.events(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events_stream")
    dir
  }

  test("streaming hourly aggregation matches the batch result") {
    val dir = stageStreamDir()
    val stream = spark.readStream
      .schema(graft.Tables.events(spark, sfDir).schema)
      .parquet(s"$dir/events_stream")
    val q = StreamingOps.hourlyAggregates(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .agg(sum("n")).head().getLong(0)
      val batch = graft.Tables.events(spark, sfDir).count()
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // per-(hour,type) counts equal the batch groupBy
      val batchAgg = graft.Tables.events(spark, sfDir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .count()
      val joined = spark.table("hourly_out")
        .join(batchAgg, Seq("hour", "event_type"))
        .filter(col("n") =!= col("count")).count()
      assert(joined == 0)
    } finally q.stop()
  }

  test("stateful sessionization emits closed sessions consistent with batch") {
    val dir = stageStreamDir()
    val stream = spark.readStream
      .schema(graft.Tables.events(spark, sfDir).schema)
      .parquet(s"$dir/events_stream")
    val q = StreamingOps.sessionize(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      q.processAllAvailable()
      val emitted = spark.table("sessions_out")
      // gap-closed sessions (batchSessions − users) always emit; each
      // user's final session emits only if the watermark passed its
      // event-time timeout — so the count lands in [gap-closed, all].
      val batchSessions = graft.operators.Relational
        .q_sessionize(spark, sfDir).count()
      val users = graft.Tables.events(spark, sfDir)
        .select("user_id").distinct().count()
      val n = emitted.count()
      assert(n >= batchSessions - users && n <= batchSessions,
        s"emitted=$n batch=$batchSessions users=$users")
      assert(emitted.filter(col("n_events") <= 0).count() == 0)
      // emitted (user, session_start, n_events) must agree with batch
      val batchFirst = graft.operators.Relational.q_sessionize(spark, sfDir)
        .join(graft.Tables.events(spark, sfDir)
            .select(col("event_id"), col("ts")),
          col("first_event") === col("event_id"))
        .select(col("user_id"), col("ts").as("session_start"),
          col("n_events").as("batch_n"))
      val disagree = emitted.join(batchFirst, Seq("user_id", "session_start"))
        .filter(col("n_events") =!= col("batch_n")).count()
      assert(disagree == 0)
    } finally q.stop()
  }

  test("stateful funnel tracking emits per-user stages equal to batch") {
    val dir = stageStreamDir()
    val stream = spark.readStream
      .schema(graft.Tables.events(spark, sfDir).schema)
      .parquet(s"$dir/events_stream")
    val q = StreamingOps.funnelStream(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()
    try {
      q.processAllAvailable()
      val emitted = spark.table("funnel_out")
        .select(col("user_id"), col("t_view").as("s_view"),
          col("t_click").as("s_click"), col("t_purchase").as("s_purchase"))
      val users = graft.Tables.events(spark, sfDir)
        .select("user_id").distinct().count()
      // a user's funnel row flushes once the watermark passes 30 min
      // beyond their last event — users active near stream end stay open
      val n = emitted.count()
      assert(n >= users / 2 && n <= users, s"emitted=$n users=$users")
      // every emitted row must agree EXACTLY (null-safe, micros
      // precision) with the batch window formulation
      val batch = graft.operators.Relational.funnelStages(
        graft.Tables.events(spark, sfDir))
      val disagree = emitted.join(batch, Seq("user_id"))
        .filter(!(col("s_view") <=> col("t_view")) ||
                !(col("s_click") <=> col("t_click")) ||
                !(col("s_purchase") <=> col("t_purchase"))).count()
      assert(disagree == 0, s"$disagree emitted funnel rows disagree with batch")
    } finally q.stop()
  }

  test("stateful twins run unchanged on the RocksDB state store") {
    // At 100 TB the default in-memory (HDFS-backed) state store caps
    // streaming state at executor heap; RocksDB spills to executor-local
    // disk. The twins must be provider-agnostic: same sessionization
    // parity under the RocksDB provider, and the progress metrics must
    // prove the provider actually engaged (SCALE.md documents the
    // production config block).
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = stageStreamDir()
      val stream = spark.readStream
        .schema(graft.Tables.events(spark, sfDir).schema)
        .parquet(s"$dir/events_stream")
      val q = StreamingOps.sessionize(spark, stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("sessions_rocksdb").start()
      try {
        q.processAllAvailable()
        val n = spark.table("sessions_rocksdb").count()
        val batchSessions = graft.operators.Relational
          .q_sessionize(spark, sfDir).count()
        val users = graft.Tables.events(spark, sfDir)
          .select("user_id").distinct().count()
        assert(n >= batchSessions - users && n <= batchSessions,
          s"emitted=$n batch=$batchSessions users=$users")
        // the state operator must report RocksDB-specific metrics —
        // otherwise the conf silently fell back to the default store
        val metrics = q.lastProgress.stateOperators.toSeq
          .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
        assert(metrics.exists(_.startsWith("rocksdb")),
          s"no rocksdb* metric in state operator progress: $metrics")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming exact dedup matches the batch distinct-fingerprint count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dd_stream").toString
    // documents with injected duplicates, timestamped for the watermark
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").limit(100)
    val dup = docs.unionAll(docs.limit(40)) // 40 exact duplicates
      .withColumn("ts", to_timestamp(lit("2026-01-01 00:00:00")))
    dup.coalesce(1).write.mode("overwrite").parquet(s"$dir/docs_stream")
    val stream = spark.readStream.schema(dup.schema).parquet(s"$dir/docs_stream")
    val q = StreamingOps.dedupExact(stream).writeStream
      .outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dedup_out").count()
      val batchDistinct = dup.select(md5(trim(lower($"text")))).distinct().count()
      assert(streamed == batchDistinct, s"streamed=$streamed batch=$batchDistinct")
    } finally q.stop()
  }

  test("streaming mix-sample keeps exactly the batch rows (hash rule is stateless)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mix_stream").toString
    graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source").orderBy($"doc_id").limit(200)
      .coalesce(2).write.mode("overwrite").parquet(s"$dir/docs_stream")
    // batch side reads the SAME files back — both sides see one row set
    val staged = spark.read.parquet(s"$dir/docs_stream")
    val stream = spark.readStream.schema(staged.schema).parquet(s"$dir/docs_stream")
    val q = StreamingOps.mixSampleStream(spark, stream).writeStream
      .outputMode("append").format("memory").queryName("mix_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("mix_out")
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      val batch = graft.operators.PipelineOps.mixSample(spark, staged)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming PII scrub equals the batch scrub row for row (stateless)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pii_stream").toString
    graft.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"props").orderBy($"event_id").limit(300)
      .coalesce(2).write.mode("overwrite").parquet(s"$dir/ev_stream")
    val staged = spark.read.parquet(s"$dir/ev_stream")
    val stream = spark.readStream.schema(staged.schema).parquet(s"$dir/ev_stream")
    val q = StreamingOps.piiScrubStream(spark, stream).writeStream
      .outputMode("append").format("memory").queryName("pii_out").start()
    try {
      q.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select($"event_id", $"pseudo_uid", $"props_scrubbed", $"digits_masked")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      val streamed = rows(spark.table("pii_out"))
      val batch = rows(graft.operators.PipelineOps.piiScrub(spark, staged))
      assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("importance scoring: fit-once batch model serves a stream with batch parity") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir_stream").toString
    val staticDocs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text", $"lang", $"source")
      .orderBy($"doc_id").limit(200).coalesce(2)
    staticDocs.write.mode("overwrite").parquet(s"$dir/docs_stream")
    val staged = spark.read.parquet(s"$dir/docs_stream")
    // train-once-serve-many: the model fits on the BATCH corpus; the
    // stream only scores (stateless map — no state store, no watermark)
    val model = graft.operators.PipelineOps.fitImportance(
      spark, staged, $"lang" === "en")
    val stream = spark.readStream.schema(staged.schema).parquet(s"$dir/docs_stream")
    val q = StreamingOps.importanceScoreStream(spark, stream, model)
      .writeStream.outputMode("append").format("memory")
      .queryName("dsir_out").start()
    try {
      q.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select($"doc_id", $"n_bigrams", $"logw", $"kept")
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
      val streamed = rows(spark.table("dsir_out"))
      val batch = rows(graft.operators.PipelineOps.importanceScore(spark, staged, model))
      assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
      assert(batch.nonEmpty && batch.exists(_._4) && batch.exists(!_._4),
        "fixture should produce both kept and dropped docs")
    } finally q.stop()
  }

  test("quality scoring: fit-once batch head serves a stream with batch parity") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_qc_stream").toString
    val staticDocs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").orderBy($"doc_id").limit(200).coalesce(2)
    staticDocs.write.mode("overwrite").parquet(s"$dir/docs_stream")
    val staged = spark.read.parquet(s"$dir/docs_stream")
    val model = graft.operators.PipelineOps.fitQualityClassifier(
      spark, staged, $"text".contains("spark"))
    assert(model.heldOutAccuracy >= 0.9, s"fixture seed unlearnable: $model")
    val stream = spark.readStream.schema(staged.schema).parquet(s"$dir/docs_stream")
    val q = StreamingOps.qualityScoreStream(spark, stream, model)
      .writeStream.outputMode("append").format("memory")
      .queryName("qc_out").start()
    try {
      q.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select($"doc_id", $"prob", $"kept")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
      val streamed = rows(spark.table("qc_out"))
      val batch = rows(graft.operators.PipelineOps.qualityScore(spark, staged, model))
      assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
      assert(batch.exists(_._3) && batch.exists(!_._3),
        "fixture should produce both kept and dropped docs")
    } finally q.stop()
  }

  test("streaming model scoring via foreachBatch transform") {
    import spark.implicits._
    val cat = new graft.ml.Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_stream_cat").toString)
    val train = (1 to 100).map(i => (i.toDouble, 3.0 * i + 7.0)).toDF("x", "y")
    graft.ml.Train.train(spark, cat, graft.ml.Train.TrainConfig(
      projectName = "StreamScore", task = "regression", relationName = "t",
      data = Some(train), yColumn = Seq("y"), algorithm = "linear",
      testSampling = "random", orderCols = Seq("x")))

    val dir = java.nio.file.Files.createTempDirectory("graft_score_in").toString
    (101 to 110).map(i => Tuple1(i.toDouble)).toDF("x")
      .coalesce(1).write.parquet(s"$dir/in")
    val scoredRows = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.DoubleType))))
      .parquet(s"$dir/in")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val scored = StreamingOps.scoreBatch(cat, "StreamScore")(batch, id)
        scoredRows.addAndGet(scored.filter(
          abs(col("prediction") - (col("x") * 3.0 + 7.0)) < lit(1e-4)).count())
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(scoredRows.get() == 10L)
    } finally q.stop()
  }

  test("streaming conversation retrieval via foreachBatch respond") {
    import spark.implicits._
    val cat = new graft.ml.Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft_conv_cat").toString)
    val topics = Seq(
      ("spark joins", "joins shuffle rows on their keys"),
      ("scan filters", "filters push down into the scan"))
    val train = (0 until 20).map { i =>
      val (topic, resp) = topics(i % 2)
      (s"assistant for $topic", s"explain $topic please tag$i", resp)
    }.toDF("system", "user", "assistant")
    graft.llm.Finetune.finetune(spark, cat, graft.llm.Finetune.FinetuneConfig(
      projectName = "StreamConv", task = "conversation", data = Some(train),
      textCol = "system", text2Col = "user", labelCol = "assistant"))
    val pool = train.select($"assistant".as("response"))

    val dir = java.nio.file.Files.createTempDirectory("graft_conv_in").toString
    Seq(("assistant for spark joins", "explain spark joins please tagX"))
      .toDF("system", "user").coalesce(1).write.parquet(s"$dir/in")
    val hits = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .parquet(s"$dir/in")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val resp = StreamingOps.respondBatch(cat, "StreamConv", pool)(batch, id)
        hits.addAndGet(resp.filter(col("response").contains("shuffle")).count())
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(hits.get() == 1L)
    } finally q.stop()
  }

  test("streaming ANN retrieval matches batch sim_ann_ivf on the same pool") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // the batch gate's exact frame: doubled embeddings + L2 norm
    val e = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(call_function("graft_dot", $"v", $"v")))
    val pool = StreamingOps.indexPool(e, graft.operators.LcgQuantizer)
      .localCheckpoint()
    // queries arrive as a stream: the same vec_id < 10 rows staged as
    // a file source
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_in").toString
    e.filter($"vec_id" < 10).coalesce(1).write.parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .parquet(s"$dir/in")
    val q = StreamingOps.annRetrieveStream(stream, pool,
        graft.operators.LcgQuantizer)
      .writeStream.outputMode("complete")
      .format("memory").queryName("ann_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ann_out")
        .select($"qid", $"cid", $"cos", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      val batch = graft.operators.Similarity.sim_ann_ivf(spark, sfDir)
        .select($"qid", $"cid", $"cos", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      assert(streamed.nonEmpty && streamed == batch,
        s"stream ${streamed.size} rows vs batch ${batch.size}")
    } finally q.stop()
  }

  test("streaming PQ-ADC retrieval matches the batch shortlist ranking") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val e = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cb = graft.operators.ProductQuantizer.train(e, "v", m = 16, k = 64)
    val pool = StreamingOps.pqEncodePool(e, cb).localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_in").toString
    e.filter($"vec_id" < 10).coalesce(1).write.parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .parquet(s"$dir/in")
    val q = StreamingOps.pqRetrieveStream(stream, pool, cb, topK = 10)
      .writeStream.outputMode("complete")
      .format("memory").queryName("pq_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("pq_out")
        .select($"qid", $"cid", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // batch truth: the same ADC scan ranked by (adc asc, cid asc)
      val wA = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"adc".asc, $"cid")
      val batch = e.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"),
          graft.operators.ProductQuantizer.adcTableCol($"v", cb).as("tbl"))
        .join(pool, $"qid" =!= $"cid")
        .withColumn("adc",
          graft.operators.ProductQuantizer.adcDist($"pq_codes", $"tbl"))
        .withColumn("rank", row_number().over(wA).cast("long"))
        .filter($"rank" <= 10)
        .select($"qid", $"cid", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed.nonEmpty && streamed == batch,
        s"stream ${streamed.size} rows vs batch ${batch.size}")
    } finally q.stop()
  }

  test("streaming IVF-PQ retrieval matches the batch in-probed-cell ADC ranking") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val e = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val quant = graft.operators.LcgQuantizer
    // codebook trains on RESIDUALS, exactly as the batch op documents
    val cb = graft.operators.ProductQuantizer.train(
      e.select(quant.residualCol($"v", quant.cellCol($"v")).as("resid")),
      "resid", m = 16, k = 64)
    val pool = StreamingOps.ivfpqEncodePool(e, quant, cb).localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_in").toString
    e.filter($"vec_id" < 10).coalesce(1).write.parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema)
      .parquet(s"$dir/in")
    val q = StreamingOps.ivfpqRetrieveStream(stream, pool, quant, cb,
        topK = 10, nprobe = 2)
      .writeStream.outputMode("complete")
      .format("memory").queryName("ivfpq_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ivfpq_out")
        .select($"qid", $"cid", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // batch truth: the same probed-cell ADC scan ranked (adc asc, cid asc)
      val wA = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"adc".asc, $"cid")
      val nonEmpty = pool.select($"cell").distinct().collect()
        .map(_.getLong(0).toInt).toSeq.sorted
      val batch = e.filter($"vec_id" < 10)
        .withColumn("cell", explode(quant.probeAmongCol($"v", 2, nonEmpty)))
        .withColumn("qresid", quant.residualCol($"v", $"cell"))
        .select($"vec_id".as("qid"), $"cell",
          graft.operators.ProductQuantizer.adcTableCol($"qresid", cb).as("tbl"))
        .join(pool, Seq("cell"))
        .filter($"qid" =!= $"cid")
        .withColumn("adc",
          graft.operators.ProductQuantizer.adcDist($"pq_codes", $"tbl"))
        .withColumn("rank", row_number().over(wA).cast("long"))
        .filter($"rank" <= 10)
        .select($"qid", $"cid", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed.nonEmpty && streamed == batch,
        s"stream ${streamed.size} rows vs batch ${batch.size}")
    } finally q.stop()
  }

  test("streaming heavy hitters: exact tf parity, bounded-error df") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hh_stream").toString
    graft.Tables.documents(spark, sfDir).select($"doc_id", $"text").limit(200)
      .coalesce(2).write.mode("overwrite").parquet(s"$dir/docs_stream")
    val staged = spark.read.parquet(s"$dir/docs_stream")
    val stream = spark.readStream.schema(staged.schema).parquet(s"$dir/docs_stream")
    val q = StreamingOps.heavyHittersStream(stream).writeStream
      .outputMode("complete").format("memory").queryName("hh_out").start()
    try {
      q.processAllAvailable()
      val batch = staged
        .select($"doc_id", explode(split(trim(lower($"text")), "\\s+")).as("term"))
        .filter(length($"term") > 0)
        .groupBy($"term")
        .agg(count(lit(1)).as("btf"), countDistinct($"doc_id").as("bdf"))
      val joined = spark.table("hh_out").join(batch, "term").cache()
      assert(joined.filter($"tf" =!= $"btf").count() == 0, "tf must be exact")
      // df is approx_count_distinct (rsd 5% default) — loose bound
      val badDf = joined.filter(
        abs($"df_approx" - $"bdf") > $"bdf" * 0.15 + lit(2.0)).count()
      assert(badDf == 0, s"$badDf terms outside the df error bound")
      assert(spark.table("hh_out").count() == batch.count())
    } finally q.stop()
  }

  test("streaming space-saving sketch honors the error contract across micro-batches") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_hhsk").toString
    // two files + maxFilesPerTrigger=1 → the sketch buffer must merge
    // soundly across micro-batch boundaries through the state store
    docs.filter($"doc_id" < 250).coalesce(1)
      .write.mode("append").parquet(s"$dir/in")
    docs.filter($"doc_id" >= 250).coalesce(1)
      .write.mode("append").parquet(s"$dir/in")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val k = 32
    val q = StreamingOps.heavyHittersSketchStream(stream, k).writeStream
      .outputMode("complete").format("memory").queryName("hhsk_out").start()
    try {
      q.processAllAvailable()
      val exact = docs
        .select(explode(split(trim(lower($"text")), "\\s+")).as("term"))
        .filter(length($"term") > 0)
        .groupBy($"term").agg(count(lit(1)).as("c"))
        .cache()
      val n = exact.agg(sum($"c")).head().getLong(0)
      val sk = spark.table("hhsk_out").cache()
      assert(sk.count() <= k)
      val viol = sk.join(exact, Seq("term"), "left")
        .filter($"c".isNull || $"c" < $"count_lower" || $"c" > $"count_upper")
        .count()
      assert(viol == 0, s"$viol terms outside the sketch bounds")
      val missing = exact.filter($"c" > n.toDouble / k)
        .join(sk.select($"term"), Seq("term"), "left_anti").count()
      assert(missing == 0, s"$missing guaranteed-frequent terms missing")
    } finally q.stop()
  }

  test("streaming sequence packing matches the batch prefix sum across micro-batches") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_pack").toString
    // two files + maxFilesPerTrigger=1 → the running total must carry
    // across micro-batch boundaries through the state store
    docs.filter($"doc_id" < 250).coalesce(1)
      .write.mode("append").parquet(s"$dir/in")
    docs.filter($"doc_id" >= 250).coalesce(1)
      .write.mode("append").parquet(s"$dir/in")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = StreamingOps.packSequencesStream(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("pack_out").start()
    try {
      q.processAllAvailable()
      val batch = graft.operators.PipelineOps.ds_pack_sequences(spark, sfDir)
      val streamed = spark.table("pack_out")
      assert(streamed.count() == batch.count())
      val disagree = streamed.join(batch.withColumnRenamed("pack_id", "batch_pack")
          .withColumnRenamed("cum_tokens", "batch_cum"), Seq("doc_id", "n_tokens"))
        .filter(col("pack_id") =!= col("batch_pack") ||
          col("cum_tokens") =!= col("batch_cum")).count()
      assert(disagree == 0, s"$disagree docs diverge from the batch packing")
    } finally q.stop()
  }
  test("streaming semantic decontamination: stream-static semi join matches the batch kill set") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_scontam").toString
    val e = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(aggregate(transform($"v", x => x * x),
        lit(0.0), (a, x) => a + x)))
    val bench = e.filter($"vec_id" < 20).localCheckpoint()
    // corpus = the rest PLUS exact copies of 5 benchmark vectors under
    // shifted ids — guaranteed cos = 1.0 contamination at any sf
    val corpus = e.filter($"vec_id" >= 20)
      .unionAll(bench.filter($"vec_id" < 5)
        .select(($"vec_id" + 100000L).as("vec_id"), $"v", $"nrm"))
    corpus.coalesce(2).write.mode("overwrite").parquet(s"$dir/corpus")
    val staged = spark.read.parquet(s"$dir/corpus")
    val stream = spark.readStream.schema(staged.schema).parquet(s"$dir/corpus")
    val q = StreamingOps.semanticContaminationStream(
        stream, bench, graft.operators.LcgQuantizer, 0.45)
      .select($"vec_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("scontam_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("scontam_out")
        .collect().map(_.getLong(0)).toSet
      val batch = graft.operators.Similarity
        .semanticContamination(spark, staged, bench,
          graft.operators.LcgQuantizer, 0.45)
        .filter($"contaminated").collect().map(_.getLong(0)).toSet
      assert(batch.nonEmpty, "fixture should contain contaminated vectors")
      assert(streamed == batch, s"stream=${streamed.size} batch=${batch.size}")
    } finally q.stop()
  }

  test("gopher + c4 rule filters run unchanged on a stream with batch parity") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rules_stream").toString
    val staticDocs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").orderBy($"doc_id").limit(150).coalesce(2)
    staticDocs.write.mode("overwrite").parquet(s"$dir/docs")
    val staged = spark.read.parquet(s"$dir/docs")
    val stream = spark.readStream.schema(staged.schema).parquet(s"$dir/docs")
    val qg = graft.streaming.StreamingOps.gopherRulesStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("gopher_out").start()
    val qc = graft.streaming.StreamingOps.c4RulesStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("c4_out").start()
    try {
      qg.processAllAvailable(); qc.processAllAvailable()
      def keyOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      val gStream = keyOf(spark.table("gopher_out"))
      val gBatch = keyOf(graft.operators.TextAnalysis.gopherRules(staged))
      assert(gStream == gBatch, s"gopher stream=${gStream.size} batch=${gBatch.size}")
      val cStream = keyOf(spark.table("c4_out"))
      val cBatch = keyOf(graft.operators.TextAnalysis.c4Rules(staged))
      assert(cStream == cBatch, s"c4 stream=${cStream.size} batch=${cBatch.size}")
    } finally { qg.stop(); qc.stop() }
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.operators.Multimodal

  test("stub decode: metadata + fixed-shape features, deterministic") {
    val bytes = "hello multimodal world".getBytes("UTF-8")
    val (meta, feats) = Multimodal.StubDecoder.decode(bytes)
    assert(meta.nBytes == bytes.length && meta.format == "raw")
    assert(feats.length == 8 && feats.forall(f => f >= 0f && f <= 1f))
    assert(Multimodal.StubDecoder.decode(bytes)._2.toSeq == feats.toSeq)
    // format sniffing on magic bytes
    assert(Multimodal.StubDecoder.sniffFormat(
      Array(0xFF.toByte, 0xD8.toByte, 0x00)) == "jpeg")
  }

  test("decodeFeatures: binary column plumbing end to end") {
    val media = Multimodal.mediaTable(spark, "/root/testdata/sf0.001")
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val out = Multimodal.decodeFeatures(media.repartition(5))
    val rows = out.select("media_id", "n_bytes", "features").collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getSeq[Float](2).length == 8))
  }
}
