package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug._

/** Plan audit main: dumps `explain("formatted")` for representative
  * queries and asserts the plan properties SCALE.md claims — filters
  * pushed to the parquet scan, pruned read schemas, broadcast joins on
  * dimension chains, single exchanges where one shuffle is expected.
  * Output goes to PLANS.md (checked in so reviewers see the evidence).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val picks = Seq(
      "q6_forecast_revenue" -> "constrained scan: every predicate pushed, 4/11 columns read",
      "q3_segment_revenue" -> "fact-dim join: customer broadcast, lineitem never shuffles pre-agg",
      "q5_region_orders" -> "dimension chain: all three dims broadcast",
      "q_sessionize" -> "one shuffle on user_id shared by lag + running sum",
      "dd_minhash_lsh" -> "wide-agg signatures + band equi-join candidates",
      "sim_topk_cosine" -> "broadcast query set, per-partition scoring",
      "q_asof_attribution" -> "as-of join as union + one keyed window (no range join)",
      "sim_ann_ivf" -> "inverted-file ANN: cell equi-join, no cross join",
      "ta_quality" -> "pure map stage (single scan, no exchange before sort)",
      "ml_split_last" -> "ordered split numbers rows distributively — no Window operator at all",
      "sim_ann_ivf_probe2" -> "multi-probe IVF: probe list explodes query-side, candidates via cell equi-join",
      "ds_mix_sample" -> "hash-thresholded domain mixing: map-only filter — no join, agg, or window",
      "dd_contamination" -> "decontamination: benchmark shingles broadcast, corpus side never shuffles pre-agg",
      "ds_pack_sequences" -> "sequence packing rides the two-phase prefix sum — no Window operator",
      "lm_rouge_pairs" -> "per-pair ROUGE: clipped n-gram overlap entirely inside the map stage",
      "dd_bloom_membership" -> "Bloom decontamination: native bloom_filter prefilter inside codegen, no ScalaUDF",
      "sim_knn_graph" -> "kNN graph: in-cell equi-join, guarded cell population",
      "ml_knn_predict" -> "kNN vote: query side broadcast, corpus scanned once, keyed windows only",
      "sim_dbscan_bucketed" -> "exact DBSCAN at scale: eps-halo pair stage (pre-labeling; the gate query's tail is checkpoint-collapsed)",
      "q_events_funnel" -> "ordered funnel: three stage windows + per-user collapse on ONE user_id shuffle",
      "dd_keep_list" -> "dedup decision table: tiny canonical set joined back, one corpus-sized equi-join",
      "q_events_rolling" -> "RANGE-frame rolling features: one user_id shuffle, running-window aggregation",
      "sim_ann_ivf_indexed" -> "persistent IVF index: probe reads ONLY probed cells via dynamic partition pruning",
      "ft_conversation_ann_serve" -> "conversation retrieval serve: partition-pruned read of the persistent pool index (head-independent store)",
      "dd_span_dedup" -> "duplicated-span removal: content-keyed equi-joins only, map-combinable df count, no pair space",
      "dd_exact_substring" -> "offset-robust exact-substring dedup: stride-1 shingle df count, per-doc start-list regroup, token marking in the map stage",
      "ds_pii_scrub" -> "PII scrub: pseudonymization + redaction as a pure map stage — no shuffle at all",
      "sim_ann_ivfpq_serve" -> "IVF-PQ ANN serve: residual codes meet the broadcast query batch via cell equi-join, ADC in native codegen",
      "sim_ann_ivfpq_indexed" -> "persistent IVF-PQ via sidecar handle: codes-only pruned scan for ADC, full vectors only for the shortlist rerank",
      "ds_token_budget" -> "per-source token budget: seeded-shuffle selection rides the two-phase grouped prefix sum — no Window operator",
      "ta_gopher_rules" -> "Gopher rule filter: per-doc HOF verdicts entirely inside the map stage (single scan, no exchange before the oracle sort)",
      "ta_c4_rules" -> "C4 rule filter: line retention + page kills as one map stage over (doc_id, text)",
      "ml_metrics_auc" -> "rank-sweep AUC: per-distinct-score collapse is ONE map-combinable hash aggregate (native json extraction, no ScalaUDF)",
      "ta_unigram_encode" -> "quantized Viterbi encode: seed vocab from one corpus scan, broadcast-closure encode of the distinct-word table",
      "ds_heavy_hitters_sketch" -> "space-saving sketch: bounded O(k) aggregate, partial-combined map-side — state never scales with vocabulary",
      "curation_base_stage" -> "curation pipeline stages compose without breaking pushdown: corpus filter reaches the scan under the c4+gopher joins",
      "knn_graph_multiprobe" -> "multi-probe kNN graph: probe-set equi-join + map-combinable bounded top-k ranking (no window sort, no dedupe exchange)",
      "trained_adaptive_probe" -> "trained-quantizer adaptive probe: ONE native graft_probe2 call per row (codegen at any k) — never the k-struct array_sort that falls out of codegen past a few dozen centroids",
      "curation_full_enrichment" -> "full-rule curation enrichment: benchmark rows broadcast, corpus filter pushed to the scan, the derived-text transform + full C4 rules one map stage",
      "ft_generate_train1" -> "trigram-LM train twin: n-gram counts + per-context argmax are map-combinable hash aggregates on ctx — no window, no cross join, no boxed UDF")

    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan audit (generated by graft.PlanAudit)\n\n")
    sb.append(s"Source: `$sfDir`. Regenerate: `sbt \"runMain graft.PlanAudit\"`.\n")

    val checks = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean, String)]
    picks.foreach { case (name, why) =>
      val df =
        if (name == "sim_dbscan_bucketed") {
          // audit the PAIR stage: the gate query ends in the labeling
          // checkpoint, which collapses the join lineage we assert on
          import org.apache.spark.sql.functions.col
          graft.functions.GraftFunctions.register(spark)
          val e = Tables.embeddings(spark, sfDir)
            .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          graft.operators.Dbscan.epsPairsBucketed(e,
            graft.operators.KMeansQuantizer.fit(e, 2), 1.2)
        } else if (name == "ft_conversation_ann_serve") {
          // audit the SERVE plan directly: the gate's qualityFloor
          // localCheckpoints its result, which collapses the retrieval
          // lineage the dynamicpruning assertion needs to see
          import org.apache.spark.sql.functions._
          val t = filter(split(trim(lower(col("text"))), "\\s+"), x => length(x) > 0)
          val d = Tables.documents(spark, sfDir).select(col("doc_id"),
            concat_ws(" ", slice(t, 1, 3)).as("system"),
            concat_ws(" ", slice(t, 4, 5)).as("user"),
            concat_ws(" ", slice(t, 9, 10)).as("assistant"))
          val cat = new graft.ml.Catalog(spark,
            java.nio.file.Files.createTempDirectory("audit_conv").toString)
          graft.llm.Finetune.finetune(spark, cat, graft.llm.Finetune.FinetuneConfig(
            projectName = "AuditConv", task = "conversation",
            data = Some(d.select(col("system"), col("user"), col("assistant"))),
            textCol = "system", text2Col = "user", labelCol = "assistant",
            dim = 64, hyperparams = Map("max_iter" -> "5")))
          graft.llm.Finetune.respondTextAnn(spark, cat, "AuditConv",
            d.select(col("system"), col("user")), "system", "user",
            candidates = d.select(col("assistant").as("response")), nprobe = 2)
        } else if (name == "ml_metrics_auc") {
          // the gate emits a driver-local single-row frame (the metric
          // values) — audit the rank-collapse aggregate it computes:
          // the per-distinct-score (np, cnt) hash aggregate over the
          // natively-extracted score
          import org.apache.spark.sql.functions._
          graft.functions.GraftFunctions.register(spark)
          val k = call_function("graft_json_long", col("props"), lit("k"))
          Tables.events(spark, sfDir).select(
            when(col("event_type").isin("purchase", "signup"), 1).otherwise(0).as("label"),
            k.cast("double").as("s")).filter(col("s").isNotNull)
            .groupBy(col("s"))
            .agg(sum(when(col("label") === 1, 1L).otherwise(0L)).as("np"),
              count(lit(1)).as("cnt"))
        } else if (name == "sim_ann_ivfpq_serve") {
          // audit the SERVE path alone: the gate wraps it in an O(n)
          // exact-truth recall audit whose 10-query broadcast-nested-
          // loop shapes are quality machinery, not the serving plan
          import org.apache.spark.sql.functions.col
          graft.functions.GraftFunctions.register(spark)
          val e = Tables.embeddings(spark, sfDir)
            .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          val q2 = graft.operators.KMeansQuantizer.fit(e, 2)
          graft.operators.Similarity.annIvfPqServe(e, q2,
            graft.operators.Similarity.trainResidualCodebook(e, q2),
            col("vec_id") < 10)
        } else if (name == "sim_ann_ivfpq_indexed") {
          // the handle-first production entry: build once, then the
          // audited plan is a pure serve — all metadata from the
          // sidecar, zero index-side jobs before the probe itself
          import org.apache.spark.sql.functions.col
          graft.functions.GraftFunctions.register(spark)
          val e = Tables.embeddings(spark, sfDir)
            .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          val q2 = graft.operators.KMeansQuantizer.fit(e, 2)
          val cb = graft.operators.Similarity.trainResidualCodebook(e, q2).cb
          val path = java.nio.file.Files
            .createTempDirectory("audit_ivfpq").toString + "/idx"
          graft.operators.Similarity.writeIvfPqIndex(e, q2, cb, path)
          val h = graft.operators.Similarity.preparePqIndex(spark, path)
          graft.operators.Similarity.annIvfPqServeIndexed(spark, h,
            e.filter(col("vec_id") < 5), topK = 5)
        } else if (name == "ds_heavy_hitters_sketch") {
          // audit the OPERATOR frame: the gate localCheckpoints its
          // output for the inline contract check, collapsing lineage
          graft.functions.GraftFunctions.register(spark)
          graft.operators.CorpusQuality.heavyHittersSketch(
            Tables.documents(spark, sfDir), 32)
        } else if (name == "curation_base_stage") {
          // the gate checkpoints each pool; audit the stage-1/2
          // composition pre-checkpoint — the property claimed is that
          // the rule joins leave the corpus filter + column pruning on
          // the scan intact
          import org.apache.spark.sql.functions.col
          val all = Tables.documents(spark, sfDir)
          val c4 = graft.operators.TextAnalysis.c4Rules(all)
            .select(col("doc_id"), (!col("has_lorem") && !col("has_brace") &&
              !col("has_blockword")).as("c4_keep"))
          val go = graft.operators.TextAnalysis.gopherRules(all)
            .select(col("doc_id"), col("keep").as("go_keep"))
          all.filter(col("doc_id") >= 20)
            .select(col("doc_id"), col("source"), col("text"))
            .join(c4, "doc_id").join(go, "doc_id")
            .filter(col("c4_keep") && col("go_keep"))
        } else if (name == "curation_full_enrichment") {
          // audit enrichment + stage-1 pre-checkpoint: the claim is the
          // derived corpus costs ONE broadcast join (20 benchmark rows)
          // and the full C4 rule pass stays in the same map stage —
          // the corpus side never shuffles
          graft.operators.TextAnalysis.c4Rules(
            graft.operators.Curation.enriched(spark, sfDir))
        } else if (name == "trained_adaptive_probe") {
          // audit the ASSIGNMENT map itself (withinCellPairs checkpoints
          // this frame, which collapses the lineage the assertion needs)
          import org.apache.spark.sql.functions.{col, explode}
          graft.functions.GraftFunctions.register(spark)
          val e = Tables.embeddings(spark, sfDir)
            .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          val q2 = graft.operators.KMeansQuantizer.fit(e, 4)
          e.withColumn("cell", explode(q2.probeAdaptiveCol(col("v"), 0.5)))
        } else if (name == "knn_graph_multiprobe") {
          import org.apache.spark.sql.functions.col
          graft.functions.GraftFunctions.register(spark)
          val e = Tables.embeddings(spark, sfDir)
            .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
            .withColumn("nrm", org.apache.spark.sql.functions.sqrt(
              org.apache.spark.sql.functions.call_function(
                "graft_dot", col("v"), col("v"))))
          graft.operators.Similarity.knnGraph(e,
            graft.operators.LcgQuantizer, topK = 3, nprobe = 3)
        } else SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name — $why\n\n```\n$plan\n```\n")

      name match {
        case "q6_forecast_revenue" =>
          checks += (("q6 pushes filters into the scan",
            plan.contains("PushedFilters: [IsNotNull"), name))
          checks += (("q6 prunes to needed columns",
            "ReadSchema:.*l_quantity".r.findFirstIn(plan).isDefined &&
              !plan.contains("l_orderkey"), name))
        case "q3_segment_revenue" | "q5_region_orders" =>
          checks += ((s"$name uses broadcast joins",
            plan.contains("BroadcastHashJoin"), name))
        case "q_sessionize" =>
          // distinct plan nodes, not tree+detail double counts; expect 2:
          // ONE user_id shuffle shared by both windows AND the
          // (user_id, session_id) aggregate (its distribution is satisfied
          // by the user_id partitioning) + the final oracle ORDER BY.
          val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(plan).size
          checks += ((s"q_sessionize: windows+agg share one user_id shuffle ($exchanges total exchanges incl. final sort)",
            exchanges <= 2, name))
        case "ta_quality" =>
          checks += (("ta_quality has no aggregation exchange (map-only + sort)",
            !plan.contains("HashAggregate"), name))
        case "ml_split_last" =>
          checks += (("ml_split_last plan contains no Window operator (two-phase row numbering)",
            !plan.contains("Window"), name))
        case "sim_ann_ivf_probe2" =>
          checks += (("probe2 candidates meet via equi-join, never a cross/nested-loop join",
            !plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
            name))
        case "ds_mix_sample" =>
          checks += (("ds_mix_sample is a pure map stage (no join/agg/window before the sort)",
            !plan.contains("HashAggregate") && !plan.contains("Join") &&
              !plan.contains("Window"), name))
        case "dd_contamination" =>
          checks += (("dd_contamination broadcasts the benchmark side",
            plan.contains("BroadcastHashJoin"), name))
        case "ds_pack_sequences" =>
          checks += (("ds_pack_sequences has no Window operator (two-phase prefix sum)",
            !plan.contains("Window"), name))
        case "lm_rouge_pairs" =>
          checks += (("lm_rouge_pairs computes overlaps without any aggregation exchange",
            !plan.contains("HashAggregate"), name))
        case "dd_bloom_membership" =>
          checks += (("bloom prefilter runs as a native expression, not a boxed UDF",
            !plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython") &&
              plan.contains("might_contain"), name))
        case "sim_knn_graph" =>
          checks += (("knn graph candidates meet via cell equi-join, never a cross join",
            !plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
            name))
        case "ml_knn_predict" =>
          checks += (("knn vote broadcasts the query side (corpus never shuffles pre-window)",
            plan.contains("Broadcast") && !plan.contains("CartesianProduct"), name))
        case "sim_dbscan_bucketed" =>
          checks += (("bucketed DBSCAN pairs meet via the halo-cell equi-join, never a cross join",
            plan.contains("graft_halo_cells") && !plan.contains("CartesianProduct") &&
              !plan.contains("BroadcastNestedLoopJoin"), name))
        case "q_events_funnel" =>
          // expect exactly 1 hash exchange: the three stacked Window
          // operators and the per-user HashAggregate all reuse the
          // user_id partitioning; the final global agg is a SinglePartition
          // exchange, counted separately by matching hashpartitioning only
          val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
          checks += ((s"q_events_funnel: stage windows + user collapse share ONE hash shuffle ($hashEx seen)",
            hashEx <= 1, name))
        case "dd_keep_list" =>
          checks += (("dd_keep_list joins via equi-joins only (no cross/nested-loop join)",
            !plan.contains("CartesianProduct") &&
              !plan.contains("BroadcastNestedLoopJoin"), name))
        case "q_events_rolling" =>
          val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
          checks += ((s"q_events_rolling: RANGE window rides one user_id hash shuffle ($hashEx seen)",
            hashEx <= 1 && plan.contains("Window"), name))
        case "sim_ann_ivf_indexed" =>
          checks += (("indexed IVF probe: index scan carries a dynamicpruning partition filter",
            plan.contains("dynamicpruning"), name))
          checks += (("indexed IVF probe: candidates meet via cell equi-join, never a cross join",
            !plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
            name))
        case "ft_conversation_ann_serve" =>
          checks += (("conversation serve: pool-index scan carries a non-empty static PartitionFilters IN list",
            "PartitionFilters: \\[cell".r.findFirstIn(plan).isDefined &&
              plan.contains(" IN ("), name))
          checks += (("conversation serve: query meets candidates via cell equi-join, never a cross join",
            !plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
            name))
          checks += (("conversation serve: bounded query batch broadcast over the index scan — no shuffle/sort of the pool, with or without AQE",
            plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
            name))
          // r19: the conv probe itself runs BEFORE the batch's
          // localCheckpoint, so this plan cannot show it — the native
          // graft_probek pin for the shared KMeansQuantizer
          // .probeAmongCol override (the fix for the conv decade row's
          // 1.27 exponent) is asserted on the ivfpq serve plans below,
          // where the probe is lineage-visible, and tie-for-tie
          // equality is spec-pinned in QuantizerSpec at k=8/k=160
          checks += (("conversation serve: no interpreted struct sort or boxed UDF anywhere in the serve plan",
            !plan.contains("array_sort") && !plan.contains("sort_array") &&
              !plan.contains("ScalaUDF"), name))
        case "dd_exact_substring" =>
          checks += (("exact-substring dedup: shingles meet their df counts via equi-join, never a cross/nested-loop join",
            !plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
            name))
        case "dd_span_dedup" =>
          checks += (("span dedup: blocks meet their df counts via equi-join, never a cross/nested-loop join",
            !plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
            name))
          checks += (("span dedup: block df count is a hash aggregate (map-side combinable), no Window over block keys",
            plan.contains("HashAggregate") && !plan.contains("Window"), name))
        case "ds_pii_scrub" =>
          checks += (("pii scrub is a pure map stage (no join/agg/window before the sort)",
            !plan.contains("HashAggregate") && !plan.contains("Join") &&
              !plan.contains("Window"), name))
          checks += (("pii scrub runs native expressions, not boxed UDFs",
            !plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), name))
        case "ds_token_budget" =>
          checks += (("ds_token_budget has no Window operator (two-phase grouped prefix sum)",
            !plan.contains("Window"), name))
        case "sim_ann_ivfpq_serve" =>
          checks += (("IVF-PQ serve: candidates meet via cell equi-join with the query batch broadcast — corpus never shuffles pre-window",
            plan.contains("BroadcastHashJoin") && !plan.contains("CartesianProduct") &&
              !plan.contains("BroadcastNestedLoopJoin") && !plan.contains("SortMergeJoin"),
            name))
          checks += (("IVF-PQ serve: residual encode + ADC run as native expressions, not boxed UDFs",
            plan.contains("graft_pq_adc") && !plan.contains("ScalaUDF") &&
              !plan.contains("BatchEvalPython"), name))
          // r19: KMeansQuantizer.probeAmongCol is the native
          // graft_probek expression — the composable k-struct
          // array_sort form ran INTERPRETED at pool-proportional k on
          // the conversation serve (corpus-sized query batches) and
          // dominated that decade row's 1.27 exponent; this plan is
          // where the shared override is lineage-visible
          checks += (("IVF-PQ serve: multi-probe is ONE native graft_probek call (codegen at any k), never the k-struct array_sort",
            plan.contains("graft_probek") && !plan.contains("array_sort") &&
              !plan.contains("sort_array"), name))
        case "sim_ann_ivfpq_indexed" =>
          checks += (("indexed IVF-PQ: the ADC pass scans pq_codes WITHOUT the full-vector column (column pruning)",
            "ReadSchema: [^\n]*pq_codes".r.findAllIn(plan)
              .exists(s => !s.contains("v:array")), name))
          checks += (("indexed IVF-PQ: candidates meet via cell equi-join, never a cross join",
            !plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
            name))
          checks += (("indexed IVF-PQ: no ScalaUDF on the serve path (residual/ADC native)",
            plan.contains("graft_pq_adc") && !plan.contains("ScalaUDF"), name))
        case "ta_gopher_rules" | "ta_c4_rules" =>
          checks += ((s"$name is a pure map stage (no join/agg/window before the oracle sort)",
            !plan.contains("HashAggregate") && !plan.contains("Join") &&
              !plan.contains("Window"), name))
          checks += ((s"$name reads only (doc_id, text)",
            "ReadSchema: [^\n]*doc_id[^\n]*text".r.findFirstIn(plan).isDefined &&
              !plan.contains("lang:string"), name))
          checks += ((s"$name runs native expressions, not boxed UDFs",
            !plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), name))
        case "ml_metrics_auc" =>
          checks += (("AUC scoring uses the native graft_json_long extractor, not the general parser or a UDF",
            plan.contains("graft_json_long") && !plan.contains("ScalaUDF") &&
              !plan.contains("get_json_object"), name))
        case "ta_unigram_encode" =>
          checks += (("unigram encode: no pair space — no cross/nested-loop join anywhere",
            !plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
            name))
          checks += (("unigram encode: no Window operator (vocab ranking is bounded driver work)",
            !plan.contains("Window"), name))
        case "ds_heavy_hitters_sketch" =>
          // TypedImperativeAggregate plans as ObjectHashAggregate; the
          // partial (map-side) instance must exist so per-partition
          // state is O(k) BEFORE the single-partition exchange
          checks += (("space-saving sketch partial-aggregates map-side (ObjectHashAggregate x2)",
            "ObjectHashAggregate".r.findAllIn(plan).size >= 2, name))
          checks += (("space-saving sketch: exactly one single-partition exchange (the k-sized buffers)",
            "Exchange SinglePartition".r.findAllIn(plan).size <= 1 &&
              !plan.contains("Exchange hashpartitioning"), name))
        case "curation_base_stage" =>
          checks += (("curation stages keep the corpus filter pushed to the scan",
            plan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThanOrEqual(doc_id,20)]"),
            name))
          checks += (("curation base reads only (doc_id, source, text) — no lang/n_chars",
            !plan.contains("lang:string") && !plan.contains("n_chars"), name))
          checks += (("curation rule stages run native expressions, not boxed UDFs",
            !plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), name))
        case "knn_graph_multiprobe" =>
          checks += (("multi-probe kNN: candidates meet via cell equi-join, never a cross join",
            !plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
            name))
          checks += (("multi-probe kNN: ranking is the bounded graft_topk_min aggregate, no Window sort",
            plan.contains("graft_topk_min") && !plan.contains("Window"), name))
          checks += (("multi-probe kNN: no (src,dst) dedupe exchange — dupes collapse inside the k*probes array",
            plan.contains("array_distinct"), name))
        case "trained_adaptive_probe" =>
          checks += (("trained probe is the native graft_probe2 expression",
            plan.contains("graft_probe2"), name))
          checks += (("trained probe plan carries no k-struct sort (the interpreted form) and no boxed UDF",
            !plan.contains("array_sort") && !plan.contains("sort_array") &&
              !plan.contains("ScalaUDF"), name))
        case "curation_full_enrichment" =>
          checks += (("full-rule enrichment: benchmark rows meet the corpus via BroadcastHashJoin only",
            plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin") &&
              !plan.contains("CartesianProduct"), name))
          checks += (("full-rule enrichment: corpus never shuffles (no hash exchange) and no aggregate/window before the rules",
            !plan.contains("Exchange hashpartitioning") &&
              !plan.contains("HashAggregate") && !plan.contains("Window"), name))
          checks += (("full-rule enrichment: corpus filter doc_id >= 20 pushed into the parquet scan",
            plan.contains("GreaterThanOrEqual(doc_id,20)"), name))
        case "ft_generate_train1" =>
          checks += (("ft_generate_train1: n-gram counts + argmax partial-aggregate map-side (the Brants 2007 distributed-counting claim)",
            plan.contains("partial_"), name))
          checks += (("ft_generate_train1: no Window / cross join / boxed UDF anywhere in the model build",
            !plan.contains("Window") && !plan.contains("CartesianProduct") &&
              !plan.contains("BroadcastNestedLoopJoin") && !plan.contains("ScalaUDF"),
            name))
        case _ => ()
      }
    }

    sb.append("\n## Assertions\n\n")
    checks.foreach { case (what, ok, _) =>
      sb.append(s"- ${if (ok) "PASS" else "FAIL"}: $what\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"[planaudit] wrote $out; " +
      s"${checks.count(_._2)}/${checks.size} assertions pass")
    checks.filterNot(_._2).foreach(c => println(s"[planaudit] FAIL: ${c._1}"))
    spark.stop()
  }
}
