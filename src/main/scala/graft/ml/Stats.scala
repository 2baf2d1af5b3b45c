package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Snapshot column analytics — the reference's `analyze` pass
  * (`/root/reference/src/orm/snapshot.rs:252-366`): per-column min, max,
  * max_abs, mean, median, mode, variance, std_dev, missing, distinct,
  * 20-bin histogram, 19 ventiles.
  *
  * Scale design: the reference loops a cursor row-at-a-time on one core;
  * here the scalar stats for ALL columns are ONE distributed `agg` pass
  * over the scan (map-side partial aggregation), histograms are a second
  * pass (they need min/max), and modes are one groupBy per categorical
  * column. 3 scans total regardless of column count, each
  * whole-stage-codegen'd — this is the shape that survives 100 TB.
  *
  * Determinism: means/variances use exact DECIMAL accumulation in the
  * computational form (Σx, Σx²) so results don't depend on partition
  * merge order; medians/ventiles use exact `percentile` (linear
  * interpolation, matching DuckDB `quantile_cont`). At extreme scale the
  * exact percentile sort can be swapped for `approx_percentile` via
  * `exactPercentiles = false`.
  */
object Stats {

  final case class NumericStats(
      name: String, min: Double, max: Double, maxAbs: Double, mean: Double,
      median: Double, variance: Double, stdDev: Double, missing: Long,
      distinct: Long, ventiles: Seq[Double])

  private val dec4 = DecimalType(28, 4)
  private val dec6 = DecimalType(28, 6)

  val ventileProbs: Seq[Double] = (1 to 19).map(_ * 0.05)

  /** Exact interpolated percentiles (R-7, matching Spark `percentile` and
    * DuckDB `quantile_cont`) via distributed order statistics:
    * groupBy(value)→counts (map-side combinable shuffle), cumulative rank
    * over the sorted distinct values, then a broadcast range-join picks
    * the two bracketing order statistics per probability.
    *
    * This replaces Spark's `percentile` aggregate, whose per-partition
    * value→count hashmaps are merged single-threaded on the driver —
    * measured ~18 s for 4 columns at sf0.1 vs ~2 s this way, and the
    * count-based shuffle is the shape that survives 100 TB (the cumsum
    * window is over DISTINCT values; for billions of distinct values the
    * upgrade path is a two-phase partition-prefix sum, same plan shape). */
  def exactPercentiles(df: DataFrame, c: String, probs: Seq[Double]): Seq[Double] =
    exactPercentilesMulti(df, Seq(c), probs)(c)

  /** All columns in ONE unpivoted pass: `stack` → (col, value) rows, one
    * count-combine shuffle, per-column cumsum windows (parallel across
    * columns), one broadcast range-join for every (column, probability)
    * bracket. Job count is constant in the number of columns. */
  def exactPercentilesMulti(df: DataFrame, cols: Seq[String],
      probs: Seq[Double]): Map[String, Seq[Double]] =
    // r20: needDistinct=false — every caller of this entry discards the
    // distinct counts, and computing them was one whole groupBy+collect
    // job over the (cname, v) relation per percentile call (ml_ventiles,
    // the curation family's five p25 calls, the Huber solver's medians)
    percentilesAndDistinctFromCounts(
      stackedCounts(df, cols).filter(col("v").isNotNull && !isnan(col("v"))),
      cols, probs, needDistinct = false)._1

  /** [[exactPercentilesMulti]] plus each column's DISTINCT count for
    * free: the pass already aggregates to one row per (column, value),
    * so n_distinct is a row count per column of that relation — no
    * separate count(DISTINCT) scan and, critically at scale, no
    * Catalyst Expand multiplying the corpus ×|cols| through a second
    * shuffle (the job ml_col_stats used to pay; its removal measured
    * the gate's 10× slope 0.70 → see SCALE.md). */
  def exactPercentilesAndDistinct(df: DataFrame, cols: Seq[String],
      probs: Seq[Double]): (Map[String, Seq[Double]], Map[String, Long]) =
    percentilesAndDistinctFromCounts(
      stackedCounts(df, cols).filter(col("v").isNotNull && !isnan(col("v"))),
      cols, probs)

  /** ONE stacked corpus scan → (cname, v, cnt), null/NaN value groups
    * RETAINED (callers that want order statistics filter them; the
    * analyze pass reads its missing counts from them). This relation is
    * the whole analyze pass's data source: scalar moments are exact
    * weighted sums over it (dec(v)·cnt ≡ the row-wise decimal sum,
    * bit-for-bit), order statistics ride its prefix sum, and distinct
    * counts are its row counts — so the corpus is scanned once, not
    * once per statistic family. */
  private def stackedCounts(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stackExpr = s"stack(${cols.size}, " +
      cols.map(c => s"'${c.replace("'", "''")}', CAST(`$c` AS DOUBLE)").mkString(", ") +
      ") AS (cname, v)"
    df.selectExpr(stackExpr)
      .groupBy(col("cname"), col("v")).agg(count(lit(1)).as("cnt"))
  }

  /** The percentile + distinct machinery over an already-built clean
    * (cname, v, cnt) relation. */
  private def percentilesAndDistinctFromCounts(counts: DataFrame,
      cols: Seq[String], probs: Seq[Double],
      needDistinct: Boolean = true): (Map[String, Seq[Double]], Map[String, Long]) = {
    // two-phase partition-prefix sum: parallelism is bounded by the range
    // partitioning of (cname, v), not by the number of columns — the
    // per-column cumsum window capped parallelism at |cols| and put each
    // column's whole distinct set in one task
    val (cum0, totals) = graft.operators.Distributed
      .groupedPrefixSumWithTotals(counts, Seq("cname"), Seq(col("v")), "cnt", "cum")
    // cache only when the distinct pass will re-read the relation —
    // with needDistinct=false (every internal caller since r20) the
    // rank extraction is the SOLE consumer and the cache write is
    // pure overhead (the underlying sorted RDD is already pinned
    // inside the prefix sum)
    val cum1 = cum0.withColumn("prev", col("cum") - col("cnt"))
    val cum = if (needDistinct) cum1.cache() else cum1
    try {
      // per-column row counts fall out of the prefix sum's own metadata —
      // no extra aggregation pass over the cumulative relation
      val ns: Map[String, Long] =
        totals.map { case (k, n) => k.head.asInstanceOf[String] -> n }
      // a column absent from the totals has no non-null rows (empty or
      // all-null relation — ADVICE r16): no order statistic exists, so
      // no bracket is emitted and its percentiles default to NaN below
      val brackets: Seq[(String, Int, Long, Long, Double)] = for {
        c <- cols if ns.contains(c)
        (p, i) <- probs.zipWithIndex
      } yield {
        val pos = p * (ns(c) - 1) // 0-based fractional order statistic
        (c, i, math.floor(pos).toLong + 1L, math.ceil(pos).toLong + 1L,
          pos - math.floor(pos))
      }
      // order-statistic extraction WITHOUT a range join: the needed ranks
      // per column ride in as a map literal; a codegen'd lambda filter +
      // explode emits only the crossing rows (≤ 2·|probs| per column)
      val rankMap: Map[String, Seq[Long]] =
        brackets.groupBy(_._1).map { case (c, bs) =>
          c -> bs.flatMap(b => Seq(b._3, b._4)).distinct.sorted
        }
      val matched = cum
        .withColumn("__ranks", element_at(typedlit(rankMap), col("cname")))
        .select(col("cname"), col("v"),
          explode(filter(col("__ranks"),
            r => col("prev") < r && r <= col("cum"))).as("rank"))
        .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getDouble(1)).toMap
      // (1−frac)·lo + frac·hi — DuckDB quantile_cont's exact expression
      // shape; Scala doubles perform the identical IEEE ops.
      val res = brackets.map { case (c, i, lo, hi, frac) =>
        (c, i) -> ((1.0 - frac) * matched((c, lo)) + frac * matched((c, hi)))
      }.toMap
      val distinct: Map[String, Long] =
        if (!needDistinct) Map.empty
        else cum.groupBy(col("cname")).agg(count(lit(1)).as("nd"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      (cols.map(c => c -> probs.indices.map(i =>
        res.getOrElse((c, i), Double.NaN)).toSeq).toMap,
        cols.map(c => c -> distinct.getOrElse(c, 0L)).toMap)
    } finally { if (needDistinct) cum.unpersist(): Unit }
  }

  /** Scalar stats + percentiles for the given numeric columns.
    *
    * Exact path (default): ONE stacked corpus scan into the shared
    * (cname, v, cnt) relation, from which every statistic family
    * derives — scalar moments as exact weighted decimal sums, order
    * statistics via the two-phase prefix sum, distinct counts as row
    * counts, missing as the null/NaN groups' mass. History: the r2
    * shape mixed count(DISTINCT) into one agg (Catalyst Expand ×|cols|,
    * 40s+ at sf0.1); the split shape paid three corpus scans; r16
    * measured the scalar scan at 18 s of the 19.5 s gate at 10× and
    * folded it into the counts relation. */
  def analyzeNumeric(df: DataFrame, cols: Seq[String],
      useExactPercentiles: Boolean = true,
      withVentiles: Boolean = true): Seq[NumericStats] = {
    // approx fallback path runs its independent jobs concurrently; the
    // exact path below is single-scan and needs no overlap
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val aggs: Seq[Column] = cols.flatMap { c0 =>
      val c = col(c0).cast("double")
      Seq(
        min(c).as(s"${c0}__min"),
        max(c).as(s"${c0}__max"),
        max(abs(c)).as(s"${c0}__maxabs"),
        sum(c.cast(dec4)).cast("double").as(s"${c0}__sum"),
        sum((c * c).cast(dec6)).cast("double").as(s"${c0}__sumsq"),
        count(when(c.isNull || isnan(c), 1)).as(s"${c0}__missing"),
        count(c).as(s"${c0}__n"))
    }
    val allProbs = if (withVentiles) 0.5 +: ventileProbs else Seq(0.5)
    if (useExactPercentiles) {
      // single-scan exact path: ONE stacked (cname, v, cnt) relation
      // (cached) feeds everything — scalar moments as exact weighted
      // decimal sums (dec(v)·cnt ≡ the row-wise decimal sum bit-exact,
      // since the per-value quantization and the total are identical),
      // order statistics via the prefix sum, distinct = row counts,
      // missing = the null/NaN groups' mass. The previous shape paid a
      // SECOND full corpus scan for the scalar aggregates (measured
      // 18 s of the analyze gate's 19.5 s at 10× sf0.1) and, before
      // r16, a THIRD for count(DISTINCT) with a ×|cols| Expand.
      val all = stackedCounts(df, cols)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val ok = col("v").isNotNull && !isnan(col("v"))
        val statRows = all.groupBy(col("cname")).agg(
          min(when(ok, col("v"))).as("mn"),
          max(when(ok, col("v"))).as("mx"),
          max(when(ok, abs(col("v")))).as("mxa"),
          sum(when(ok, col("v").cast(dec4) * col("cnt"))).cast("double").as("sm"),
          sum(when(ok, (col("v") * col("v")).cast(dec6) * col("cnt")))
            .cast("double").as("smsq"),
          coalesce(sum(when(!ok, col("cnt"))), lit(0L)).as("missing"),
          coalesce(sum(when(ok, col("cnt"))), lit(0L)).as("n"),
          count(when(ok, lit(1))).as("nd"))
          .collect().map(r => r.getString(0) -> r).toMap
        // needDistinct=false: n_distinct already fell out of the scalar
        // agg above (`nd`); the percentile pass must not recount it
        val (pctsByCol, _) = percentilesAndDistinctFromCounts(
          all.filter(ok), cols, allProbs, needDistinct = false)
        return cols.map { c =>
          // empty or all-null relation → zero groups (or only null
          // groups) in the stacked counts (ADVICE r16: the pre-r16 agg
          // path returned a null row here and degraded; the single-scan
          // path must not throw on a lookup miss or a null unboxing) —
          // surface the degenerate stats explicitly
          if (!statRows.contains(c) || statRows(c).getAs[Long]("n") == 0L) {
            val nan = Double.NaN
            val miss = statRows.get(c).map(_.getAs[Long]("missing")).getOrElse(0L)
            NumericStats(c, nan, nan, nan, nan, nan, nan, nan, miss, 0L,
              allProbs.tail.map(_ => nan))
          } else {
          val r = statRows(c)
          val n = r.getAs[Long]("n")
          val mean = r.getAs[Double]("sm") / n
          val variance = r.getAs[Double]("smsq") / n - mean * mean
          val pcts = pctsByCol(c)
          NumericStats(c, r.getAs[Double]("mn"), r.getAs[Double]("mx"),
            r.getAs[Double]("mxa"), mean, pcts.head, variance,
            math.sqrt(variance), r.getAs[Long]("missing"),
            r.getAs[Long]("nd"), pcts.tail.toSeq)
          }
        }
      } finally all.unpersist()
    }
    val rowF = Future(df.agg(aggs.head, aggs.tail: _*).head())
    val pctsF: Future[(Map[String, Seq[Double]], Map[String, Long])] = Future {
      {
        val pa = cols.map(c0 => expr(
          s"approx_percentile($c0, array(${allProbs.mkString(",")}), 10000)")
          .as(s"${c0}__pcts"))
        val dAggs = cols.map(c0 =>
          countDistinct(col(c0).cast("double")).as(s"${c0}__distinct"))
        val pr = df.agg(pa.head, pa.tail: _*).head()
        val dRow = df.agg(dAggs.head, dAggs.tail: _*).head()
        (cols.map(c => c -> pr.getAs[scala.collection.Seq[Double]](s"${c}__pcts").toSeq).toMap,
          cols.map(c => c -> dRow.getAs[Long](s"${c}__distinct")).toMap)
      }
    }
    val (row, (pctsByCol, distinctByCol)) = Await.result(
      for (a <- rowF; c <- pctsF) yield (a, c), Duration.Inf)
    cols.map { c =>
      def d(f: String) = row.getAs[Double](s"${c}__$f")
      def l(f: String) = row.getAs[Long](s"${c}__$f")
      val n = l("n")
      val mean = d("sum") / n
      val variance = d("sumsq") / n - mean * mean // population variance
      val pcts = pctsByCol(c)
      NumericStats(c, d("min"), d("max"), d("maxabs"), mean, pcts.head,
        variance, math.sqrt(variance), l("missing"),
        distinctByCol(c), pcts.tail.toSeq)
    }
  }

  /** Render analyzeNumeric as a DataFrame (one row per column). */
  def numericSummaryDF(spark: SparkSession, df: DataFrame, cols: Seq[String]): DataFrame = {
    val stats = analyzeNumeric(df, cols, withVentiles = false) // median only
    val rows = stats.map(s => Row(s.name, s.min, s.max, s.maxAbs, s.mean,
      s.median, s.variance, s.stdDev, s.missing, s.distinct))
    val schema = StructType(Seq(
      StructField("col_name", StringType), StructField("min", DoubleType),
      StructField("max", DoubleType), StructField("max_abs", DoubleType),
      StructField("mean", DoubleType), StructField("median", DoubleType),
      StructField("variance", DoubleType), StructField("std_dev", DoubleType),
      StructField("missing", LongType), StructField("n_distinct", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Ventiles as a (col_name, p, value) DataFrame — percentile pass
    * only, no scalar/distinct jobs. */
  def ventilesDF(spark: SparkSession, df: DataFrame, cols: Seq[String]): DataFrame = {
    val pcts = exactPercentilesMulti(df, cols, ventileProbs)
    val rows = for {
      c <- cols
      (p, v) <- ventileProbs.zip(pcts(c))
    } yield Row(c, p, v)
    val schema = StructType(Seq(
      StructField("col_name", StringType), StructField("p", DoubleType),
      StructField("value", DoubleType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toList, 1), schema)
  }

  /** 20-bin equi-width histogram per column: bin = min(19,
    * ⌊(x−min)/(max−min)·20⌋), counts per (col, bin). Exactly two scans
    * regardless of column count: one agg carries every column's min/max,
    * then one unpivoted groupBy bins all columns together (the previous
    * shape ran a separate min/max job + count scan per column). */
  def histogramDF(df: DataFrame, cols: Seq[String], bins: Int = 20): DataFrame = {
    val mmAggs = cols.flatMap { c0 =>
      val c = col(c0).cast("double")
      Seq(min(c).as(s"${c0}__mn"), max(c).as(s"${c0}__mx"))
    }
    val mm = df.agg(mmAggs.head, mmAggs.tail: _*).head()
    val per = cols.map { c0 =>
      val c = col(c0).cast("double")
      val (mn, mx) = (mm.getAs[Double](s"${c0}__mn"), mm.getAs[Double](s"${c0}__mx"))
      struct(lit(c0).as("col_name"),
        least(lit(bins - 1),
          floor((c - lit(mn)) / (lit(mx) - lit(mn)) * bins)).cast("long").as("bin"))
    }
    df.select(explode(array(per: _*)).as("cb"))
      .groupBy(col("cb.col_name").as("col_name"), col("cb.bin").as("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("col_name"), col("bin"))
  }

  /** Mode per (categorical) column: highest count, ties broken by the
    * smallest value — the reference's deterministic tie rule
    * (`snapshot.rs` mode = middle of longest streak over sorted data,
    * which for count ties resolves to the lexicographically first). */
  def modesDF(df: DataFrame, cols: Seq[String]): DataFrame = {
    // argmax WITHOUT a window: the old shape windowed over a constant
    // `col_name` partition key, which Catalyst constant-folds away —
    // leaving a SINGLE-PARTITION WindowExec that funnels every distinct
    // value through one task (fatal for a high-cardinality column at
    // scale). min(struct(−n, value)) encodes the exact tie rule —
    // highest count, then smallest value — as a map-side-combinable
    // aggregate over the grouped counts.
    val per = cols.map { c0 =>
      df.groupBy(col(c0).cast("string").as("value"))
        .agg(count(lit(1)).as("n"))
        .agg(min(struct((-col("n")).as("negn"), col("value"))).as("m"))
        // an ungrouped agg over an EMPTY input still emits one row with
        // a null aggregate; the windowed shape this replaced emitted
        // zero rows for an empty table, so preserve that contract
        .filter(col("m").isNotNull)
        .select(lit(c0).as("col_name"), col("m.value").as("mode_value"),
          (-col("m.negn")).as("n"))
    }
    per.reduce(_ unionAll _).orderBy(col("col_name"))
  }

  /** Target-encoding statistics: per category mean of the label (exact
    * decimal accumulation) plus the global mean as the unseen-category
    * fallback — reference semantics at `snapshot.rs:258-276`. */
  def targetEncodingDF(df: DataFrame, catCol: String, labelCol: String): DataFrame = {
    val y = col(labelCol).cast("double")
    val global = df.agg(
      (sum(y.cast(dec4)).cast("double") / count(lit(1))).as("g")).head().getDouble(0)
    df.groupBy(col(catCol).cast("string").as("category"))
      .agg((sum(y.cast(dec4)).cast("double") / count(lit(1))).as("target_mean"),
        count(lit(1)).as("n"))
      .withColumn("global_mean", lit(global))
      .orderBy(col("category"))
  }
}
