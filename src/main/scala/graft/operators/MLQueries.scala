package graft.operators

import graft.Tables
import graft.ml._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-checked queries that exercise the ML layer (SURVEY §2.2): the
  * snapshot analyze pass, ventiles, histograms, modes, target encoding,
  * split arithmetic, the native metrics, closed-form OLS, k-means
  * assignment, and the full train() lifecycle contract.
  *
  * Each query routes through the REAL ml.* code (Stats/Metrics/Sampling/
  * Train), then the oracle SQL recomputes the same quantity from first
  * principles in DuckDB — so a pass means the ML implementation, not just
  * the query text, is correct.
  */
object MLQueries {
  private val dec4 = DecimalType(28, 4)

  // ------------------------------------------------------------ analyze
  private val statCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def ml_col_stats(s: SparkSession, dir: String): DataFrame =
    Stats.numericSummaryDF(s, Tables.lineitem(s, dir), statCols)

  val mlColStatsSql: String = statCols.map { c =>
    s"""SELECT '$c' AS col_name, CAST(min($c) AS DOUBLE) AS min,
       |  CAST(max($c) AS DOUBLE) AS max, CAST(max(abs($c)) AS DOUBLE) AS max_abs,
       |  CAST(sum(CAST($c AS DECIMAL(28,4))) AS DOUBLE) / count($c) AS mean,
       |  quantile_cont($c, 0.5) AS median,
       |  CAST(sum(CAST($c * $c AS DECIMAL(28,6))) AS DOUBLE) / count($c)
       |    - (CAST(sum(CAST($c AS DECIMAL(28,4))) AS DOUBLE) / count($c))
       |      * (CAST(sum(CAST($c AS DECIMAL(28,4))) AS DOUBLE) / count($c)) AS variance,
       |  sqrt(CAST(sum(CAST($c * $c AS DECIMAL(28,6))) AS DOUBLE) / count($c)
       |    - (CAST(sum(CAST($c AS DECIMAL(28,4))) AS DOUBLE) / count($c))
       |      * (CAST(sum(CAST($c AS DECIMAL(28,4))) AS DOUBLE) / count($c))) AS std_dev,
       |  count(*) - count($c) AS missing, count(DISTINCT $c) AS n_distinct
       |FROM lineitem""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  // ----------------------------------------------------------- ventiles
  private val ventCols = Seq("l_quantity", "l_extendedprice")

  def ml_ventiles(s: SparkSession, dir: String): DataFrame =
    Stats.ventilesDF(s, Tables.lineitem(s, dir), ventCols)

  val mlVentilesSql: String = {
    // String→double casts: numeric literals parse as DECIMAL in DuckDB
    // and the decimal→double path rounds 17-digit values differently;
    // strtod on the quoted string yields the exact same double as Scala.
    val plist = Stats.ventileProbs.map(p => s"CAST('$p' AS DOUBLE)").mkString(", ")
    ventCols.map { c =>
      s"""SELECT '$c' AS col_name, unnest([$plist]) AS p,
         |  unnest(quantile_cont($c, [$plist])) AS value
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name, p")
  }

  // ---------------------------------------------------------- histogram
  def ml_histogram(s: SparkSession, dir: String): DataFrame =
    Stats.histogramDF(Tables.lineitem(s, dir), Seq("l_extendedprice"))
      .unionAll(Stats.histogramDF(Tables.orders(s, dir), Seq("o_totalprice")))
      .orderBy(col("col_name"), col("bin"))

  val mlHistogramSql: String = {
    def one(tbl: String, c: String) =
      s"""SELECT '$c' AS col_name,
         |  CAST(least(19, floor(($c - mn) / (mx - mn) * 20)) AS BIGINT) AS bin,
         |  count(*) AS n
         |FROM $tbl, (SELECT min($c) AS mn, max($c) AS mx FROM $tbl) mm
         |GROUP BY 1, 2""".stripMargin
    one("lineitem", "l_extendedprice") + "\nUNION ALL\n" +
      one("orders", "o_totalprice") + "\nORDER BY col_name, bin"
  }

  // -------------------------------------------------------------- modes
  def ml_modes(s: SparkSession, dir: String): DataFrame =
    Stats.modesDF(Tables.lineitem(s, dir), Seq("l_returnflag", "l_linestatus"))
      .unionAll(Stats.modesDF(Tables.orders(s, dir), Seq("o_orderpriority")))
      .orderBy(col("col_name"))

  val mlModesSql: String = {
    def one(tbl: String, c: String) =
      s"""SELECT col_name, mode_value, n FROM (
         |  SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS mode_value,
         |    count(*) AS n,
         |    row_number() OVER (ORDER BY count(*) DESC, CAST($c AS VARCHAR)) AS rn
         |  FROM $tbl GROUP BY $c) t WHERE rn = 1""".stripMargin
    Seq(one("lineitem", "l_returnflag"), one("lineitem", "l_linestatus"),
      one("orders", "o_orderpriority")).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // ----------------------------------------------------- target encoding
  def ml_target_encode(s: SparkSession, dir: String): DataFrame =
    Stats.targetEncodingDF(Tables.orders(s, dir), "o_orderpriority", "o_totalprice")

  val mlTargetEncodeSql: String =
    """SELECT CAST(o_orderpriority AS VARCHAR) AS category,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) / count(*) AS target_mean,
      |  count(*) AS n,
      |  (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) / count(*)
      |   FROM orders) AS global_mean
      |FROM orders GROUP BY o_orderpriority ORDER BY category""".stripMargin

  // ------------------------------------------------------ split ("last")
  def ml_split_last(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val (tr, te) = Sampling.split(o, Sampling.LastSampling, Seq.empty,
      Seq("o_orderkey"), 0.25)
    def summarize(df: DataFrame, tag: String) =
      df.agg(count(lit(1)).as("n_rows"), min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key")).withColumn("split", lit(tag))
        .select($"split", $"n_rows", $"min_key", $"max_key")
    summarize(tr, "train").unionAll(summarize(te, "test")).orderBy($"split")
  }

  val mlSplitLastSql: String =
    """WITH o AS (
      |  SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS rn,
      |    count(*) OVER () AS n
      |  FROM orders)
      |SELECT CASE WHEN rn <= n - CAST(round(n * 0.25) AS BIGINT)
      |            THEN 'train' ELSE 'test' END AS split,
      |  count(*) AS n_rows, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM o GROUP BY 1 ORDER BY split""".stripMargin

  // --------------------------------------------- classification metrics
  /** Rule classifier over events, scored by ml.Metrics.classification —
    * exercises the native confusion-matrix path end to end. The per-event
    * score uses the native `graft_json_long` flat-field extractor (the
    * general `get_json_object` path stays gate-covered by q_json_events):
    * the general parser made this linear map pass the steepest
    * events-family slope at ~2.2 µs/row (SCALE.md r14, exponent 0.70). */
  def ml_metrics_cls(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val jsonK = call_function("graft_json_long", $"props", lit("k"))
    val df = Tables.events(s, dir).select(
      when($"event_type".isin("purchase", "signup"), 1).otherwise(0).as("label"),
      when(jsonK >= 50, 1).otherwise(0).as("pred"))
    val rep = Metrics.classification(df, "label", "pred")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq("accuracy", "precision", "recall", "f1_macro", "f1_micro")
      .map(StructField(_, DoubleType)))
    s.createDataFrame(java.util.Arrays.asList(
      Row(rep.accuracy, rep.precision, rep.recall, rep.f1Macro, rep.f1Micro)), schema)
  }

  val mlMetricsClsSql: String =
    """WITH lp AS (
      |  SELECT CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS label,
      |    CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
      |         THEN 1 ELSE 0 END AS pred
      |  FROM events),
      |cm AS (
      |  SELECT sum(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END) AS tp,
      |    sum(CASE WHEN label = 0 AND pred = 1 THEN 1 ELSE 0 END) AS fp,
      |    sum(CASE WHEN label = 1 AND pred = 0 THEN 1 ELSE 0 END) AS fn,
      |    sum(CASE WHEN label = 0 AND pred = 0 THEN 1 ELSE 0 END) AS tn,
      |    count(*) AS n
      |  FROM lp)
      |SELECT CAST(tp + tn AS DOUBLE) / n AS accuracy,
      |  CAST(tp AS DOUBLE) / (tp + fp) AS precision,
      |  CAST(tp AS DOUBLE) / (tp + fn) AS recall,
      |  2.0 * ((CAST(tp AS DOUBLE) / (tp + fp)) * (CAST(tp AS DOUBLE) / (tp + fn)))
      |    / ((CAST(tp AS DOUBLE) / (tp + fp)) + (CAST(tp AS DOUBLE) / (tp + fn))) AS f1_macro,
      |  2.0 * ((CAST(tp AS DOUBLE) / (tp + fp)) * (CAST(tp AS DOUBLE) / (tp + fn)))
      |    / ((CAST(tp AS DOUBLE) / (tp + fp)) + (CAST(tp AS DOUBLE) / (tp + fn))) AS f1_micro
      |FROM cm""".stripMargin

  // ------------------------------------------- rank metrics (AUC / LL)
  /** Tie-aware ROC-AUC (ml.Metrics.rocAuc's midrank/Mann-Whitney form)
    * + clamped log-loss over the events rule-scorer — the rank-sweep
    * path under a hash-exact oracle. Both sides accumulate through
    * DECIMAL: the midrank·np terms are exact x.5 multiples (AUC emits
    * as DOUBLE, bit-exact), while the ln() terms quantize at 1e-12 and
    * the mean emits as REAL so a last-ulp libm divergence between
    * engines cannot flip the hash. */
  def ml_metrics_auc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val k = call_function("graft_json_long", $"props", lit("k"))
    val df = Tables.events(s, dir).select(
      when($"event_type".isin("purchase", "signup"), 1).otherwise(0).as("label"),
      k.cast("double").as("s")).filter($"s".isNotNull)
    val auc = Metrics.rocAuc(df, "label", "s")
    val eps = 1e-15
    val p = least(greatest($"s" / lit(100.0), lit(eps)), lit(1.0 - eps))
    val y = $"label".cast("double")
    val llRow = df.agg(
      sum((y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))
        .cast(org.apache.spark.sql.types.DecimalType(28, 12)))
        .cast("double").as("sl"),
      count(lit(1)).as("n")).head()
    val n = llRow.getLong(1)
    val ll = (-llRow.getDouble(0) / n).toFloat
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("roc_auc", DoubleType),
      StructField("log_loss", FloatType), StructField("n", LongType)))
    s.createDataFrame(java.util.Arrays.asList(Row(auc, ll, n)), schema)
  }

  val mlMetricsAucSql: String =
    """WITH lp AS (
      |  SELECT CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS label,
      |    CAST(json_extract_string(props, '$.k') AS DOUBLE) AS s
      |  FROM events
      |  WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) IS NOT NULL),
      |c AS (SELECT s, CAST(sum(label) AS BIGINT) AS np, count(*) AS cnt
      |      FROM lp GROUP BY s),
      |w AS (SELECT s, np, cnt,
      |        CAST(sum(cnt) OVER (ORDER BY s
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |      FROM c),
      |m AS (SELECT
      |        CAST(sum(CAST((cum - cnt + (cnt + 1) / 2.0) * np AS DECIMAL(28,6))) AS DOUBLE) AS sumpos,
      |        CAST(sum(np) AS BIGINT) AS npos,
      |        CAST(sum(cnt) AS BIGINT) AS nall
      |      FROM w),
      |l AS (SELECT
      |        CAST(sum(CAST(label * ln(least(greatest(s / 100.0, 1e-15), 1.0 - 1e-15))
      |          + (1 - label) * ln(1.0 - least(greatest(s / 100.0, 1e-15), 1.0 - 1e-15))
      |          AS DECIMAL(28,12))) AS DOUBLE) AS sl,
      |        count(*) AS n
      |      FROM lp)
      |SELECT (m.sumpos - m.npos * (m.npos + 1) / 2.0)
      |    / (m.npos * (m.nall - m.npos)) AS roc_auc,
      |  CAST(-l.sl / l.n AS REAL) AS log_loss, CAST(l.n AS BIGINT) AS n
      |FROM m, l""".stripMargin

  // ------------------------------------------------ calibration curve
  /** Reliability diagram buckets (the sklearn calibration_curve shape,
    * uniform strategy): predicted probability binned into 10 fixed-width
    * buckets, per-bucket support, mean predicted probability, and
    * observed positive fraction. ONE map-combinable groupBy to ≤10
    * rows — the aggregation form a 100 TB scoring validation pass
    * needs (no sort, no window; contrast ml_metrics_auc's rank
    * collapse). Exact arithmetic: p = k/100 is a 2-decimal exact
    * value, summed through DECIMAL; count ratios are integer/integer. */
  def ml_calibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val k = call_function("graft_json_long", $"props", lit("k"))
    val df = Tables.events(s, dir).select(
      when($"event_type".isin("purchase", "signup"), 1L).otherwise(0L).as("label"),
      (k.cast("double") / lit(100.0)).as("p")).filter($"p".isNotNull)
    df.withColumn("bin", least(floor($"p" * 10).cast("long"), lit(9L)))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"),
        (sum($"p".cast(dec4)).cast("double") / count(lit(1))).as("mean_pred"),
        (sum($"label").cast("double") / count(lit(1))).as("frac_pos"))
      .orderBy($"bin")
  }

  val mlCalibrationSql: String =
    """WITH lp AS (
      |  SELECT CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS label,
      |    CAST(json_extract_string(props, '$.k') AS DOUBLE) / 100.0 AS p
      |  FROM events
      |  WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) IS NOT NULL)
      |SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin,
      |  count(*) AS n,
      |  CAST(sum(CAST(p AS DECIMAL(28,4))) AS DOUBLE) / count(*) AS mean_pred,
      |  CAST(sum(label) AS DOUBLE) / count(*) AS frac_pos
      |FROM lp GROUP BY 1 ORDER BY bin""".stripMargin

  // ------------------------------------------------- regression metrics
  /** Deterministic rule predictor ŷ = 2·l_quantity + 100 scored by the
    * fixed-point regression aggregates (ml.Metrics.regressionAggs). */
  def ml_metrics_reg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val df = Tables.lineitem(s, dir).select(
      $"l_extendedprice".as("y"), (lit(2.0) * $"l_quantity" + lit(100.0)).as("p"))
    val aggs = Metrics.regressionAggs(col("y"), col("p"))
    // Metrics emitted as FLOAT: the reference stores metrics as f32, and
    // the double→float cast absorbs the 1-ulp wobble of casting a
    // 21-significant-digit DECIMAL sum to double (engine-dependent).
    df.agg(aggs.head, aggs.tail: _*)
      .select(
        (lit(1.0) - $"se" / ($"syy" - $"sy" * $"sy" / $"n")).cast("float").as("r2"),
        ($"sae" / $"n").cast("float").as("mae"),
        ($"se" / $"n").cast("float").as("mse"), $"n")
  }

  val mlMetricsRegSql: String =
    """WITH yp AS (
      |  SELECT l_extendedprice AS y, 2.0 * l_quantity + 100.0 AS p FROM lineitem),
      |a AS (
      |  SELECT CAST(sum(CAST(y AS DECIMAL(28,4))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(y * y AS DECIMAL(28,6))) AS DOUBLE) AS syy,
      |    CAST(sum(CAST((y - p) * (y - p) AS DECIMAL(28,6))) AS DOUBLE) AS se,
      |    CAST(sum(CAST(abs(y - p) AS DECIMAL(28,4))) AS DOUBLE) AS sae,
      |    count(*) AS n
      |  FROM yp)
      |SELECT CAST(1.0 - se / (syy - sy * sy / n) AS REAL) AS r2,
      |  CAST(sae / n AS REAL) AS mae, CAST(se / n AS REAL) AS mse, n
      |FROM a""".stripMargin

  // ------------------------------------------------------ closed-form OLS
  /** Single-feature OLS by exact normal equations — the deterministic
    * twin of MLlib LinearRegression (equality asserted in ScalaTest). */
  def ml_ols_regr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val df = Tables.lineitem(s, dir)
      .select($"l_quantity".as("x"), $"l_extendedprice".as("y"))
    df.agg(
      sum($"x".cast(dec4)).cast("double").as("sx"),
      sum($"y".cast(dec4)).cast("double").as("sy"),
      sum(($"x" * $"y").cast(dec4)).cast("double").as("sxy"),
      sum(($"x" * $"x").cast(dec4)).cast("double").as("sxx"),
      count(lit(1)).as("n"))
      .select(
        (($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx")).as("slope"),
        (($"sy" - (($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx")) * $"sx") / $"n").as("intercept"),
        $"n")
  }

  val mlOlsSql: String =
    """WITH a AS (
      |  SELECT CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
      |    count(*) AS n
      |  FROM lineitem)
      |SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
      |  (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept, n
      |FROM a""".stripMargin

  /** OLS predictions on the distinct feature values. */
  def ml_ols_predict(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val coef = ml_ols_regr(s, dir).select($"slope", $"intercept")
    Tables.lineitem(s, dir).select($"l_quantity".as("x")).distinct()
      .crossJoin(broadcast(coef))
      .select($"x", ($"intercept" + $"slope" * $"x").as("yhat"))
      .orderBy($"x")
  }

  val mlOlsPredictSql: String =
    """WITH a AS (
      |  SELECT CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
      |    count(*) AS n
      |  FROM lineitem),
      |c AS (SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
      |  (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept FROM a)
      |SELECT x, intercept + slope * x AS yhat
      |FROM (SELECT DISTINCT l_quantity AS x FROM lineitem) d, c
      |ORDER BY x""".stripMargin

  // -------------------------------------------------- k-means assignment
  /** Assignment step against 4 fixed closed-form centroids — verifies the
    * distance/argmin kernel the clustering path relies on. */
  private def centroid(k: Int): Seq[Double] =
    (0 until 64).map { i =>
      ((1103515245L * (k * 64 + i) + 12345L) % 2147483648L).toDouble / 2147483648.0 - 0.5
    }

  def ml_kmeans_assign(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val dists = (0 until 4).map { k =>
      call_function("graft_sqdist", $"v", typedlit(centroid(k))).as(s"d$k")
    }
    val withD = e.select(($"vec_id" +: dists): _*)
    val cluster = when($"d0" <= $"d1" && $"d0" <= $"d2" && $"d0" <= $"d3", 0L)
      .when($"d1" <= $"d2" && $"d1" <= $"d3", 1L)
      .when($"d2" <= $"d3", 2L).otherwise(3L)
    withD.withColumn("cluster", cluster)
      .groupBy($"cluster")
      .agg(count(lit(1)).as("n"), min($"vec_id").as("min_vec"), max($"vec_id").as("max_vec"))
      .orderBy($"cluster")
  }

  val mlKmeansSql: String = {
    def d(k: Int) =
      s"""list_sum(list_transform(range(1, len(v) + 1),
         |  i -> (v[i] - (CAST((1103515245 * ($k * 64 + (i - 1)) + 12345) % 2147483648 AS DOUBLE)
         |    / 2147483648.0 - 0.5))
         |    * (v[i] - (CAST((1103515245 * ($k * 64 + (i - 1)) + 12345) % 2147483648 AS DOUBLE)
         |    / 2147483648.0 - 0.5))))""".stripMargin
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |dd AS (SELECT vec_id, ${d(0)} AS d0, ${d(1)} AS d1, ${d(2)} AS d2, ${d(3)} AS d3 FROM e)
       |SELECT CAST(CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN 0
       |            WHEN d1 <= d2 AND d1 <= d3 THEN 1
       |            WHEN d2 <= d3 THEN 2 ELSE 3 END AS BIGINT) AS cluster,
       |  count(*) AS n, min(vec_id) AS min_vec, max(vec_id) AS max_vec
       |FROM dd GROUP BY 1 ORDER BY cluster""".stripMargin
  }

  /** k-NN classification (reference enum `algorithm.rs:12` `knn` —
    * never dispatched there; runnable here): 5 nearest train vectors by
    * euclidean distance vote on the class (label = train id mod 3, an
    * exact integer fixture); majority with ties → lower class. The
    * query side broadcasts and the corpus scans once (the sim_topk
    * shape); the IVF cell join is the scale path for the neighbor
    * search, same as the similarity family. All comparisons ride the
    * graft_sqdist fold (bit-exact vs the oracle) and the vote is pure
    * integer arithmetic. */
  def ml_knn_predict(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val test = e.filter($"vec_id" < 50)
      .select($"vec_id".as("qid"), $"v".as("vq"))
    val train = e.filter($"vec_id" >= 50)
      .select($"vec_id".as("tid"), ($"vec_id" % 3).as("label"), $"v".as("vt"))
    val scored = broadcast(test).join(train)
      .withColumn("sqd", call_function("graft_sqdist", $"vq", $"vt"))
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"sqd".asc, $"tid")
    val nn = scored.withColumn("rn", row_number().over(wk)).filter($"rn" <= 5)
    val votes = nn.groupBy($"qid", $"label").agg(count(lit(1)).as("n_votes"))
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"n_votes".desc, $"label")
    votes.withColumn("rv", row_number().over(wv)).filter($"rv" === 1)
      .select($"qid", $"label".as("pred_class"), $"n_votes")
      .orderBy($"qid")
  }

  val mlKnnSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS qid, t.vec_id AS tid, t.vec_id % 3 AS label,
       |    list_sum(list_transform(range(1, len(q.v) + 1),
       |      i -> (q.v[i] - t.v[i]) * (q.v[i] - t.v[i]))) AS sqd
       |  FROM e q JOIN e t ON q.vec_id < 50 AND t.vec_id >= 50),
       |nn AS (
       |  SELECT qid, label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sqd, tid) AS rn
       |    FROM scored) s
       |  WHERE rn <= 5),
       |votes AS (
       |  SELECT qid, label, CAST(count(*) AS BIGINT) AS n_votes
       |  FROM nn GROUP BY qid, label)
       |SELECT qid, label AS pred_class, n_votes FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY n_votes DESC, label) AS rv
       |  FROM votes) v
       |WHERE rv = 1 ORDER BY qid""".stripMargin

  // ------------------------------------------------- train() lifecycle
  /** Full train lifecycle on the builtin diabetes dataset into a fresh
    * temp catalog; the one-row contract output is deterministic. */
  def ml_train_contract(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_catalog").toString
    val cat = new Catalog(s, base)
    val df = Datasets.diabetes(s)
    Train.train(s, cat, Train.TrainConfig(
      projectName = "contract_demo", task = "regression",
      relationName = "quackml_diabetes", data = Some(df),
      yColumn = Seq("target"), algorithm = "linear",
      testSampling = "random", orderCols = Seq("age")))
  }

  val mlTrainContractSql: String =
    """SELECT 'contract_demo' AS project, 'regression' AS task,
      |  'linear' AS algorithm, CAST(true AS BOOLEAN) AS deploy""".stripMargin

  /** Multi-output lifecycle (linnerud, 3 targets — one regressor per
    * y_column): first model into a fresh catalog always deploys, so the
    * contract row is deterministic. */
  def ml_train_joint(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_catalog_j").toString
    val cat = new Catalog(s, base)
    Train.train(s, cat, Train.TrainConfig(
      projectName = "joint_demo", task = "regression",
      relationName = "quackml_linnerud", data = Some(Datasets.linnerud(s)),
      yColumn = Seq("weight", "waist", "pulse"), algorithm = "linear",
      testSampling = "random", orderCols = Seq("chins")))
  }

  val mlTrainJointSql: String =
    """SELECT 'joint_demo' AS project, 'regression' AS task,
      |  'linear' AS algorithm, CAST(true AS BOOLEAN) AS deploy""".stripMargin

  /** rbf-svm lifecycle (RFF feature map + linear stage) on diabetes. */
  def ml_train_svm_rbf(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_catalog_s").toString
    val cat = new Catalog(s, base)
    Train.train(s, cat, Train.TrainConfig(
      projectName = "svm_demo", task = "regression",
      relationName = "quackml_diabetes", data = Some(Datasets.diabetes(s)),
      yColumn = Seq("target"), algorithm = "svm",
      hyperparams = Map("n_components" -> "100"),
      testSampling = "random", orderCols = Seq("age")))
  }

  val mlTrainSvmSql: String =
    """SELECT 'svm_demo' AS project, 'regression' AS task,
      |  'svm' AS algorithm, CAST(true AS BOOLEAN) AS deploy""".stripMargin

  /** The exact one-vs-one kernel-SVM path as a driver gate (rows-only —
    * an SMO dual solve is not ANSI-SQL-expressible; SvmSpec and
    * TrainLifecycleSpec pin the machinery): fit a 4-class exact linear SVC
    * on the embeddings table with the LCG quantizer CELL as the label —
    * a deterministic, learnable target (cells are Voronoi regions of 4
    * fixed centroids, so the boundaries are exactly representable) —
    * and emit ONE summary row quality-floored on training accuracy:
    * 0 rows if the one-vs-one stack stops separating what it provably
    * can (the same silent-collapse guard as the ft_*_train gates). */
  /** Native histogram-GBDT lifecycle (HistGB scaladoc — the xgboost
    * dispatch, second-order Newton boosting on binned features) on
    * diabetes, quality-floored: the contract row only survives if the
    * held-out r2 clears a floor far below the measured ~0.4 (sklearn
    * GBT territory on this noisy 442-row dataset), so a silently
    * broken booster fails the gate as a row-count mismatch. */
  def ml_train_hgb(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_catalog_h").toString
    val cat = new Catalog(s, base)
    val out = Train.train(s, cat, Train.TrainConfig(
      projectName = "hgb_demo", task = "regression",
      relationName = "quackml_diabetes", data = Some(Datasets.diabetes(s)),
      yColumn = Seq("target"), algorithm = "xgboost",
      hyperparams = Map("n_estimators" -> "20"),
      testSampling = "random", orderCols = Seq("age")))
    val r2 = cat.models.collect().head.metrics("r2")
    out.filter(lit(r2) >= 0.2)
  }

  val mlTrainHgbSql: String =
    """SELECT 'hgb_demo' AS project, 'regression' AS task,
      |  'xgboost' AS algorithm, CAST(true AS BOOLEAN) AS deploy""".stripMargin

  /** True-sklearn bagging lifecycle (VERDICT r13 item 7 — the scheme
    * was spec-tested only; this pins it under the driver harness too):
    * per-estimator Poisson bootstrap + unpruned full-depth base trees
    * (Bagging.scala) on diabetes, quality-floored like [[ml_train_hgb]]:
    * the contract row only survives if held-out r2 clears a floor far
    * below the measured value, so a silently broken resample/vote fails
    * the gate as a row-count mismatch. */
  def ml_train_bagging(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_catalog_bg").toString
    val cat = new Catalog(s, base)
    // 5 unpruned estimators: the scheme (per-estimator bootstrap +
    // full-depth trees + mean vote) is what the gate pins; 10 default
    // trees of depth 30 ran 12.2 s at sf0.1 — past the per-gate budget
    val out = Train.train(s, cat, Train.TrainConfig(
      projectName = "bagging_demo", task = "regression",
      relationName = "quackml_diabetes", data = Some(Datasets.diabetes(s)),
      yColumn = Seq("target"), algorithm = "bagging",
      hyperparams = Map("n_estimators" -> "5"),
      testSampling = "random", orderCols = Seq("age")))
    val r2 = cat.models.collect().head.metrics("r2")
    out.filter(lit(r2) >= 0.2)
  }

  val mlTrainBaggingSql: String =
    """SELECT 'bagging_demo' AS project, 'regression' AS task,
      |  'bagging' AS algorithm, CAST(true AS BOOLEAN) AS deploy""".stripMargin

  def ml_train_svm_ovo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
      // deterministic id filter keeps the gate inside the exact-solver
      // cap at ANY scale factor (sf0.1 is exactly 2000 rows; larger SFs
      // would otherwise trip the guard) — vec_id < 2000, not limit(),
      // because limit without order is partition-order-dependent
      .filter($"vec_id" < 2000)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("label", LcgQuantizer.cellCol($"v").cast("double"))
      .withColumn("features",
        org.apache.spark.ml.functions.array_to_vector($"v"))
    // LINEAR kernel: Voronoi boundaries are hyperplanes, so the linear
    // one-vs-one stack represents them exactly (measured 0.98 train
    // accuracy; rbf with gamma=1/64 underfits these 64-d cells at 0.77)
    val m = new graft.ml.GraftSvm().setSvmTask("svc").setKernel("linear")
      .setRegC(10.0).setLabelCol("label").setFeaturesCol("features")
      .fit(e)
    val scored = m.transform(e)
    val n = e.count()
    val acc = scored.filter($"prediction" === $"label").count().toDouble / n
    val k = m.machines.length
    s.createDataset(Seq((n, 4L, k.toLong, acc)))
      .toDF("n_rows", "n_classes", "n_machines", "accuracy")
      .filter($"accuracy" >= 0.9 && $"n_machines" === 6)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_col_stats"      -> ml_col_stats _,
    "ml_ventiles"       -> ml_ventiles _,
    "ml_histogram"      -> ml_histogram _,
    "ml_modes"          -> ml_modes _,
    "ml_target_encode"  -> ml_target_encode _,
    "ml_split_last"     -> ml_split_last _,
    "ml_metrics_cls"    -> ml_metrics_cls _,
    "ml_metrics_auc"    -> ml_metrics_auc _,
    "ml_calibration"    -> ml_calibration _,
    "ml_metrics_reg"    -> ml_metrics_reg _,
    "ml_ols_regr"       -> ml_ols_regr _,
    "ml_ols_predict"    -> ml_ols_predict _,
    "ml_kmeans_assign"  -> ml_kmeans_assign _,
    "ml_knn_predict"    -> ml_knn_predict _,
    "ml_train_contract" -> ml_train_contract _,
    "ml_train_joint"    -> ml_train_joint _,
    "ml_train_svm_rbf"  -> ml_train_svm_rbf _,
    "ml_train_svm_ovo"  -> ml_train_svm_ovo _,
    "ml_train_hgb"      -> ml_train_hgb _,
    "ml_train_bagging"  -> ml_train_bagging _
  )

  val oracles: Map[String, String] = Map(
    "ml_col_stats"      -> mlColStatsSql,
    "ml_ventiles"       -> mlVentilesSql,
    "ml_histogram"      -> mlHistogramSql,
    "ml_modes"          -> mlModesSql,
    "ml_target_encode"  -> mlTargetEncodeSql,
    "ml_split_last"     -> mlSplitLastSql,
    "ml_metrics_cls"    -> mlMetricsClsSql,
    "ml_metrics_auc"    -> mlMetricsAucSql,
    "ml_calibration"    -> mlCalibrationSql,
    "ml_metrics_reg"    -> mlMetricsRegSql,
    "ml_ols_regr"       -> mlOlsSql,
    "ml_ols_predict"    -> mlOlsPredictSql,
    "ml_kmeans_assign"  -> mlKmeansSql,
    "ml_knn_predict"    -> mlKnnSql,
    "ml_train_contract" -> mlTrainContractSql,
    "ml_train_joint"    -> mlTrainJointSql,
    "ml_train_svm_rbf"  -> mlTrainSvmSql,
    "ml_train_hgb"      -> mlTrainHgbSql,
    "ml_train_bagging"  -> mlTrainBaggingSql
  )
}
