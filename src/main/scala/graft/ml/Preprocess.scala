package graft.ml

import org.apache.spark.ml.PipelineStage
import org.apache.spark.ml.feature.{SQLTransformer, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Column preprocessing — impute / scale / encode with the reference's
  * semantics (`/root/reference/src/orm/snapshot.rs:90-248,1300-1335`):
  *
  *  - impute on missing: mean | median | mode | min | max | zero; default
  *    is a hard error at fit time when the train split has missing values
  *    (the reference panics per-row at runtime — we fail fast with the
  *    same configuration hint).
  *  - scale AFTER impute: standard (x−μ)/σ, min_max, max_abs,
  *    robust (x−median)/(p80−p30) — ventile indices 15/5 like the
  *    reference — or preserve. Scaling applies to encoded category codes
  *    too (reference behavior).
  *  - encode for categoricals: native (dictionary code), target (category
  *    → mean label, computed on train only), one_hot (k−1 columns, last
  *    category dropped), ordinal(values) (explicit 1-based order, unknown
  *    value raises). NULL is always category 0 with the `__NULL__`
  *    sentinel; unseen test-time categories become NaN (then imputed if
  *    configured). Category codes use a canonical order — `__NULL__`
  *    first, then lexicographic — instead of the reference's
  *    non-deterministic first-seen order (documented deviation; the
  *    decoded semantics are identical).
  *  - validation: mean-impute on a categorical requires target encoding;
  *    non-native encode on a continuous column is rejected
  *    (`snapshot.rs:543-556`).
  *
  * Everything compiles to ONE `SQLTransformer` stage (pure column
  * expressions → whole-stage codegen, no shuffles) followed by a
  * `VectorAssembler`, so the fitted preprocessing persists inside the
  * saved `PipelineModel` and ships to executors like any MLlib stage.
  * Dictionaries past [[HighCardinality]] get a `StringIndexerModel`
  * pre-stage instead of CASE-WHEN branches — see the val's scaladoc.
  * Fit-time statistics come from the distributed Stats pass over the
  * train split only — no leakage from test.
  */
object Preprocess {
  sealed trait Encode
  case object NativeEncode extends Encode
  case object TargetEncode extends Encode
  case object OneHotEncode extends Encode
  final case class OrdinalEncode(values: Seq[String]) extends Encode

  sealed trait Impute
  case object ImputeError extends Impute
  case object ImputeMean extends Impute
  case object ImputeMedian extends Impute
  case object ImputeMode extends Impute
  case object ImputeMin extends Impute
  case object ImputeMax extends Impute
  case object ImputeZero extends Impute

  sealed trait Scale
  case object Preserve extends Scale
  case object Standard extends Scale
  case object MinMax extends Scale
  case object MaxAbs extends Scale
  case object Robust extends Scale

  final case class Preprocessor(encode: Encode = NativeEncode,
      impute: Impute = ImputeError, scale: Scale = Preserve)

  final case class Fitted(stages: Seq[PipelineStage], outputCols: Seq[String],
      featuresCol: String)

  private def q(name: String) = s"`${name.replace("`", "``")}`"
  private def sq(v: String) = s"'${v.replace("'", "''")}'"
  val NullCategory = "__NULL__"

  /** Driver-side guard: category dictionaries are collected to the
    * driver at fit time, so their size is bounded. */
  val MaxCategories = 100000

  /** Dictionary size above which encoding stops compiling into CASE-WHEN
    * SQL: at thousands of branches the generated Janino method blows the
    * 64KB limit and the whole projection silently falls back to
    * interpreted mode. Above this, the dictionary becomes a
    * [[org.apache.spark.ml.feature.StringIndexerModel]] stage (a
    * broadcast hash lookup, O(1) per row at any cardinality) plus a tiny
    * CASE on the index — both persist inside the PipelineModel like the
    * SQL stage does. */
  val HighCardinality = 1000

  /** Fit the preprocessing plan on the TRAIN split. */
  def fit(train: DataFrame, featureCols: Seq[String], labelCol: Option[String],
      config: Map[String, Preprocessor]): Fitted = {
    val schema = train.schema
    val isCat = featureCols.map(c => c -> (schema(c).dataType == StringType)).toMap
    val isArr = featureCols.map(c => c -> schema(c).dataType.isInstanceOf[ArrayType]).toMap

    // Array feature columns flatten to fixed positions (reference
    // `snapshot.rs:1336-1428,1497-1515`): nested lists flatten
    // recursively, the width is learned from the first row and enforced.
    def nestedDepth(dt: org.apache.spark.sql.types.DataType): Int = dt match {
      case ArrayType(inner, _) => 1 + nestedDepth(inner)
      case _ => 0
    }
    def flatExpr(c: String): org.apache.spark.sql.Column = {
      val d = nestedDepth(schema(c).dataType)
      val flatOnce = (1 until d).foldLeft(col(c))((e, _) => flatten(e))
      flatOnce.cast("array<double>")
    }
    val arrWidths: Map[String, Int] = featureCols.filter(isArr).map { c =>
      val w = train.select(size(flatExpr(c))).head().getInt(0)
      val ragged = train.filter(size(flatExpr(c)) =!= w).count()
      require(ragged == 0,
        s"array column \"$c\": expected width $w from the first row but $ragged rows differ")
      c -> w
    }.toMap

    featureCols.filter(isArr).foreach { c =>
      val p = config.getOrElse(c, Preprocessor())
      require(p.encode == NativeEncode && p.scale == Preserve &&
        (p.impute == ImputeError || p.impute == ImputeZero),
        s"array column \"$c\": per-position preprocessing is limited to native " +
          "encode, preserve scale, and zero imputation")
    }

    // ---- validation (snapshot.rs:543-556)
    config.foreach { case (c, p) =>
      if (isCat.getOrElse(c, false)) {
        if (p.impute == ImputeMean && p.encode != TargetEncode)
          throw new IllegalArgumentException(
            s"""Cannot impute "mean" for categorical column "$c" unless it is target-encoded — there is no "average" category; "mode" is a valid alternative.""")
      } else if (p.encode != NativeEncode)
        throw new IllegalArgumentException(
          s"""It does not make sense to encode continuous column "$c"; use the default native encoding.""")
    }

    def pp(c: String) = config.getOrElse(c, Preprocessor())

    // ---- phase 1: encode expressions (categorical → numeric code/mean)
    val catCols = featureCols.filter(isCat)
    val categoryMaps: Map[String, Seq[(String, Double)]] = catCols.map { c =>
      // the fitted dictionary compiles into driver-side CASE-WHEN SQL, so
      // cap what we pull back: limit(cap+1) bounds the collect itself (a
      // runaway-cardinality column can't OOM the driver before the check)
      val seen = train.select(col(c).cast("string")).distinct()
        .limit(MaxCategories + 1).collect()
        .map(r => if (r.isNullAt(0)) NullCategory else r.getString(0)).toSeq
      require(seen.length <= MaxCategories,
        s"""categorical column "$c" exceeds $MaxCategories distinct values; """ +
          "hash or frequency-cap it upstream, or target-encode against a " +
          "pre-aggregated mean table — a dictionary this size cannot be " +
          "compiled into the pipeline")
      val hasNull = seen.contains(NullCategory)
      val ordered =
        (if (hasNull) Seq(NullCategory) else Seq.empty) ++
          seen.filterNot(_ == NullCategory).sorted
      val withCodes = pp(c).encode match {
        case OrdinalEncode(values) =>
          ordered.map { k =>
            if (k == NullCategory) k -> 0.0
            else values.indexOf(k) match {
              case -1 => throw new IllegalArgumentException(
                s"value is not present in ordinal: $k. Valid values: $values")
              case i => k -> (i + 1).toDouble
            }
          }
        case _ => ordered.zipWithIndex.map { case (k, i) => k -> i.toDouble }
      }
      c -> withCodes
    }.toMap

    val targetMeans: Map[String, (Seq[(String, Double)], Double)] =
      catCols.filter(c => pp(c).encode == TargetEncode).map { c =>
        val l = labelCol.getOrElse(throw new IllegalArgumentException(
          s"target encoding for '$c' requires a label column"))
        val rows = train.groupBy(coalesce(col(c).cast("string"), lit(NullCategory)).as("k"))
          .agg(avg(col(l).cast("double")).as("m")).collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toSeq
        val global = train.agg(avg(col(l).cast("double"))).head().getDouble(0)
        c -> (rows, global)
      }.toMap

    // ---- high-cardinality dictionaries → StringIndexerModel pre-stages
    val highCard: Set[String] = catCols
      .filter(c => categoryMaps(c).size > HighCardinality).toSet
    highCard.filter(c => pp(c).encode == OneHotEncode).foreach { c =>
      throw new IllegalArgumentException(
        s"""one-hot encoding "$c" would create ${categoryMaps(c).size} columns; """ +
          s"one_hot is capped at $HighCardinality categories — use native or " +
          "target encoding for high-cardinality columns")
    }
    val preStages: Seq[org.apache.spark.ml.Transformer] =
      if (highCard.isEmpty) Seq.empty
      else {
        val keys = highCard.toSeq.sorted.map(c =>
          s"COALESCE(CAST(${q(c)} AS STRING), ${sq(NullCategory)}) AS ${q(s"${c}__catkey")}")
        val keyStage = new SQLTransformer().setStatement(
          s"SELECT *, ${keys.mkString(", ")} FROM __THIS__")
        val indexers = highCard.toSeq.sorted.map { c =>
          new org.apache.spark.ml.feature.StringIndexerModel(
              categoryMaps(c).map(_._1).toArray)
            .setInputCol(s"${c}__catkey").setOutputCol(s"${c}__idx")
            .setHandleInvalid("keep") // unseen/new-null → index k, caught below
        }
        keyStage +: indexers
      }
    // fit-statistics inputs must see the indexer outputs
    val preTrain = preStages.foldLeft(train)((df, st) => st.transform(df))

    def encodeSql(c: String): String = {
      val p = pp(c)
      if (!isCat(c)) s"CAST(${q(c)} AS DOUBLE)"
      else if (highCard(c)) {
        val k = categoryMaps(c).size
        val idx = q(s"${c}__idx")
        p.encode match {
          case TargetEncode =>
            val (means, global) = targetMeans(c)
            val m = means.toMap
            // code → mean as ONE foldable array literal (constant-folded
            // to a single ArrayData object, never into generated code)
            val arr = categoryMaps(c)
              .map { case (key, _) => s"CAST('${m.getOrElse(key, global)}' AS DOUBLE)" }
              .mkString("ARRAY(", ", ", ")")
            s"CASE WHEN $idx >= $k THEN CAST('NaN' AS DOUBLE) " +
              s"ELSE element_at($arr, CAST($idx AS INT) + 1) END"
          case OrdinalEncode(values) =>
            val arr = categoryMaps(c)
              .map { case (_, v) => s"CAST('$v' AS DOUBLE)" }
              .mkString("ARRAY(", ", ", ")")
            val valid = values.mkString(", ").replace("'", "''")
            s"CASE WHEN $idx >= $k THEN raise_error(concat('value is not present " +
              s"in ordinal: ', CAST(${q(c)} AS STRING), '. Valid values: " +
              s"$valid')) " +
              s"ELSE element_at($arr, CAST($idx AS INT) + 1) END"
          case _ => // native: the code IS the canonical index
            s"CASE WHEN $idx >= $k THEN CAST('NaN' AS DOUBLE) ELSE $idx END"
        }
      }
      else p.encode match {
        case TargetEncode =>
          val (means, global) = targetMeans(c)
          val m = means.toMap
          val cases = categoryMaps(c).map { case (k, _) =>
            s"WHEN ${sq(k)} THEN CAST('${m.getOrElse(k, global)}' AS DOUBLE)"
          }.mkString(" ")
          s"CASE COALESCE(CAST(${q(c)} AS STRING), ${sq(NullCategory)}) $cases ELSE CAST('NaN' AS DOUBLE) END"
        case OrdinalEncode(values) =>
          val cases = categoryMaps(c).map { case (k, v) =>
            s"WHEN ${sq(k)} THEN CAST('$v' AS DOUBLE)"
          }.mkString(" ")
          s"CASE COALESCE(CAST(${q(c)} AS STRING), ${sq(NullCategory)}) $cases ELSE " +
            s"raise_error(concat('value is not present in ordinal: ', CAST(${q(c)} AS STRING), " +
            s"'. Valid values: ${values.mkString(", ").replace("'", "''")}')) END"
        case _ => // native + one_hot share the dictionary code
          val cases = categoryMaps(c).map { case (k, v) =>
            s"WHEN ${sq(k)} THEN CAST('$v' AS DOUBLE)"
          }.mkString(" ")
          s"CASE COALESCE(CAST(${q(c)} AS STRING), ${sq(NullCategory)}) $cases ELSE CAST('NaN' AS DOUBLE) END"
      }
    }
    val encoded = featureCols.map(c => c -> encodeSql(c)).toMap

    // ---- phase 2: fit statistics over the ENCODED train columns
    val needsStats = featureCols.filter { c =>
      val p = pp(c)
      p.impute != ImputeError && p.impute != ImputeZero || p.scale != Preserve
    }
    val statsMap: Map[String, Stats.NumericStats] =
      if (needsStats.isEmpty) Map.empty
      else {
        val proj = needsStats.zipWithIndex.map { case (c, i) =>
          expr(encoded(c)).as(s"e$i")
        }
        val encTrain = preTrain.select(proj: _*)
        Stats.analyzeNumeric(encTrain, needsStats.indices.map(i => s"e$i"))
          .zip(needsStats).map { case (st, c) => c -> st }.toMap
      }
    val modes: Map[String, Double] = featureCols.filter(c => pp(c).impute == ImputeMode)
      .map { c =>
        val m = preTrain.select(expr(encoded(c)).as("v")).filter(!isnan(col("v")) && col("v").isNotNull)
          .groupBy(col("v")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("v")).head().getDouble(0)
        c -> m
      }.toMap

    // fail fast on default (error) impute with missing values present.
    // Categorical NULL is NOT missing — it becomes the __NULL__ category
    // (code 0) like the reference; only numeric null/NaN needs imputing.
    featureCols.filter(c => pp(c).impute == ImputeError && !isCat(c) && !isArr(c))
      .foreach { c =>
      val missing = train.filter(col(c).isNull || isnan(col(c).cast("double"))).count()
      if (missing > 0) throw new IllegalArgumentException(
        s"""$missing missing values for "$c". Provide a preprocessor to impute, e.g. preprocess = Map("$c" -> Preprocessor(impute = ImputeMean))""")
    }

    // ---- phase 3: impute + scale wrappers → final SELECT expressions
    def arrayExprs(c: String): Seq[(String, String)] = {
      val d = nestedDepth(schema(c).dataType)
      val flatSql = (1 until d).foldLeft(q(c))((e, _) => s"flatten($e)")
      val zeroFill = pp(c).impute == ImputeZero
      (0 until arrWidths(c)).map { i =>
        val el = s"CAST(element_at(CAST($flatSql AS ARRAY<DOUBLE>), ${i + 1}) AS DOUBLE)"
        val e = if (zeroFill)
          s"(CASE WHEN $el IS NULL OR isnan($el) THEN CAST(0.0 AS DOUBLE) ELSE $el END)"
        else el
        (e, s"${c}__f$i")
      }
    }

    def finalExprs(c: String): Seq[(String, String)] = {
      if (isArr(c)) return arrayExprs(c)
      val p = pp(c)
      val st = statsMap.get(c)
      val enc = encoded(c)
      val imputeVal: Option[String] = p.impute match {
        case ImputeError => None
        case ImputeZero => Some("CAST(0.0 AS DOUBLE)")
        case ImputeMean => Some(s"CAST('${st.get.mean}' AS DOUBLE)")
        case ImputeMedian => Some(s"CAST('${st.get.median}' AS DOUBLE)")
        case ImputeMode => Some(s"CAST('${modes(c)}' AS DOUBLE)")
        case ImputeMin => Some(s"CAST('${st.get.min}' AS DOUBLE)")
        case ImputeMax => Some(s"CAST('${st.get.max}' AS DOUBLE)")
      }
      val imputed = imputeVal match {
        case Some(v) => s"(CASE WHEN isnan($enc) OR $enc IS NULL THEN $v ELSE $enc END)"
        case None => enc
      }
      p.encode match {
        case OneHotEncode =>
          val k = categoryMaps(c).size
          (0 until math.max(k - 1, 1)).map { i =>
            (s"CAST((CAST($imputed AS INT) = $i) AS DOUBLE)", s"${c}__oh$i")
          }
        case _ =>
          val scaled = p.scale match {
            case Preserve => imputed
            case Standard =>
              s"(($imputed - CAST('${st.get.mean}' AS DOUBLE)) / CAST('${st.get.stdDev}' AS DOUBLE))"
            case MinMax =>
              s"(($imputed - CAST('${st.get.min}' AS DOUBLE)) / CAST('${st.get.max - st.get.min}' AS DOUBLE))"
            case MaxAbs => s"($imputed / CAST('${st.get.maxAbs}' AS DOUBLE))"
            case Robust =>
              // (x − median) / (p80 − p30): ventile indices 15 and 5
              val spread = st.get.ventiles(15) - st.get.ventiles(5)
              s"(($imputed - CAST('${st.get.median}' AS DOUBLE)) / CAST('$spread' AS DOUBLE))"
          }
          Seq((scaled, s"${c}__proc"))
      }
    }

    val all = featureCols.flatMap(finalExprs)
    val selects = all.map { case (e, n) => s"$e AS ${q(n)}" }
    // drop the indexer helper columns so they don't ride every scored
    // row for the life of the model (star-EXCEPT, Spark ≥3.4)
    val star =
      if (highCard.isEmpty) "*"
      else {
        val helpers = highCard.toSeq.sorted
          .flatMap(c => Seq(q(s"${c}__catkey"), q(s"${c}__idx")))
        s"* EXCEPT (${helpers.mkString(", ")})"
      }
    val sql = s"SELECT $star, ${selects.mkString(", ")} FROM __THIS__"
    val sqlStage = new SQLTransformer().setStatement(sql)
    val assembler = new VectorAssembler()
      .setInputCols(all.map(_._2).toArray)
      .setOutputCol("features")
      .setHandleInvalid("keep")
    Fitted(preStages ++ Seq(sqlStage, assembler), all.map(_._2), "features")
  }
}
