package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** `load_dataset` builtins — reference ships 6 sklearn toy datasets as
  * gz CSVs compiled into the binary (`/root/reference/src/orm/dataset.rs:203-686`).
  * We reproduce the SCHEMAS exactly (FIXTURES.md §1) with deterministic
  * synthetic content (closed-form LCG — no RNG state), since the engine
  * contract is schema + lifecycle, not the original rows. Tables register
  * as temp views `quackml_<name>` and return their row count like the
  * reference's `load_dataset` (`src/api.rs:1151-1162`).
  */
object Datasets {
  /** Deterministic uniform in [0,1): LCG on (i, j). */
  private def u(i: Long, j: Long): Double =
    ((1103515245L * (i * 131 + j * 7 + 12345) + 12345L) % 2147483648L).toDouble / 2147483648.0

  private def make(spark: SparkSession, schema: StructType, rows: Seq[Row],
      name: String): DataFrame = {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
    df.createOrReplaceTempView(s"quackml_$name")
    df
  }

  /** 442×10 regression, linear signal + noise (diabetes schema). */
  def diabetes(spark: SparkSession): DataFrame = {
    val feats = Seq("age", "sex", "bmi", "bp", "s1", "s2", "s3", "s4", "s5", "s6")
    val schema = StructType(feats.map(f => StructField(f, FloatType)) :+
      StructField("target", FloatType))
    val coef = Array(30.0, -10.0, 25.0, 15.0, 5.0, -8.0, 12.0, 3.0, 20.0, -5.0)
    val rows = (0 until 442).map { i =>
      val x = (0 until 10).map(j => (u(i, j) - 0.5).toFloat)
      val y = 150.0 + x.zip(coef).map { case (v, c) => v * c }.sum + (u(i, 99) - 0.5) * 10.0
      Row.fromSeq(x :+ y.toFloat)
    }
    make(spark, schema, rows, "diabetes")
  }

  /** 150×4, 3 separable classes (iris schema). */
  def iris(spark: SparkSession): DataFrame = {
    val feats = Seq("sepal_length", "sepal_width", "petal_length", "petal_width")
    val schema = StructType(feats.map(f => StructField(f, FloatType)) :+
      StructField("target", IntegerType))
    val centers = Array(
      Array(5.0, 3.4, 1.5, 0.2), Array(5.9, 2.8, 4.3, 1.3), Array(6.6, 3.0, 5.6, 2.0))
    val rows = (0 until 150).map { i =>
      val c = i % 3
      val x = (0 until 4).map(j => (centers(c)(j) + (u(i, j) - 0.5) * 0.6).toFloat)
      Row.fromSeq(x :+ c)
    }
    make(spark, schema, rows, "iris")
  }

  /** 569×30 binary, quoted-identifier columns (breast_cancer schema). */
  def breastCancer(spark: SparkSession): DataFrame = {
    val feats = Seq("mean radius", "mean texture", "mean perimeter", "mean area",
      "mean smoothness", "mean compactness", "mean concavity", "mean concave points",
      "mean symmetry", "mean fractal dimension", "radius error", "texture error",
      "perimeter error", "area error", "smoothness error", "compactness error",
      "concavity error", "concave points error", "symmetry error",
      "fractal dimension error", "worst radius", "worst texture", "worst perimeter",
      "worst area", "worst smoothness", "worst compactness", "worst concavity",
      "worst concave points", "worst symmetry", "worst fractal dimension")
    val schema = StructType(feats.map(f => StructField(f, FloatType)) :+
      StructField("malignant", BooleanType))
    val rows = (0 until 569).map { i =>
      val malignant = u(i, 777) < 0.37
      val shift = if (malignant) 1.2 else 0.0
      val x = (0 until 30).map(j => (u(i, j) + shift * u(j, 7)).toFloat)
      Row.fromSeq(x :+ malignant)
    }
    make(spark, schema, rows, "breast_cancer")
  }

  /** 1797-row digits with nested INTEGER[][] image (array flattening
    * exercise, `snapshot.rs:1509-1515`). */
  def digits(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("image", ArrayType(ArrayType(IntegerType))),
      StructField("target", ShortType)))
    val rows = (0 until 1797).map { i =>
      val label = i % 10
      val img = (0 until 8).map(r =>
        (0 until 8).map(c =>
          ((u(i, r * 8 + c) * 8).toInt + (if ((r * 8 + c) % 10 == label) 8 else 0))).toSeq).toSeq
      Row(img, label.toShort)
    }
    make(spark, schema, rows, "digits")
  }

  /** 20×6 joint regression (linnerud schema). */
  def linnerud(spark: SparkSession): DataFrame = {
    val cols = Seq("chins", "situps", "jumps", "weight", "waist", "pulse")
    val schema = StructType(cols.map(c => StructField(c, FloatType)))
    val rows = (0 until 20).map { i =>
      Row.fromSeq((0 until 6).map(j => (20.0 + u(i, j) * 150.0).toFloat))
    }
    make(spark, schema, rows, "linnerud")
  }

  /** 178×13 multiclass incl. special-char identifier (wine schema). */
  def wine(spark: SparkSession): DataFrame = {
    val feats = Seq("alcohol", "malic_acid", "ash", "alcalinity_of_ash", "magnesium",
      "total_phenols", "flavanoids", "nonflavanoid_phenols", "proanthocyanins",
      "color_intensity", "hue", "od280/od315_of_diluted_wines", "proline")
    val schema = StructType(feats.map(f => StructField(f, FloatType)) :+
      StructField("target", IntegerType))
    val rows = (0 until 178).map { i =>
      val c = i % 3
      val x = (0 until 13).map(j => (u(i, j) + c * 0.8 * u(j, 3)).toFloat)
      Row.fromSeq(x :+ c)
    }
    make(spark, schema, rows, "wine")
  }

  /** `load_dataset(name)` — returns the row count like the reference.
    * A name containing '/' is treated as a parquet/CSV path (the offline
    * analogue of the reference's HuggingFace ingestion path,
    * `src/bindings/transformers/mod.rs:519-691`: exported datasets land
    * as files; the dynamic-schema table registration is the same). */
  def loadDataset(spark: SparkSession, name: String): Long = {
    if (name.contains("/")) {
      val df = if (name.endsWith(".csv"))
        spark.read.option("header", "true").option("inferSchema", "true").csv(name)
      else spark.read.parquet(name)
      val viewName = name.split("/").last.replaceAll("\\.(parquet|csv)$", "")
        .replaceAll("[^A-Za-z0-9_]", "_")
      df.createOrReplaceTempView(s"quackml_$viewName")
      return df.count()
    }
    val df = name match {
      case "diabetes" => diabetes(spark)
      case "iris" => iris(spark)
      case "breast_cancer" => breastCancer(spark)
      case "digits" => digits(spark)
      case "linnerud" => linnerud(spark)
      case "wine" => wine(spark)
      case other => throw new IllegalArgumentException(s"unknown builtin dataset: $other")
    }
    df.count()
  }
}
