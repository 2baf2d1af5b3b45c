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

  /** The reference's HF dtype → column-type map
    * (`src/bindings/transformers/mod.rs:571-593`), in Spark types.
    * list/dict land as STRING holding JSON text (the JSONB analogue);
    * unknown dtypes error exactly like the reference's bail. */
  def hfDataType(dtype: String): DataType = dtype match {
    case "string" | "large_string" => StringType
    case "dict" | "list" => StringType
    case "int64" => LongType
    case "int32" => IntegerType
    case "int16" | "int8" => ShortType
    case "float64" => DoubleType
    case "float32" | "float16" => FloatType
    case "bool" => BooleanType
    case other => throw new IllegalArgumentException(
      s"unhandled dataset feature while reading dataset: $other")
  }

  /** Offline HuggingFace ingestion: a saved-dataset directory holding
    * `dataset_info.json` plus parquet files — either flat, or one
    * subdirectory per split (`datasets.save_to_disk` layout with parquet
    * shards). The declared features drive the schema through
    * `hfDataType`; each split registers as `quackml_<name>[_<split>]`.
    * Returns total ingested rows, like `load_dataset` does. */
  def loadHFDataset(spark: SparkSession, dir: String): Long = {
    val root = new java.io.File(dir)
    val infoFile = new java.io.File(root, "dataset_info.json")
    require(infoFile.exists,
      s"$dir is not a saved dataset directory (no dataset_info.json)")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val info = mapper.readTree(infoFile)
    val featsNode = info.get("features")
    require(featsNode != null && featsNode.isObject,
      "dataset_info.json is missing the `features` object")
    // feature value shapes: "int64" | {"dtype": "int64", ...} |
    // {"_type": "Sequence"/other non-scalar} → list/dict
    val features: Seq[(String, DataType)] = {
      val it = featsNode.fields()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, DataType)]
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue
        val dtype =
          if (v.isTextual) v.asText
          else if (v.has("dtype")) v.get("dtype").asText
          else if (v.has("_type") && v.get("_type").asText == "Sequence") "list"
          else "dict"
        buf += e.getKey -> hfDataType(dtype)
      }
      buf.toSeq
    }
    val name = Option(info.get("dataset_name")).map(_.asText)
      .getOrElse(root.getName).replaceAll("[^A-Za-z0-9_]", "_")
    def ingest(parquetDir: java.io.File, viewName: String): Long = {
      import org.apache.spark.sql.functions.col
      val df = spark.read.parquet(parquetDir.getPath)
      val typed = df.select(features.map { case (c, t) => col(c).cast(t) }: _*)
      typed.createOrReplaceTempView(viewName)
      typed.count()
    }
    def hasParquet(d: java.io.File) =
      d.listFiles != null && d.listFiles.exists(_.getName.endsWith(".parquet"))
    if (hasParquet(root)) ingest(root, s"quackml_$name")
    else {
      val splits = root.listFiles.filter(f => f.isDirectory && hasParquet(f))
      require(splits.nonEmpty, s"no parquet files under $dir")
      splits.sortBy(_.getName)
        .map(s => ingest(s, s"quackml_${name}_${s.getName}")).sum
    }
  }

  /** `load_dataset(name)` — returns the row count like the reference.
    * A name containing '/' is treated as a path: a saved-dataset
    * directory (see `loadHFDataset`) or a bare parquet/CSV file — the
    * offline analogue of the reference's HuggingFace ingestion path
    * (`src/bindings/transformers/mod.rs:519-691`: exported datasets land
    * as files; the dynamic-schema table registration is the same). */
  def loadDataset(spark: SparkSession, name: String): Long = {
    if (name.contains("/")) {
      val f = new java.io.File(name)
      if (f.isDirectory && new java.io.File(f, "dataset_info.json").exists)
        return loadHFDataset(spark, name)
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
