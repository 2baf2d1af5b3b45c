package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SamplingDatasetsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("train/test split arithmetic matches the reference (snapshot.rs:803-819)") {
    assert(Sampling.trainTestCounts(100, 0.25) == (75L, 25L))
    assert(Sampling.trainTestCounts(101, 0.25) == (76L, 25L)) // round(25.25)=25
  }

  test("round-half behavior on .5 boundaries") {
    // 10*0.25 = 2.5 → reference f32 .round() = 3 (half away from zero)
    assert(Sampling.trainTestCounts(10, 0.25) == (7L, 3L))
    // absolute count when test_size > 1
    assert(Sampling.trainTestCounts(100, 30.0) == (70L, 30L))
    // error when train side empty
    intercept[IllegalArgumentException](Sampling.trainTestCounts(5, 5.0))
  }

  test("'last' sampling: tail becomes test, in key order") {
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val (tr, te) = Sampling.split(df, Sampling.LastSampling, Seq.empty, Seq("id"), 0.2)
    assert(tr.count() == 80 && te.count() == 20)
    assert(te.agg(min($"id")).head().getLong(0) == 81L)
  }

  test("stratified sampling keeps class balance in both splits") {
    val df = (1 to 300).map(i => (i.toLong, i % 3)).toDF("id", "cls")
    val (tr, te) = Sampling.split(df, Sampling.StratifiedSampling, Seq("cls"), Seq("id"), 0.25)
    val trCounts = tr.groupBy($"cls").count().collect().map(_.getLong(1))
    val teCounts = te.groupBy($"cls").count().collect().map(_.getLong(1))
    assert(trCounts.forall(c => math.abs(c - 75) <= 1), trCounts.mkString(","))
    assert(teCounts.forall(c => math.abs(c - 25) <= 1), teCounts.mkString(","))
    // fixes the reference's projection bug: features survive the sampling
    assert(tr.columns.contains("id"))
  }

  test("hash split is deterministic and approximately sized") {
    val df = (1 to 10000).map(i => Tuple1(i.toLong)).toDF("id")
    val (tr1, te1) = Sampling.splitByFraction(df, Seq("id"), 0.25)
    val (tr2, te2) = Sampling.splitByFraction(df, Seq("id"), 0.25)
    assert(te1.count() == te2.count()) // reproducible
    val frac = te1.count().toDouble / 10000
    assert(frac > 0.22 && frac < 0.28, s"got $frac")
    assert(tr1.intersect(te1).isEmpty)
  }

  test("HF saved-dataset directory ingests with the reference dtype map") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_hf").toFile
    // mixed-dtype fixture: two splits of parquet shards + dataset_info.json
    val rows = Seq(
      ("alpha", 1L, 7, 0.5, 1.25f, true, """["a","b"]"""),
      ("beta", 2L, 8, 1.5, 2.5f, false, """["c"]"""))
    val df = rows.toDF("text", "id64", "id32", "score64", "score32", "flag", "tags")
    df.limit(1).write.parquet(s"$dir/train")
    df.write.parquet(s"$dir/test")
    val info = """{"dataset_name": "fixture", "features": {
      "text": {"dtype": "string", "_type": "Value"},
      "id64": "int64",
      "id32": {"dtype": "int32", "_type": "Value"},
      "score64": {"dtype": "float64", "_type": "Value"},
      "score32": {"dtype": "float16", "_type": "Value"},
      "flag": {"dtype": "bool", "_type": "Value"},
      "tags": {"_type": "Sequence", "feature": {"dtype": "string"}}}}"""
    java.nio.file.Files.write(
      new java.io.File(dir, "dataset_info.json").toPath, info.getBytes)

    assert(Datasets.loadDataset(spark, dir.getPath) == 3L)
    val train = spark.table("quackml_fixture_train")
    assert(train.count() == 1)
    val test = spark.table("quackml_fixture_test")
    assert(test.count() == 2)
    val types = test.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("text") == StringType && types("id64") == LongType &&
      types("id32") == IntegerType && types("score64") == DoubleType &&
      types("score32") == FloatType && types("flag") == BooleanType &&
      types("tags") == StringType) // JSON text — the JSONB analogue
    // unknown dtype errors like the reference's bail
    intercept[IllegalArgumentException](Datasets.hfDataType("timestamp[s]"))
  }

  test("builtin datasets reproduce the reference schemas (FIXTURES.md §1)") {
    val d = Datasets.diabetes(spark)
    assert(d.count() == 442)
    assert(d.columns.toSeq == Seq("age", "sex", "bmi", "bp", "s1", "s2", "s3", "s4",
      "s5", "s6", "target"))

    val i = Datasets.iris(spark)
    assert(i.count() == 150)
    assert(i.columns.toSeq == Seq("sepal_length", "sepal_width", "petal_length",
      "petal_width", "target"))
    assert(i.select($"target").distinct().count() == 3)

    val bc = Datasets.breastCancer(spark)
    assert(bc.count() == 569 && bc.columns.length == 31)
    assert(bc.columns.contains("mean radius") && bc.columns.contains("malignant"))
    assert(bc.schema("malignant").dataType == org.apache.spark.sql.types.BooleanType)

    val dg = Datasets.digits(spark)
    assert(dg.count() == 1797)
    assert(dg.schema("image").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType)))

    assert(Datasets.linnerud(spark).count() == 20)
    val w = Datasets.wine(spark)
    assert(w.count() == 178 && w.columns.contains("od280/od315_of_diluted_wines"))

    // load_dataset returns counts + registers views (api.rs:1151-1162)
    assert(Datasets.loadDataset(spark, "iris") == 150L)
    assert(spark.sql("SELECT count(*) FROM quackml_iris").head().getLong(0) == 150L)
    intercept[IllegalArgumentException](Datasets.loadDataset(spark, "nope"))
    // path-based ingestion (offline HF analogue)
    val n = Datasets.loadDataset(spark, "/root/testdata/sf0.001/region.parquet")
    assert(n == 5L)
    assert(spark.sql("SELECT count(*) FROM quackml_region").head().getLong(0) == 5L)
  }
}
