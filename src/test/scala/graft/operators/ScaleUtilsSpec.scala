package graft.operators

import graft.ml.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleUtilsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join returns exactly the plain-join result on skewed data") {
    // one pathological key holding half the rows
    val big = ((1 to 5000).map(i => (if (i % 2 == 0) 1L else i.toLong, i)) )
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (3L, "a"), (5L, "b")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select($"k", $"payload", $"name")
    val salted = ScaleUtils.saltedJoin(big, small, Seq("k"), numSalts = 8)
      .select($"k", $"payload", $"name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("equal bucketing joins with no shuffle exchange") {
    val a = (1 to 10000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 10000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    // drop leftovers: the in-memory catalog forgets tables across JVMs
    // but their warehouse directories persist
    Seq("bkt_a", "bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      if (loc.exists()) rm(loc)
    }
    ScaleUtils.writeBucketed(a, "bkt_a", "k", 8)
    ScaleUtils.writeBucketed(b, "bkt_b", "k", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 10000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

class TextDatasetsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.ml.TextDatasets

  test("text_classification split with default and custom column names") {
    val df = (1 to 100).map(i => (s"doc $i", if (i % 2 == 0) "pos" else "neg"))
      .toDF("text", "class")
    val s1 = TextDatasets.textClassification(spark, df)
    assert(s1.train.count() == 75 && s1.test.count() == 25)
    assert(s1.train.head().text.startsWith("doc"))

    val renamed = df.withColumnRenamed("text", "body").withColumnRenamed("class", "y")
    val s2 = TextDatasets.textClassification(spark, renamed, textCol = "body", classCol = "y")
    assert(s2.train.count() == 75)
  }

  test("pair / summarization / conversation shapes") {
    val pair = (1 to 40).map(i => (s"a$i", s"b$i", "same")).toDF("text1", "text2", "class")
    val p = TextDatasets.textPairClassification(spark, pair)
    assert(p.train.count() == 30 && p.test.head().text2.startsWith("b"))

    val summ = (1 to 40).map(i => (s"long text $i", s"sum $i")).toDF("text", "summary")
    val sm = TextDatasets.summarization(spark, summ)
    assert(sm.train.count() == 30 && sm.train.head().summary.startsWith("sum"))

    val conv = (1 to 40).map(i => ("sys", s"q$i", s"a$i"))
      .toDF("system", "user", "assistant")
    val cv = TextDatasets.conversation(spark, conv)
    assert(cv.train.count() == 30 && cv.test.count() == 10)
  }
}
