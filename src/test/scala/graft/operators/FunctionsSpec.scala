package graft.operators

import graft.functions.GraftFunctions
import graft.ml.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_h60 native expression equals the composed conv/substring/md5 form") {
    GraftFunctions.register(spark)
    val df = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"text")
      .unionAll(Seq("", "a", "héllo wörld", "x" * 10000).toDF("text"))
    val mismatches = df
      .withColumn("native", call_function("graft_h60", $"text"))
      .withColumn("composed", conv(substring(md5($"text"), 1, 15), 16, 10).cast("long"))
      .filter($"native" =!= $"composed")
      .count()
    assert(mismatches == 0)
  }

  test("graft_h60 stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // a file-backed scan — a local relation constant-folds the call
    // before codegen ever runs
    val plan = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("graft_h60(text) AS h")
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen
    // stage; the projection carrying graft_h60 must have it
    assert(plan.contains("*(1) Project [graft_h60(text"), plan)
  }

  test("graft_h60 is SQL-callable and null-safe") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_h60('hello')").head().getLong(0) ==
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest("hello".getBytes("UTF-8")).take(8)
          .map("%02x".format(_)).mkString.take(15), 16))
    assert(spark.sql("SELECT graft_h60(CAST(NULL AS STRING))").head().isNullAt(0))
  }
}
