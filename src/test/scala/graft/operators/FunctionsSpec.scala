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

  /** The HOF fold the vector expressions replace — the bit-exactness
    * reference for the equivalence tests below. */
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)
  private def hofSqdist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (s, x) => s + x)

  test("graft_dot / graft_sqdist bit-equal the aggregate(zip_with) fold on real embeddings") {
    GraftFunctions.register(spark)
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val pairs = e.select($"vec_id".as("ia"), $"v".as("va"))
      .crossJoin(e.select($"vec_id".as("ib"), $"v".as("vb")))
      .filter($"ia" < 20 && $"ib" < 20)
    // bit-equality: compare via double_to_raw bits, not numeric tolerance
    val bad = pairs
      .withColumn("d_native", call_function("graft_dot", $"va", $"vb"))
      .withColumn("d_hof", hofDot($"va", $"vb"))
      .withColumn("s_native", call_function("graft_sqdist", $"va", $"vb"))
      .withColumn("s_hof", hofSqdist($"va", $"vb"))
      .filter($"d_native" =!= $"d_hof" || $"s_native" =!= $"s_hof")
      .count()
    assert(bad == 0)
  }

  test("graft_dot null semantics match zip_with padding: null array, null element, length mismatch") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT
        |  graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS null_arr,
        |  graft_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS null_elem,
        |  graft_dot(array(1.0d, 2.0d), array(1.0d)) AS len_mismatch,
        |  graft_dot(array(), array()) AS empty,
        |  graft_sqdist(array(3.0d), array(1.0d)) AS sq
        |""".stripMargin).head()
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
    assert(rows.getDouble(3) == 0.0)
    assert(rows.getDouble(4) == 4.0)
  }

  test("graft_topk_min equals sort+slice with the (score asc, id asc) tie rule") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // deterministic scores with deliberate ties; many groups so partial
    // aggregation exercises merge() across partitions
    val df = (1 to 400).map { i =>
      (i % 8L, ((i * 37) % 25).toDouble, i.toLong)
    }.toDF("grp", "score", "id").repartition(7)
    val native = df.groupBy($"grp")
      .agg(expr("graft_topk_min(score, id, 5)").as("top"))
      .select($"grp", posexplode($"top").as(Seq("r", "t")))
      .select($"grp", $"r", $"t.score".as("score"), $"t.id".as("id"))
    val oracle = df.groupBy($"grp")
      .agg(slice(array_sort(collect_list(struct($"score", $"id"))), 1, 5).as("top"))
      .select($"grp", posexplode($"top").as(Seq("r", "t")))
      .select($"grp", $"r", $"t.score".as("score"), $"t.id".as("id"))
    assert(native.except(oracle).isEmpty && oracle.except(native).isEmpty)
    // groups smaller than k return every row
    val small = Seq((1L, 2.0, 10L), (1L, 1.0, 11L)).toDF("grp", "score", "id")
      .groupBy($"grp").agg(expr("graft_topk_min(score, id, 5)").as("top"))
      .select(size($"top")).head().getInt(0)
    assert(small == 2)
    // DUPLICATE (score, id) rows count with multiplicity, exactly like
    // the collect_list spelling — a set-backed buffer would collapse
    // them and shift the k-th element
    val dup = Seq((1L, 1.0, 10L), (1L, 1.0, 10L), (1L, 1.0, 10L),
      (1L, 2.0, 20L), (1L, 3.0, 30L)).toDF("grp", "score", "id")
      .repartition(3) // dupes straddle partitions: merge() must count too
    val dupNative = dup.groupBy($"grp")
      .agg(expr("graft_topk_min(score, id, 3)").as("top"))
      .select(posexplode($"top").as(Seq("r", "t")))
      .select($"t.score".as("score"), $"t.id".as("id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(dupNative == Seq((1.0, 10L), (1.0, 10L), (1.0, 10L)),
      s"multiplicity must survive: $dupNative")
  }

  test("graft_dot stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val plan = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .selectExpr("graft_dot(v, v) AS d")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot("), plan)
  }
  test("graft_json_long equals CAST(get_json_object AS BIGINT) on the events table") {
    GraftFunctions.register(spark)
    val mismatches = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("native", call_function("graft_json_long", $"props", lit("k")))
      .withColumn("general", get_json_object($"props", "$.k").cast("long"))
      .filter($"native" =!= $"general" ||
        ($"native".isNull =!= $"general".isNull))
      .count()
    assert(mismatches == 0)
  }

  test("graft_json_long edge semantics: nesting, floats, escapes, overflow, malformed") {
    GraftFunctions.register(spark)
    val cases = Seq(
      ("""{"k": 76}""", Some(76L)),               // flat hit
      ("""{"a":1,"k":-5}""", Some(-5L)),          // later key, negative
      ("""{"k":76.5}""", None),                   // float -> null (CAST parity)
      ("""{"k":"76"}""", None),                   // string value -> null
      ("""{"k":true}""", None),                   // boolean -> null
      ("""{"j":{"k":9},"k":3}""", Some(3L)),      // inner k must not shadow
      ("""{"j":{"k":9}}""", None),                // only nested -> miss
      ("""{"j":[{"k":9},2],"k":4}""", Some(4L)),  // arrays skipped structurally
      ("""{"s":"a,\"k\":7,b","k":8}""", Some(8L)), // braces/keys inside strings
      ("""{"k":9223372036854775807}""", Some(Long.MaxValue)),
      ("""{"k":9223372036854775808}""", None),    // overflow -> null
      ("""{ "k" : 12 , "z" : 0 }""", Some(12L)),  // whitespace everywhere
      ("""[1,2,3]""", None),                      // non-object
      ("""not json""", None),
      ("""{"k":}""", None),                       // malformed value
      ("""{"kk":7}""", None))                     // prefix key must not match
    val df = cases.map(_._1).toDF("j")
      .withColumn("v", call_function("graft_json_long", $"j", lit("k")))
    val got = df.select($"v").collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"input $in: want $want got $g")
    }
    // escaped key in the DATA matches via its decoded form
    val esc = Seq("""{"a\u006b":5}""").toDF("j")
      .select(call_function("graft_json_long", $"j", lit("ak")))
      .head()
    assert(esc.getLong(0) == 5L)
  }

  test("graft_json_long stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val plan = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .selectExpr("graft_json_long(props, 'k') AS v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_json_long("), plan)
  }
}
