package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine's 60-bit string hash
  * H(s) = first 15 hex digits of md5(s) as a BIGINT — the fingerprint
  * primitive under MinHash, SimHash, and the LSH embeddings (and the
  * one DuckDB replays as `('0x'||substr(md5(s),1,15))::UBIGINT`).
  *
  * The composed form `conv(substring(md5(s),1,15),16,10)` materializes
  * a 32-char hex string, substrings it, and radix-parses it back per
  * row; this expression goes digest bytes → long directly, stays inside
  * whole-stage codegen (`doGenCode` emits a static call), and allocates
  * nothing but the digest. Exactly equal to the composed form for all
  * inputs: value = (first 8 digest bytes as a big-endian unsigned 64)
  * >>> 4.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {
  // input typing handled by the registry builder (casts to string)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.hash(($c).getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static codegen target: md5 digest → upper 60 bits of the first 8
    * bytes (drop the 16th hex nibble), matching `StubRuntime.h60` and
    * the DuckDB oracle expression bit for bit. */
  def hash(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** Session wiring for the native functions. `register` installs into an
  * existing session's function registry (idempotent); the
  * `GraftExtensions` class is the `spark.sql.extensions` entry point
  * for cluster deployments (`--conf
  * spark.sql.extensions=graft.functions.GraftExtensions`). */
object GraftFunctions {
  val h60Info = new ExpressionInfo(classOf[Md5Prefix60].getName, "graft_h60")
  val dotInfo = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")
  val sqdistInfo = new ExpressionInfo(classOf[SumSqDiff].getName, "graft_sqdist")
  val cellInfo = new ExpressionInfo(classOf[NearestCentroid].getName, "graft_cell")
  val haloInfo = new ExpressionInfo(classOf[HaloCells].getName, "graft_halo_cells")
  val probe2Info = new ExpressionInfo(classOf[ProbeCells].getName, "graft_probe2")
  val probeKInfo = new ExpressionInfo(classOf[ProbeKCells].getName, "graft_probek")
  val overlapInfo = new ExpressionInfo(classOf[ClippedOverlap].getName, "graft_overlap")
  val bloomAggInfo = new ExpressionInfo(
    classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
    "graft_bloom_agg")
  val bloomMightInfo = new ExpressionInfo(
    classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
    "graft_might_contain")

  private val arrD = ArrayType(DoubleType)
  private val arrArrD = ArrayType(arrD)
  private val arrS = ArrayType(StringType)

  private val buildH60: Seq[Expression] => Expression = { children =>
    require(children.size == 1, "graft_h60 takes exactly one argument")
    Md5Prefix60(Cast(children.head, StringType))
  }
  private val buildDot: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "graft_dot takes exactly two arguments")
    DotProduct(Cast(children(0), arrD), Cast(children(1), arrD))
  }
  private val buildSqdist: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "graft_sqdist takes exactly two arguments")
    SumSqDiff(Cast(children(0), arrD), Cast(children(1), arrD))
  }
  private val buildCell: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "graft_cell takes exactly two arguments")
    NearestCentroid(Cast(children(0), arrD), Cast(children(1), arrArrD))
  }
  private val buildHalo: Seq[Expression] => Expression = { children =>
    require(children.size == 3, "graft_halo_cells takes (v, centroids, eps)")
    HaloCells(Cast(children(0), arrD), Cast(children(1), arrArrD),
      Cast(children(2), DoubleType))
  }
  private val buildProbe2: Seq[Expression] => Expression = { children =>
    require(children.size == 3, "graft_probe2 takes (v, centroids, ratio)")
    ProbeCells(Cast(children(0), arrD), Cast(children(1), arrArrD),
      Cast(children(2), DoubleType))
  }
  private val buildProbeK: Seq[Expression] => Expression = { children =>
    require(children.size == 4,
      "graft_probek takes (v, centroids, nprobe, allowed)")
    ProbeKCells(Cast(children(0), arrD), Cast(children(1), arrArrD),
      Cast(children(2), IntegerType), Cast(children(3), ArrayType(LongType)))
  }
  private val buildOverlap: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "graft_overlap takes exactly two arguments")
    ClippedOverlap(Cast(children(0), arrS), Cast(children(1), arrS))
  }
  // Spark's own runtime-filter Bloom pair, surfaced by name: the agg
  // builds a serialized filter (binary), might_contain tests a long
  // against a foldable filter INSIDE whole-stage codegen — the
  // replacement for a boxed mightContain UDF in the dedup prefilter.
  private val buildBloomAgg: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "graft_bloom_agg takes (value, estimatedNumItems)")
    new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      children(0), children(1))
  }
  private val buildBloomMight: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "graft_might_contain takes (bloomFilter, value)")
    org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      children(0), children(1))
  }

  val jsonLongInfo = new ExpressionInfo(classOf[JsonGetLong].getName, "graft_json_long")
  private val buildJsonLong: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "graft_json_long takes (json, key)")
    JsonGetLong(Cast(children(0), StringType), Cast(children(1), StringType))
  }

  val spaceSavingInfo =
    new ExpressionInfo(classOf[SpaceSaving].getName, "graft_space_saving")
  private val buildSpaceSaving: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "graft_space_saving takes (term, k)")
    SpaceSaving(Cast(children(0), StringType), children(1))
      .toAggregateExpression()
  }

  val pqAdcInfo = new ExpressionInfo(classOf[PqAdc].getName, "graft_pq_adc")
  val topKMinInfo = new ExpressionInfo(classOf[TopKMin].getName, "graft_topk_min")
  private val buildTopKMin: Seq[Expression] => Expression = { children =>
    require(children.size == 3, "graft_topk_min takes (score, id, k)")
    TopKMin(Cast(children(0), DoubleType), Cast(children(1), LongType),
      children(2)).toAggregateExpression()
  }
  private val buildPqAdc: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "graft_pq_adc takes (codes, table)")
    PqAdc(Cast(children(0), ArrayType(IntegerType)), Cast(children(1), arrArrD))
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(FunctionIdentifier("graft_pq_adc"), pqAdcInfo, buildPqAdc)
    reg.registerFunction(FunctionIdentifier("graft_topk_min"), topKMinInfo, buildTopKMin)
    reg.registerFunction(FunctionIdentifier("graft_h60"), h60Info, buildH60)
    reg.registerFunction(FunctionIdentifier("graft_dot"), dotInfo, buildDot)
    reg.registerFunction(FunctionIdentifier("graft_sqdist"), sqdistInfo, buildSqdist)
    reg.registerFunction(FunctionIdentifier("graft_cell"), cellInfo, buildCell)
    reg.registerFunction(FunctionIdentifier("graft_halo_cells"), haloInfo, buildHalo)
    reg.registerFunction(FunctionIdentifier("graft_probe2"), probe2Info, buildProbe2)
    reg.registerFunction(FunctionIdentifier("graft_probek"), probeKInfo, buildProbeK)
    reg.registerFunction(FunctionIdentifier("graft_overlap"), overlapInfo, buildOverlap)
    reg.registerFunction(FunctionIdentifier("graft_bloom_agg"), bloomAggInfo, buildBloomAgg)
    reg.registerFunction(FunctionIdentifier("graft_might_contain"), bloomMightInfo, buildBloomMight)
    reg.registerFunction(FunctionIdentifier("graft_json_long"), jsonLongInfo, buildJsonLong)
    reg.registerFunction(FunctionIdentifier("graft_space_saving"), spaceSavingInfo, buildSpaceSaving)
  }

  private[functions] def builders = Seq(
    (FunctionIdentifier("graft_h60"), h60Info, buildH60),
    (FunctionIdentifier("graft_dot"), dotInfo, buildDot),
    (FunctionIdentifier("graft_sqdist"), sqdistInfo, buildSqdist),
    (FunctionIdentifier("graft_cell"), cellInfo, buildCell),
    (FunctionIdentifier("graft_halo_cells"), haloInfo, buildHalo),
    (FunctionIdentifier("graft_probe2"), probe2Info, buildProbe2),
    (FunctionIdentifier("graft_probek"), probeKInfo, buildProbeK),
    (FunctionIdentifier("graft_overlap"), overlapInfo, buildOverlap),
    (FunctionIdentifier("graft_bloom_agg"), bloomAggInfo, buildBloomAgg),
    (FunctionIdentifier("graft_might_contain"), bloomMightInfo, buildBloomMight),
    (FunctionIdentifier("graft_pq_adc"), pqAdcInfo, buildPqAdc),
    (FunctionIdentifier("graft_topk_min"), topKMinInfo, buildTopKMin),
    (FunctionIdentifier("graft_json_long"), jsonLongInfo, buildJsonLong),
    (FunctionIdentifier("graft_space_saving"), spaceSavingInfo, buildSpaceSaving))
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach(ext.injectFunction)
}
