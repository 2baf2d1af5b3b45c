package graft.operators

import graft.ml.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Error contract of the space-saving heavy-hitters sketch
  * (graft_space_saving) against the exact twin: for every emitted term
  * count_lower ≤ true count ≤ count_upper, and every term with true
  * count > n/k is tracked — across partition layouts (partial-merge
  * order changes the bounds' VALUES, never their validity). */
class SpaceSavingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic Zipf-ish stream: term_i appears ⌈400/i⌉ times,
    * i = 1..120, interleaved by a fixed stride so heavy terms are
    * spread through the stream rather than clumped. */
  private def zipf: Seq[String] = {
    val raw = (1 to 120).flatMap(i => Seq.fill(math.ceil(400.0 / i).toInt)(f"t$i%03d"))
    raw.indices.map(j => raw((j * 7919) % raw.length))
  }

  private def contract(partitions: Int, k: Int): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val df = zipf.toDF("term").repartition(partitions)
    val sketch = df
      .agg(call_function("graft_space_saving", $"term", lit(k)).as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.term".as("term"), $"h.count_lower".as("lo"),
        $"h.count_upper".as("hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    val exact = zipf.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = zipf.size.toLong

    assert(sketch.size <= k)
    sketch.foreach { case (t, (lo, hi)) =>
      val c = exact.getOrElse(t, 0L)
      assert(lo <= c, s"$t: lower $lo > true $c")
      assert(c <= hi, s"$t: true $c > upper $hi")
    }
    exact.filter(_._2 > n.toDouble / k).keys.foreach { t =>
      assert(sketch.contains(t), s"guaranteed-frequent $t missing (> n/k)")
    }
  }

  test("bounds + frequent-item guarantee hold on 1 partition")  { contract(1, 16) }
  test("bounds + frequent-item guarantee hold on 8 partitions") { contract(8, 16) }
  test("bounds + frequent-item guarantee hold on 32 partitions, k=8") { contract(32, 8) }

  test("fewer distinct terms than counters → sketch IS the exact count") {
    graft.functions.GraftFunctions.register(spark)
    val terms = Seq("a", "b", "a", "c", "a", "b")
    val out = terms.toDF("term").repartition(3)
      .agg(call_function("graft_space_saving", $"term", lit(10)).as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.term", $"h.count_lower", $"h.count_upper")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(("a", 3L, 3L), ("b", 2L, 2L), ("c", 1L, 1L)))
  }

  test("gate output is rank-ordered and k-sized with the contract inline") {
    val df = CorpusQuality.ds_heavy_hitters_sketch(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty, "inline contract emptied the gate")
    assert(rows.length <= 32)
    assert(rows.map(_.getLong(0)).toSeq === (1L to rows.length).toSeq)
    val uppers = rows.map(_.getLong(3)).toSeq
    assert(uppers === uppers.sorted.reverse)
  }

  test("replay: hand-computed eviction with the lexicographic tie rule") {
    // k=2: b, a fill the counters; c must evict — both have u=1, the
    // tie evicts the lexicographically LARGEST term (b), and c
    // inherits upper = minU+1 = 2 with lower = 1
    val out = graft.functions.SpaceSaving.replay(
      Iterator("b", "a", "c"), k = 2)
    assert(out === Seq(("c", 1L, 2L), ("a", 1L, 1L)))
    // increment path: a repeated term bumps BOTH bounds
    val out2 = graft.functions.SpaceSaving.replay(
      Iterator("a", "a", "b"), k = 2)
    assert(out2 === Seq(("a", 2L, 2L), ("b", 1L, 1L)))
  }

  test("replay equals the single-partition aggregate on an ordered stream") {
    // the twin's premise: replay() IS the aggregate's update path when
    // there is exactly one partition consuming the stream in order
    graft.functions.GraftFunctions.register(spark)
    val terms = Seq("x", "y", "x", "z", "w", "x", "y", "q", "z", "x")
    val viaAgg = terms.toDF("term").coalesce(1)
      .agg(call_function("graft_space_saving", $"term", lit(3)).as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.term", $"h.count_lower", $"h.count_upper")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaAgg === graft.functions.SpaceSaving.replay(terms.iterator, 3))
  }
}
