package graft.operators

import graft.ml.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DistributedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("withRowNumber assigns exactly 1..n in total order across partitions") {
    val df = (1 to 10000).map(i => ((i * 7919) % 10007, i)).toDF("key", "payload")
      .repartition(17) // scatter before numbering
    val numbered = Distributed.withRowNumber(df, "rn", Seq(col("key"), col("payload")))
    val rows = numbered.select("key", "payload", "rn").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == 10000)
    assert(rows.map(_._3).sorted.toSeq == (1L to 10000L))
    // row number order == (key, payload) order
    val byRn = rows.sortBy(_._3).map(t => (t._1, t._2)).toSeq
    assert(byRn == rows.map(t => (t._1, t._2)).sortBy(identity).toSeq)
  }

  test("groupedPrefixSum equals a per-group running sum, groups spanning partitions") {
    val df = (1 to 9000).map { i =>
      (s"g${i % 3}", i, (i % 13).toLong) // 3 groups interleaved
    }.toDF("g", "ord", "v").repartition(23)
    val out = Distributed.groupedPrefixSum(df, Seq("g"), Seq(col("ord")), "v", "cum")
      .select("g", "ord", "v", "cum").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // local reference computation
    val expected = out.map(t => (t._1, t._2) -> t._3).toMap
    out.groupBy(_._1).foreach { case (g, rows) =>
      var run = 0L
      rows.sortBy(_._2).foreach { case (_, ord, v, cum) =>
        run += v
        assert(cum == run, s"group $g ord $ord: got $cum want $run")
      }
    }
    assert(expected.size == 9000)
  }

  test("ungrouped prefix sum and empty input") {
    val df = (1 to 500).map(i => (i, 1L)).toDF("ord", "v")
    val out = Distributed.groupedPrefixSum(df, Seq.empty, Seq(col("ord")), "v", "cum")
      .select("ord", "cum").collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    (1 to 500).foreach(i => assert(out(i) == i.toLong))

    val empty = Seq.empty[(Int, Long)].toDF("ord", "v")
    assert(Distributed.groupedPrefixSum(empty, Seq.empty, Seq(col("ord")), "v", "cum")
      .count() == 0)
    assert(Distributed.withRowNumber(empty, "rn", Seq(col("ord"))).count() == 0)
  }
}
