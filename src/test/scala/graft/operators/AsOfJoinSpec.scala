package graft.operators

import graft.ml.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("picks the most recent right row at or before each left time") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3")).toDF("k", "lt", "lname")
    val right = Seq((1L, ts("2024-01-01 09:30:00"), "c1"),
      (1L, ts("2024-01-01 11:00:00"), "c2"),
      (1L, ts("2024-01-01 13:00:00"), "c3")).toDF("k", "rt", "rname")
    val out = AsOfJoin.asof(left, right, Seq("k"), "lt", "rt")
      .select($"lname", $"asof.rname".as("rname")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("p1") == Some("c1")) // 10:00 → 09:30
    assert(out("p2") == Some("c2")) // 12:00 → 11:00 (not 13:00)
    assert(out("p3") == None)       // key 2 has no right rows
  }

  test("equal timestamps are inclusive (>= semantics)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "lt", "lname")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), "c")).toDF("k", "rt", "rname")
    val got = AsOfJoin.asof(left, right, Seq("k"), "lt", "rt")
      .select($"asof.rname").head().getString(0)
    assert(got == "c")
  }

  test("empty right side leaves every left row unmatched") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "lt", "lname")
    val right = Seq.empty[(Long, java.sql.Timestamp, String)].toDF("k", "rt", "rname")
    val out = AsOfJoin.asof(left, right, Seq("k"), "lt", "rt")
    assert(out.count() == 1 && out.filter($"asof".isNull).count() == 1)
  }
}
