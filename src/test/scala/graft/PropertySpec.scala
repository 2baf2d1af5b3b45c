package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (SURVEY §5 item 1) over the engine's pure
  * kernels — the driver-side arithmetic whose edge cases a fixed golden
  * can't sweep: split-size arithmetic, the LangChain merge invariants
  * the chunk gates rely on, GenScale's rotation orthogonality (the
  * invariant that makes the scaling corpus distance-preserving), and
  * quantizer k sizing. */
class PropertySpec extends AnyFunSuite {
  private def check(name: String, p: Prop, min: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("trainTestCounts: fractional sizes partition exactly, round-half") {
    // round-half can consume ALL rows at small n / large f — the
    // reference rule is to refuse, so the property covers both branches
    check("partition", Prop.forAllNoShrink(
      Gen.chooseNum(2L, 1000000L), Gen.chooseNum(0.001, 0.9)) { (n, f) =>
      val expected = math.round(n * f)
      if (expected >= n)
        Prop.throws(classOf[IllegalArgumentException]) {
          ml.Sampling.trainTestCounts(n, f)
        }
      else {
        val (train, test) = ml.Sampling.trainTestCounts(n, f)
        train + test == n && train > 0 && test == expected
      }
    })
  }

  test("trainTestCounts: sizes > 1 are absolute counts (reference rule)") {
    check("absolute", Prop.forAll(
      Gen.chooseNum(10L, 100000L)) { n =>
      val t = (n / 2) + 1
      val (train, test) = ml.Sampling.trainTestCounts(n, t.toDouble)
      train == n - t && test == t
    })
  }

  test("trainTestCounts: refuses an empty train side") {
    check("refuse", Prop.forAll(Gen.chooseNum(1L, 1000L)) { n =>
      Prop.throws(classOf[IllegalArgumentException]) {
        ml.Sampling.trainTestCounts(n, n.toDouble)
      }
    })
  }

  // word-soup generator matching the corpus contract the chunk gates
  // assume: nonempty single-spaced words, each far below the chunk size
  private val wordsGen: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.chooseNum(1, 12).flatMap(l =>
      Gen.stringOfN(l, Gen.alphaLowerChar)))

  /** Independent re-derivation of the LangChain merge as a word-window
    * state machine over prefix sums — the same formulation the
    * llm_chunk_recursive DuckDB oracle uses (LLMQueries scaladoc), kept
    * structurally disjoint from the production piece-buffer loop so the
    * two implementations check each other. */
  private def windowMerge(words: IndexedSeq[String], size: Int,
      overlap: Int): Seq[String] = {
    val n = words.length
    val P = words.scanLeft(0L)(_ + _.length)
    def wl(i: Int, j: Int): Long =
      if (i > j) 0L else P(j + 1) - P(i) + (j - i)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    for (q <- 1 until n) {
      val j = q - 1
      val lp = words(q).length
      if (i <= j && wl(i, j) + lp + 1 > size) {
        out += ((i, j))
        i = (i to q).find { k =>
          !(wl(k, j) > overlap ||
            (wl(k, j) + lp + (if (k <= j) 1 else 0) > size && wl(k, j) > 0))
        }.get
      }
    }
    out += ((i, n - 1))
    out.map { case (a, b) => words.slice(a, b + 1).mkString(" ") }.toSeq
  }

  test("recursive chunker: chunks within size and equal to the window-state formulation") {
    check("chunker", Prop.forAll(wordsGen) { words =>
      val text = words.mkString(" ")
      val chunks = llm.Chunk.chunk("recursive_character", text,
        Map("chunk_size" -> "80", "chunk_overlap" -> "20")).map(_._2)
      chunks.nonEmpty && chunks.forall(_.length <= 80) &&
        chunks == windowMerge(words.toIndexedSeq, 80, 20)
    })
  }

  test("GenScale rotation: orthogonal for every replica (distance-preserving)") {
    check("rotation", Prop.forAll(
      Gen.chooseNum(2, 24), Gen.chooseNum(1, 8)) { (d, replica) =>
      val r = tools.GenScale.rotation(d, replica)
      val maxErr = (for (i <- 0 until d; j <- 0 until d) yield {
        val dot = (0 until d).map(k => r(i)(k) * r(j)(k)).sum
        math.abs(dot - (if (i == j) 1.0 else 0.0))
      }).max
      maxErr < 1e-9
    }, min = 100)
  }

  test("chooseK: bounded, monotone in rows, hits the target cell size") {
    check("chooseK", Prop.forAll(
      Gen.chooseNum(1L, 10000000L), Gen.chooseNum(10L, 100000L)) { (rows, target) =>
      val k = operators.KMeansQuantizer.chooseK(rows, target)
      val kMore = operators.KMeansQuantizer.chooseK(rows * 2, target)
      k >= 2 && k <= 65536 &&
        (k == 2 || k == 65536 || rows.toDouble / k <= target) &&
        kMore >= k
    })
  }
}
