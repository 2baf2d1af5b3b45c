package graft.llm

import graft.ml.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Word2VecRuntime: a LEARNED embedding runtime (MLlib skip-gram).
  * Unlike the stub/hashing runtimes the vectors come from corpus
  * co-occurrence, so there is no closed-form oracle; the contract here
  * is determinism, the bag-of-vectors pooling math, and that learned
  * cosine actually reflects distributional similarity on a corpus
  * built to have two disjoint topic clusters.
  */
class Word2VecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Two artificial "topics" with disjoint vocabularies: words inside a
  // topic co-occur constantly, across topics never.
  private lazy val corpus = {
    val fruit = Seq("apple", "banana", "cherry", "mango", "pear")
    val metal = Seq("iron", "copper", "zinc", "nickel", "cobalt")
    val rows = (0 until 120).map { i =>
      val ws = if (i % 2 == 0) fruit else metal
      // rotate so every pair inside a topic shares windows
      (0 until 6).map(j => ws((i + j) % ws.size)).mkString(" ")
    }
    rows.toDF("body")
  }

  test("fit is deterministic for a fixed seed and pooling is the normalized mean") {
    val a = Word2VecRuntime.fit(corpus, "body", dim = 16, minCount = 1, seed = 7L)
    val b = Word2VecRuntime.fit(corpus, "body", dim = 16, minCount = 1, seed = 7L)
    assert(a.vectors.keySet == b.vectors.keySet)
    for (w <- a.vectors.keySet)
      assert(a.vectors(w).toSeq == b.vectors(w).toSeq, s"vector for $w differs")

    // pooling: embed("apple banana") == normalize((v_apple + v_banana)/2)
    val Seq(e) = a.embed(Seq("apple banana"), 16)
    val va = a.vectors("apple"); val vb = a.vectors("banana")
    val mean = va.indices.map(i => (va(i).toDouble + vb(i).toDouble) / 2)
    val nrm = math.sqrt(mean.map(x => x * x).sum)
    val expect = mean.map(x => (x / nrm).toFloat)
    e.toSeq.zip(expect).foreach { case (got, exp) =>
      assert(math.abs(got - exp) < 1e-6f)
    }
    // unit norm
    assert(math.abs(e.map(x => x.toDouble * x).sum - 1.0) < 1e-6)
  }

  test("learned cosine separates the two topic clusters") {
    val rt = Word2VecRuntime.fit(corpus, "body", dim = 16, minCount = 1,
      maxIter = 4, seed = 7L)
    def cos(x: Array[Float], y: Array[Float]): Double =
      x.indices.map(i => x(i).toDouble * y(i)).sum
    val Seq(fr1, fr2, mt1, mt2) = rt.embed(
      Seq("apple cherry", "banana mango pear", "iron zinc", "copper nickel cobalt"), 16)
    val within = Seq(cos(fr1, fr2), cos(mt1, mt2))
    val across = Seq(cos(fr1, mt1), cos(fr1, mt2), cos(fr2, mt1), cos(fr2, mt2))
    assert(within.min > across.max,
      s"within=${within.mkString(",")} across=${across.mkString(",")}")
  }

  test("OOV and empty text embed to the zero vector; rank scores by query cosine") {
    val rt = Word2VecRuntime.fit(corpus, "body", dim = 8, minCount = 1, seed = 3L)
    val Seq(oov, empty) = rt.embed(Seq("xylophone qwerty", "   "), 8)
    assert(oov.forall(_ == 0f) && empty.forall(_ == 0f))

    val scores = rt.rank("apple banana", Seq("cherry mango", "iron copper", ""))
    assert(scores.size == 3)
    assert(scores(0) > scores(1)) // same-topic doc outranks cross-topic
    assert(scores(2) == 0.0)      // empty doc → zero vector → zero score
  }

  test("fitAndRegister exposes the runtime through the ModelRuntimes registry") {
    val rt = Word2VecRuntime.fitAndRegister("spec", corpus, "body",
      dim = 8, minCount = 1, seed = 3L)
    assert(ModelRuntimes.get("word2vec:spec") eq rt)
    // the SQL-visible surface runs through the same seam
    val df = Seq("apple banana", "iron copper").toDF("t")
    val out = Ops.embedColumn(df, rt, "t", "e", dim = 8).collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Seq[Float]]("e").size == 8))
  }
}
