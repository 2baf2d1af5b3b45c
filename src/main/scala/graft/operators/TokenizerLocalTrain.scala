package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounded driver route for the tokenizer merge loops (r21; the
  * HistGB/SMO route-by-runtime-size discipline, guide §1.2-1).
  *
  * [[Bpe.train]] and [[WordPiece.train]] depend on corpus data only
  * through the vocabulary-sized (sym, freq) word table; after that ONE
  * pass, every merge round is vocabulary-sized work — yet the
  * distributed loop schedules 2–5 jobs per round (pair-count argmax,
  * symbol counts + two broadcast builds for WordPiece, the round's
  * localCheckpoint), ~105 jobs for the 20-round wordpiece gate whose
  * profiled cost is driver gaps between 30–180 ms jobs, not data work.
  * When the word table fits `spark.graft.tokenizerLocalTrainWords`
  * (default 262144 distinct words, 0 disables), the rounds run in a
  * driver loop instead.
  *
  * BIT-IDENTICAL by construction, not approximately: every statistic
  * is exact integer arithmetic (pair/symbol counts are sums of longs),
  * the WordPiece score is the same single IEEE division of the same
  * integers, the argmax tie-break replicates Spark's `orderBy`
  * exactly — including UTF8String BINARY string order (unsigned UTF-8
  * bytes, which differs from Java's UTF-16 `compareTo` for
  * supplementary code points) — and the merge application is the same
  * left-to-right non-overlapping fold as the SQL `aggregate`. The
  * ta_bpe_train / ta_wordpiece_train gate families stay hash-exact against the
  * DuckDB oracle, and TokenizerLocalTrainSpec pins local == distributed
  * on fixtures (scores compared as raw bits).
  *
  * Above the cap nothing changes: the collect probes `cap + 1` rows of
  * the ALREADY-CHECKPOINTED word table (one vocabulary-sized job, no
  * corpus re-scan) and the distributed loop proceeds from the same
  * checkpoint — the 100 TB shape is untouched.
  */
private[operators] object TokenizerLocalTrain {

  /** Spark's UTF8String binary comparison: unsigned UTF-8 bytes, then
    * length — what `orderBy(col("l"))` ties break by. */
  private[operators] val utf8Order: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
  }

  /** The (sym, freq) word table collected when it fits the cap, else
    * None. Run against the checkpointed table so the probe never
    * re-scans the corpus. */
  def collectBounded(words: DataFrame): Option[Array[(Array[String], Long)]] = {
    val cap = words.sparkSession.conf
      .getOption("spark.graft.tokenizerLocalTrainWords")
      .map(_.toInt).getOrElse(262144)
    if (cap <= 0) return None
    val rows = words.limit(cap + 1).collect()
    if (rows.length > cap) None
    else Some(rows.map(r =>
      (r.getSeq[String](0).toArray, r.getLong(1))))
  }

  /** The SQL fold's left-to-right non-overlapping replacement. */
  private def applyMerge(sym: Array[String], l: String, r: String,
      m: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](sym.length)
    var i = 0
    while (i < sym.length) {
      val x = sym(i)
      if (out.nonEmpty && out(out.length - 1) == l && x == r)
        out(out.length - 1) = m
      else out += x
      i += 1
    }
    out.toArray
  }

  private def pairCounts(words: Array[(Array[String], Long)])
      : scala.collection.mutable.HashMap[(String, String), Long] = {
    val cnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
    words.foreach { case (sym, freq) =>
      var i = 0
      while (i < sym.length - 1) {
        val k = (sym(i), sym(i + 1))
        cnt.update(k, cnt.getOrElse(k, 0L) + freq)
        i += 1
      }
    }
    cnt
  }

  /** [[Bpe.train]]'s merge rounds on the collected table: argmax by
    * (cnt desc, l, r) per round. */
  def bpeMerges(words0: Array[(Array[String], Long)],
      numMerges: Int): Seq[Bpe.Merge] = {
    val words = words0.clone()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Bpe.Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val cnt = pairCounts(words)
      if (cnt.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        cnt.foreach { e =>
          if (best == null) best = e
          else {
            val c = java.lang.Long.compare(e._2, best._2)
            val better =
              if (c != 0) c > 0
              else {
                val cl = utf8Order.compare(e._1._1, best._1._1)
                if (cl != 0) cl < 0 else utf8Order.compare(e._1._2, best._1._2) < 0
              }
            if (better) best = e
          }
        }
        val ((l, r), c) = best
        merges += Bpe.Merge(rank, l, r, c)
        val m = l + r
        var i = 0
        while (i < words.length) {
          words(i) = (applyMerge(words(i)._1, l, r, m), words(i)._2)
          i += 1
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** [[WordPiece.train]]'s merge rounds on the collected table: score =
    * cnt / (cl · cr) — the identical IEEE division of the same exact
    * integers — argmax by (score desc, l, r) per round. */
  def wordPieceMerges(words0: Array[(Array[String], Long)],
      numMerges: Int): Seq[WordPiece.Merge] = {
    def strip(t: String): String =
      if (t.startsWith(WordPiece.CONT)) t.substring(WordPiece.CONT.length) else t
    val words = words0.clone()
    val merges = scala.collection.mutable.ArrayBuffer.empty[WordPiece.Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val pc = pairCounts(words)
      if (pc.isEmpty) exhausted = true
      else {
        val sc = scala.collection.mutable.HashMap.empty[String, Long]
        words.foreach { case (sym, freq) =>
          var i = 0
          while (i < sym.length) {
            sc.update(sym(i), sc.getOrElse(sym(i), 0L) + freq)
            i += 1
          }
        }
        var bestL: String = null; var bestR: String = null
        var bestCnt = 0L; var bestScore = 0.0
        var bestCl = 0L; var bestCr = 0L
        pc.foreach { case ((l, r), c) =>
          val cl = sc(l); val cr = sc(r)
          val score = c.toDouble / (cl.toDouble * cr.toDouble)
          val better =
            if (bestL == null) true
            else {
              val cs = java.lang.Double.compare(score, bestScore)
              if (cs != 0) cs > 0
              else {
                val compL = utf8Order.compare(l, bestL)
                if (compL != 0) compL < 0 else utf8Order.compare(r, bestR) < 0
              }
            }
          if (better) {
            bestL = l; bestR = r; bestCnt = c; bestScore = score
            bestCl = cl; bestCr = cr
          }
        }
        merges += WordPiece.Merge(rank, bestL, bestR, bestL + strip(bestR),
          bestCnt, bestScore, bestCl, bestCr)
        val m = bestL + strip(bestR)
        var i = 0
        while (i < words.length) {
          words(i) = (applyMerge(words(i)._1, bestL, bestR, m), words(i)._2)
          i += 1
        }
        rank += 1
      }
    }
    merges.toSeq
  }
}
