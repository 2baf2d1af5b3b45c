package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed unigram-LM tokenizer training (Kudo, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates", ACL 2018 — the SentencePiece default,
  * the other tokenizer real pipelines train alongside BPE):
  *
  *   1. seed a large candidate vocabulary (all ≤ `maxPieceLen`
  *      substrings of corpus words, top `seedSize` by occurrence mass,
  *      plus every single character unconditionally);
  *   2. EM: the E-step computes each piece's EXPECTED count over all
  *      segmentations of every word (forward–backward over the word's
  *      segmentation lattice, log-space); the M-step renormalizes
  *      p(piece) = E[count] / Σ E[count];
  *   3. prune: drop the multi-char pieces whose removal costs the
  *      likelihood least (SentencePiece's approximation — a piece's
  *      loss is its expected count times the gap between its own
  *      log-prob and the best segmentation of the piece by the REST
  *      of the vocabulary), shrinking by `shrink` per round until
  *      `vocabSize` remains; single characters are never pruned
  *      (every word must stay segmentable);
  *   4. final EM pass renormalizes the surviving vocabulary.
  *
  * 100 TB shape — identical to [[Bpe]]'s: every statistic lives on the
  * (word, freq) table, so the corpus is scanned ONCE (map-combinable
  * groupBy(word), vocabulary-sized output); each E-step is one
  * distributed flatMap of that table against the BROADCAST current
  * vocabulary followed by a map-combinable sum to ≤|vocab| rows
  * collected at the driver; the M-step and pruning are O(|vocab|)
  * driver arithmetic (pruning's per-piece Viterbi runs on the piece
  * STRINGS, not the corpus). Rounds cost vocabulary, never corpus.
  *
  * Determinism (bit-exact retrains, the ta_bpe_train discipline): the
  * per-word E-step is fixed-order double arithmetic, and its corpus
  * aggregation goes through DECIMAL(28,12) so partition merge order
  * cannot wiggle the last ulp; pruning sorts by (loss desc, piece) —
  * lexicographic tie-break.
  */
object Unigram {
  final case class Piece(token: String, logp: Double)

  private val dec12 = DecimalType(28, 12)

  /** Code points of a word (the shared segmentation unit — same as the
    * BPE side's substr/codePointSyms convention). */
  private def cps(w: String): Array[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      buf += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    buf.toArray
  }

  /** One corpus pass → (w, freq): the distinct-word table every later
    * round runs on. */
  private def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode_outer(filter(split(trim(lower(col(textCol))), "\\s+"),
        t => length(t) > 0)).as("w"))
      .filter(col("w").isNotNull)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Forward–backward expected piece counts for ONE word under the
    * current vocabulary (log-space, log-sum-exp): the textbook E-step.
    * Returns (piece, expectedCount) for each lattice arc with mass. */
  private[operators] def expectedCounts(word: String,
      vocab: Map[String, Double], maxPieceLen: Int): Seq[(String, Double)] = {
    val c = cps(word)
    val n = c.length
    if (n == 0) return Seq.empty
    val NEG = Double.NegativeInfinity
    def lse(a: Double, b: Double): Double =
      if (a == NEG) b else if (b == NEG) a
      else { val m = math.max(a, b); m + math.log1p(math.exp(-math.abs(a - b))) }
    // arcs(i) = (j, piece, logp) for pieces spanning [i, j)
    val arcs = Array.tabulate(n) { i =>
      (1 to math.min(maxPieceLen, n - i)).flatMap { len =>
        val piece = c.slice(i, i + len).mkString
        vocab.get(piece).map(lp => (i + len, piece, lp))
      }
    }
    val alpha = Array.fill(n + 1)(NEG); alpha(0) = 0.0
    for (i <- 0 until n; (j, _, lp) <- arcs(i) if alpha(i) != NEG)
      alpha(j) = lse(alpha(j), alpha(i) + lp)
    val beta = Array.fill(n + 1)(NEG); beta(n) = 0.0
    for (i <- (n - 1) to 0 by -1; (j, _, lp) <- arcs(i) if beta(j) != NEG)
      beta(i) = lse(beta(i), lp + beta(j))
    val z = alpha(n)
    if (z == NEG) return Seq.empty // unsegmentable (never: chars are kept)
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (i <- 0 until n; (j, piece, lp) <- arcs(i)
         if alpha(i) != NEG && beta(j) != NEG) {
      val m = math.exp(alpha(i) + lp + beta(j) - z)
      acc.update(piece, acc.getOrElse(piece, 0.0) + m)
    }
    acc.toSeq
  }

  /** Viterbi segmentation under a trained vocabulary — the unigram
    * ENCODER (deterministic: strict-improvement updates with pieces
    * tried shortest-first make the result unique). */
  private[operators] def viterbi(word: String, vocab: Map[String, Double],
      maxPieceLen: Int): Seq[String] = {
    val c = cps(word)
    val n = c.length
    if (n == 0) return Seq.empty
    val NEG = Double.NegativeInfinity
    val best = Array.fill(n + 1)(NEG); best(0) = 0.0
    val back = Array.fill(n + 1)(-1) // start index of the winning piece
    for (j <- 1 to n; len <- 1 to math.min(maxPieceLen, j)) {
      val i = j - len
      if (best(i) != NEG) {
        vocab.get(c.slice(i, j).mkString).foreach { lp =>
          if (best(i) + lp > best(j)) { best(j) = best(i) + lp; back(j) = i }
        }
      }
    }
    if (best(n) == NEG) return Seq(word) // unsegmentable fallback
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = n
    while (j > 0) { val i = back(j); out += c.slice(i, j).mkString; j = i }
    out.reverse.toSeq
  }

  /** One distributed E-step + driver M-step: expected counts of every
    * vocabulary piece over the word table, renormalized to log-probs. */
  private def emStep(words: DataFrame, vocab: Map[String, Double],
      maxPieceLen: Int): Map[String, Double] = {
    val s = words.sparkSession
    val vb = s.sparkContext.broadcast(vocab)
    val eUdf = udf { (w: String, freq: Long) =>
      expectedCounts(w, vb.value, maxPieceLen)
        .map { case (t, c) => (t, c * freq) }
    }
    val counts = words
      .select(explode(eUdf(col("w"), col("freq"))).as("tc"))
      .groupBy(col("tc._1").as("t"))
      .agg(sum(col("tc._2").cast(dec12)).as("c"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1).doubleValue()).toMap
    vb.destroy()
    val total = counts.values.sum
    val logTotal = math.log(total)
    // pieces with zero expected mass this round keep a floor so a later
    // round can still recruit them? No — SentencePiece drops them; we
    // keep only observed pieces (chars always re-observed via their own
    // arcs, since every lattice contains the char-only path).
    counts.map { case (t, c) => t -> (math.log(c) - logTotal) }
  }

  /** Alphabet floor + dead-piece cleanup after an EM step. EM on a
    * corpus fully explained by multi-char pieces drives single-char
    * expected counts to (decimal-quantized) ZERO; a char at logp −∞
    * then contributes only −∞ lattice arcs, the forward–backward guard
    * drops it from the next round's counts, and it silently leaves the
    * vocabulary — breaking the "every word stays segmentable"
    * invariant (SentencePiece pins required chars the same way). The
    * floor (e⁻³⁰ ≈ 1e−13 of unigram mass) is too small to perturb
    * segmentations but keeps the alphabet's arcs finite. Multi-char
    * pieces whose mass died are legitimately dead — pruned here so −∞
    * rows never reach the trained piece list. */
  private def floorChars(v: Map[String, Double],
      charSet: Set[String]): Map[String, Double] = {
    val floor = -30.0
    val alive = v.filter { case (t, lp) =>
      charSet.contains(t) || lp > Double.NegativeInfinity }
    charSet.foldLeft(alive) { (m, c) =>
      if (m.get(c).exists(_ > Double.NegativeInfinity)) m
      else m.updated(c, floor)
    }
  }

  /** Train a `vocabSize`-piece unigram LM on the corpus. */
  def train(s: SparkSession, docs: DataFrame, vocabSize: Int,
      textCol: String = "text", maxPieceLen: Int = 6, seedSize: Int = 400,
      emIters: Int = 2, shrink: Double = 0.75): Seq[Piece] = {
    val words = wordFreqs(docs, textCol).localCheckpoint()

    // ---- seed: all ≤ maxPieceLen substrings, weighted by occurrence
    // mass (substring count × word freq) — one HOF expansion on the
    // word table, map-combinable sum, vocabulary-sized collect
    val subUdf = udf { (w: String, freq: Long) =>
      val c = cps(w)
      (for (i <- c.indices; len <- 1 to math.min(maxPieceLen, c.length - i))
        yield (c.slice(i, i + len).mkString, freq)).toSeq
    }
    val subCounts = words.select(explode(subUdf(col("w"), col("freq"))).as("p"))
      .groupBy(col("p._1").as("t")).agg(sum(col("p._2")).as("c"))
    val chars = subCounts.filter(length(col("t")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val multis = subCounts.filter(length(col("t")) > 1)
      .orderBy(col("c").desc, col("t"))
      .head(math.max(0, seedSize - chars.length))
      .map(r => (r.getString(0), r.getLong(1)))
    val seedMass = (chars ++ multis).map(_._2).sum.toDouble
    var vocab: Map[String, Double] = (chars ++ multis)
      .map { case (t, cmass) => t -> math.log(cmass / seedMass) }.toMap
    val charSet = chars.map(_._1).toSet

    // ---- EM + prune rounds until the target size
    var done = false
    while (!done) {
      var it = 0
      while (it < emIters) {
        vocab = floorChars(emStep(words, vocab, maxPieceLen), charSet)
        it += 1
      }
      val multiCount = vocab.keys.count(!charSet.contains(_))
      // second clause: a character alphabet already past vocabSize has
      // nothing left to prune — terminate instead of re-running EM forever
      if (multiCount + charSet.size <= vocabSize || multiCount == 0) done = true
      else {
        // prune: loss(t) = E[count_t] × (logp_t − bestAlt_t), where
        // bestAlt segments t's own string with the rest of the vocab —
        // O(|vocab|) driver work on piece strings
        val keepMulti = math.max(vocabSize - charSet.size,
          math.ceil(multiCount * shrink).toInt.min(multiCount - 1))
        val losses = vocab.toSeq.collect {
          case (t, lp) if !charSet.contains(t) =>
            val rest = vocab - t
            val alt = viterbi(t, rest, maxPieceLen)
              .map(p => rest.getOrElse(p, Double.NegativeInfinity)).sum
            // expected count is recoverable from lp (same normalizer for
            // every piece this round), so lp − alt ordering × exp(lp)
            // ranks identically to count × (lp − alt)
            (t, math.exp(lp) * (lp - alt))
        }
        val keep = losses.sortBy { case (t, loss) => (-loss, t) }
          .take(keepMulti).map(_._1).toSet
        vocab = vocab.filter { case (t, _) => charSet.contains(t) || keep(t) }
      }
    }
    vocab = floorChars(emStep(words, vocab, maxPieceLen), charSet) // final renormalize
    words.unpersist()
    vocab.toSeq.sortBy { case (t, lp) => (-lp, t) }
      .map { case (t, lp) => Piece(t, lp) }
  }

  /** Viterbi encoder column over a trained piece list (broadcast
    * closure, stateless map — never shuffles; the unigram twin of
    * [[Bpe.encodeCol]]). */
  def encodeCol(pieces: Seq[Piece], maxPieceLen: Int = 6): Column => Column = {
    val vocab = pieces.map(p => p.token -> p.logp).toMap
    val enc = udf { (w: String) => viterbi(w, vocab, maxPieceLen) }
    (c: Column) => enc(lower(c))
  }

  /** Gate: 80-piece unigram vocabulary on the documents corpus.
    * Rows-only (iterative EM has no SQL twin; bit-identical retrains by
    * the decimal-accumulated E-step + lexicographic prune ties).
    * Inline quality floor: the trained vocabulary must COMPRESS — mean
    * Viterbi pieces per corpus word ≤ 0.9 × mean characters per word
    * (a broken E-step or prune that collapses to char-only tokenization
    * empties the gate instead of shipping a unigram LM that tokenizes
    * like a character model). */
  def ta_unigram_train(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val pieces = train(s, docs, vocabSize = 80)
    val vb = s.sparkContext.broadcast(pieces.map(p => p.token -> p.logp).toMap)
    val nPieces = udf { (w: String) => viterbi(w, vb.value, 6).length }
    val nChars = udf { (w: String) => cps(w).length }
    val words = wordFreqs(docs, "text")
    val ratioRow = words.agg(
      (sum(nPieces(col("w")) * col("freq")).cast("double") /
        sum(nChars(col("w")) * col("freq")).cast("double")).as("r")).head()
    val ratio = ratioRow.getDouble(0)
    val out = pieces.zipWithIndex
      .map { case (p, i) => (i.toLong, p.token, p.logp, p.token.length.toLong) }
      .toDF("rank", "token", "logp", "token_len")
    if (ratio <= 0.9) out.orderBy($"rank") else out.limit(0)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_unigram_train" -> ta_unigram_train _
  )

  val oracles: Map[String, String] = Map.empty
}
