package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` / `embeddings` — the
  * training-data-pipeline dedup family: exact, n-gram Jaccard, MinHash
  * + banded LSH, SimHash, embedding-cosine near-dup.
  *
  * Scale design (100 TB):
  *  - exact dedup is a single hash-aggregate on a fingerprint — the
  *    canonical map-side-combinable groupBy; no row data moves, only
  *    (fingerprint, id) pairs.
  *  - ngram-Jaccard never materializes the O(n²) pair space: candidate
  *    pairs come from an equi-join on shingles (only docs sharing a
  *    shingle meet), i.e. shuffle is bounded by Σ df², not n².
  *  - MinHash compresses each doc to a 32-int signature (constant size
  *    per doc regardless of length), LSH bands turn near-dup search into
  *    an equi-join on (band, band-signature) — the standard way to make
  *    fuzzy dedup shuffle-joinable at cluster scale.
  *  - All hash functions are closed-form arithmetic over md5 (no library
  *    RNG), so the DuckDB oracle replays them exactly.
  *
  * Hash parity scheme shared with the oracles: H(s) = first 15 hex chars
  * of md5(s) as a 60-bit integer; minhash_j uses universal hashing
  * ((a_j·(H mod p) + b_j) mod p) with p = 2^31-1 and a_j, b_j derived
  * from j arithmetically — both engines compute identical 64-bit ints.
  */
object Dedup {
  private[operators] val P = 2147483647L // 2^31 - 1
  private[operators] val NUM_HASHES = 32
  private[operators] val BAND_ROWS = 4 // → 8 bands

  /** Normalized tokens. */
  private def toks(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** Word-3-gram shingle set (distinct), one row per (doc_id, shingle),
    * identified by its 60-bit `graft_h60` fingerprint — all downstream
    * df counts, pair joins, and minhash shuffles move 8-byte longs, not
    * shingle strings (the standard web-dedup shape; at 100 TB the
    * shingle relation dominates the job's shuffle volume, and ~25-byte
    * text keys triple it for no semantic gain — a 60-bit space holds
    * trillions of distinct shingles below birthday-collision odds).
    * Docs with <3 tokens produce no shingles (mirrored in oracle SQL). */
  private[operators] def shingles(s: SparkSession, dir: String): DataFrame =
    shinglesOf(s, Tables.documents(s, dir))

  /** Shingles of an arbitrary (doc_id, text) frame — the full-rule
    * curation oracle shingles the C4-cleaned `kept_text` of its pool,
    * not the raw corpus. */
  private[operators] def shinglesOf(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    docs
      .select($"doc_id", toks($"text").as("t"))
      .filter(size($"t") >= 3)
      .select($"doc_id", explode(array_distinct(
        transform(sequence(lit(1), size($"t") - 2),
          i => call_function("graft_h60",
            concat_ws(" ", element_at($"t", i), element_at($"t", i + 1),
              element_at($"t", i + 2)))))).as("hs"))
  }

  private[operators] val shinglesSqlCte: String =
    shinglesCteOn("documents", "text", "tok", "sh")

  /** The same shingle chain over relation `rel`'s `textCol`, emitted
    * under caller-chosen CTE names so two shingle sets (pool kept_text
    * vs benchmark raw text) compose in one oracle. */
  private[operators] def shinglesCteOn(rel: String, textCol: String,
      tokName: String, shName: String): String =
    s"""$tokName AS (SELECT doc_id, regexp_split_to_array(trim(lower($textCol)), '\\s+') AS t
       |        FROM $rel WHERE len(regexp_split_to_array(trim(lower($textCol)), '\\s+')) >= 3),
       |$shName AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
       |         i -> CAST(('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 15)) AS UBIGINT)::BIGINT))) AS hs
       |       FROM $tokName)""".stripMargin

  /** 60-bit integer hash of a string via md5 prefix (identical in
    * DuckDB). Served by the native codegen expression `graft_h60`
    * (graft.functions.Md5Prefix60) — digest bytes → long with no hex
    * string round-trip, same value as
    * `conv(substring(md5(c),1,15),16,10)`. */
  private[operators] def h60(s: SparkSession, c: Column): Column = {
    graft.functions.GraftFunctions.register(s)
    call_function("graft_h60", c)
  }

  private[operators] val h60Sql = "CAST(('0x' || substr(md5(%s), 1, 15)) AS UBIGINT)::BIGINT"

  // ---------------------------------------------------------------- exact
  /** Exact dedup: group by normalized-content fingerprint; keeper = min
    * doc_id; emits one row per distinct content with its multiplicity. */
  def dd_exact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy(md5(trim(lower($"text"))).as("fingerprint"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy($"fingerprint")
  }

  val ddExactSql: String =
    """SELECT md5(trim(lower(text))) AS fingerprint, min(doc_id) AS keep_id,
      |  count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------- ngram jaccard
  /** N-gram Jaccard near-dup pairs. The OPERATOR DEFAULT is df-capped
    * (`dfCap = Some(50)`): shingles appearing in more documents are
    * dropped before the pair join, bounding the candidate fan-out at
    * Σ min(df, cap)² — standard web-dedup practice, the only shape that
    * survives a hot shingle at 100 TB. `dfCap = None` selects the exact
    * all-pairs baseline, guarded: the operator first computes the actual
    * fan-out Σ df² (one tiny agg over per-shingle counts) and refuses to
    * run past `maxFanout` instead of melting the shuffle. */
  def ngramJaccardPairs(s: SparkSession, dir: String, threshold: Double,
      dfCap: Option[Int] = Some(DF_CAP),
      maxFanout: Long = 2000000000L): DataFrame = {
    import s.implicits._
    // cache(), deliberately without an unpersist site: the frame rides
    // inside the returned lazy plan, and the pin lives in the EVICTABLE
    // storage pool (MEMORY_AND_DISK blocks yield to executor memory
    // pressure), so a long session is bounded by the storage fraction,
    // not leaked — measured: a localCheckpoint here costs ~2x on every
    // dd_* gate for eager write+read of a frame cache serves in memory
    val sh = shingles(s, dir).cache()
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val joinable = dfCap match {
      case Some(cap) =>
        val rare = sh.groupBy($"hs").agg(count(lit(1)).as("df"))
          .filter($"df" <= cap).select($"hs")
        sh.join(broadcast(rare), "hs")
      case None =>
        val fanout = sh.groupBy($"hs").agg(count(lit(1)).as("df"))
          .agg(coalesce(sum($"df" * $"df"), lit(0L))).head().getLong(0)
        require(fanout <= maxFanout,
          s"exact all-pairs n-gram Jaccard would generate $fanout candidate " +
            s"comparisons (> $maxFanout); use the df-capped default " +
            s"(dfCap = Some($DF_CAP)) or dd_minhash_lsh")
        sh
    }
    val a = joinable.select($"doc_id".as("da"), $"hs")
    val b = joinable.select($"doc_id".as("db"), $"hs")
    val inter = a.join(b, a("hs") === b("hs") && a("da") < b("db"))
      .groupBy($"da", $"db").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select($"doc_id".as("da"), $"n".as("na")), "da")
      .join(sizes.select($"doc_id".as("db"), $"n".as("nb")), "db")
      .withColumn("jaccard", $"i".cast("double") / ($"na" + $"nb" - $"i"))
      .filter($"jaccard" >= threshold)
      .select($"da", $"db", $"i".as("n_common"), $"jaccard")
      .orderBy($"da", $"db")
  }

  /** Exact (uncapped, guarded) baseline at threshold 0.8. */
  def dd_ngram_jaccard(s: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(s, dir, 0.8, dfCap = None)

  val ddNgramSql: String =
    s"""WITH $shinglesSqlCte,
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
       |  FROM sh a JOIN sh b ON a.hs = b.hs AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT da, db, i AS n_common,
       |  CAST(i AS DOUBLE) / (x.n + y.n - i) AS jaccard
       |FROM inter JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
       |WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.8
       |ORDER BY da, db""".stripMargin

  // ------------------------------------------------------- minhash + LSH
  /** 32-permutation MinHash signatures, one row per (doc_id, j, minhash).
    * Computed as ONE wide aggregation (32 min() expressions over the
    * shingle rows, map-side combinable) instead of a 32× row explosion —
    * the shuffle carries one 32-long partial state per doc per partition.
    * Unpivoted to (doc_id, j, mh) for the band/verify joins. */
  private def minhashes(s: SparkSession, dir: String): DataFrame =
    minhashesOf(s, shingles(s, dir))

  private def minhashesOf(s: SparkSession, sh: DataFrame): DataFrame = {
    import s.implicits._
    val aggs = (0 until NUM_HASHES).map { j =>
      val a = ((j + 1) * 2654435761L) % P
      val b = ((j + 1) * 40503L + 17L) % P
      min((lit(a) * $"hm" + lit(b)) % P).as(s"mh$j")
    }
    val wide = sh
      .withColumn("hm", $"hs" % P)
      .groupBy($"doc_id")
      .agg(aggs.head, aggs.tail: _*)
    wide.select($"doc_id",
      posexplode(array((0 until NUM_HASHES).map(j => col(s"mh$j")): _*)))
      .select($"doc_id", $"pos".cast("int").as("j"), $"col".as("mh"))
  }

  private[operators] val minhashSqlCte: String = minhashCteOn("sh", "mh")

  /** The minhash signature CTE over shingle relation `shName`, emitted
    * as `mhName` — parameterized for the full-rule curation oracle's
    * pool-restricted kept_text signatures. */
  private[operators] def minhashCteOn(shName: String, mhName: String): String =
    s"""$mhName AS (
       |  SELECT doc_id, j,
       |    min((((j + 1) * 2654435761 % ${P}) * hm + ((j + 1) * 40503 + 17) % ${P}) % ${P}) AS mh
       |  FROM (SELECT doc_id, hs % ${P} AS hm FROM $shName) q,
       |       (SELECT unnest(range(0, ${NUM_HASHES})) AS j) js
       |  GROUP BY doc_id, j)""".stripMargin

  /** MinHash+LSH near-dup pairs: banded signatures (8 bands × 4 rows)
    * generate candidates; estimated Jaccard = matching-minhash fraction
    * computed by comparing the two signature ARRAYS elementwise
    * (zip_with) — no per-hash re-join; emit pairs with estimate ≥ 0.7. */
  def dd_minhash_lsh(s: SparkSession, dir: String): DataFrame =
    minhashPairs(s, Tables.documents(s, dir))

  /** MinHash+LSH near-dup pairs of an arbitrary (doc_id, text) frame —
    * the banded candidate generation + signature-array verify of
    * [[dd_minhash_lsh]], reusable over the full-rule curation
    * pipeline's pool-restricted kept_text. */
  private[operators] def minhashPairs(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val sigArr = minhashesOf(s, shinglesOf(s, docs))
      .groupBy($"doc_id")
      .agg(transform(array_sort(collect_list(struct($"j", $"mh"))),
        x => x.getField("mh")).as("sig"))
      .cache() // two consumers; evictable storage pin, see ngramJaccardPairs
    val bands = sigArr.select($"doc_id",
        explode(sequence(lit(0), lit(NUM_HASHES / BAND_ROWS - 1))).as("band"), $"sig")
      .withColumn("bsig", array_join(transform(
        slice($"sig", $"band" * BAND_ROWS + 1, lit(BAND_ROWS)), _.cast("string")), "-"))
    val cand = bands.select($"doc_id".as("da"), $"band", $"bsig")
      .join(bands.select($"doc_id".as("db"), $"band", $"bsig"), Seq("band", "bsig"))
      .filter($"da" < $"db")
      .select($"da", $"db").distinct()
    cand
      .join(sigArr.select($"doc_id".as("da"), $"sig".as("sa")), "da")
      .join(sigArr.select($"doc_id".as("db"), $"sig".as("sb")), "db")
      .withColumn("est_jaccard",
        aggregate(zip_with($"sa", $"sb", (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / NUM_HASHES.toDouble)
      .filter($"est_jaccard" >= 0.7)
      .select($"da", $"db", $"est_jaccard")
      .orderBy($"da", $"db")
  }

  val ddMinhashSql: String =
    s"""WITH $shinglesSqlCte,
       |$minhashSqlCte,
       |bands AS (
       |  SELECT doc_id, j // ${BAND_ROWS} AS band,
       |    string_agg(CAST(mh AS VARCHAR), '-' ORDER BY j) AS sig
       |  FROM mh GROUP BY doc_id, j // ${BAND_ROWS}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
       |SELECT da, db,
       |  CAST(sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS DOUBLE) / ${NUM_HASHES}.0 AS est_jaccard
       |FROM cand JOIN mh x ON x.doc_id = da JOIN mh y ON y.doc_id = db AND y.j = x.j
       |GROUP BY da, db
       |HAVING CAST(sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS DOUBLE) / ${NUM_HASHES}.0 >= 0.7
       |ORDER BY da, db""".stripMargin

  // ------------------------------------------------------------- simhash
  /** 60-bit SimHash over the distinct-token set: bit i of the signature
    * is the sign of Σ_tokens (±1 by bit i of H(token)). One row per doc.
    * Near-dup docs (sharing most tokens) land within small Hamming
    * distance; pairing is done by dd_simhash_pairs. */
  def dd_simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // ONE wide aggregation: 60 bit-sum expressions over the token rows
    // (map-side combinable) instead of a 60× bit explosion; the signature
    // folds from the 60 sums in a single projection.
    val bitSums = (0 until 60).map { i =>
      sum(when(expr(s"shiftright(h, $i) & 1") === 1, 1).otherwise(-1)).as(s"c$i")
    }
    val sig = (0 until 60).map { i =>
      when(col(s"c$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    Tables.documents(s, dir)
      .select($"doc_id", explode(array_distinct(toks($"text"))).as("tok"))
      .withColumn("h", h60(s, $"tok"))
      .groupBy($"doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select($"doc_id", sig.cast("long").as("simhash"))
      .orderBy($"doc_id")
  }

  val ddSimhashSql: String = {
    val h = h60Sql.format("tok")
    s"""WITH tk AS (SELECT doc_id,
       |    unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+'))) AS tok
       |  FROM documents),
       |th AS (SELECT doc_id, $h AS h FROM tk),
       |bits AS (
       |  SELECT doc_id, i,
       |    sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS c
       |  FROM th, (SELECT unnest(range(0, 60)) AS i) js
       |  GROUP BY doc_id, i)
       |SELECT doc_id,
       |  CAST(sum(CASE WHEN c > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
       |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** SimHash near-dup pairs at Hamming distance ≤ 3 — the published
    * simhash-dedup operating point (Manku, Jain & Sarma, WWW'07 §3 use
    * k = 3 on 64-bit fingerprints). 4 disjoint 15-bit bands generate
    * candidates, COMPLETE for the emitted range (≤ 3 differing bits
    * leave ≥ 1 of 4 bands intact — the pigeonhole guarantee Manku's
    * block-permutation tables generalize); exact popcount verifies.
    * The emit threshold MATCHES what the banding guarantees: an earlier
    * spelling emitted ≤ 6 over the same bands, silently missing true
    * pairs at 4–6 that differed in every band. */
  def dd_simhash_pairs(s: SparkSession, dir: String): DataFrame =
    simhashPairsUnordered(s, dir).orderBy(col("da"), col("db"))

  /** Pair generation without the gate's presentation sort — consumers
    * that aggregate the pairs (connected components) skip a full sort
    * of the pair relation. */
  private[operators] def simhashPairsUnordered(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = dd_simhash(s, dir).cache() // evictable pin, see ngramJaccardPairs
    val bands = sh.select($"doc_id", $"simhash",
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bsig", expr("shiftright(simhash, cast(band * 15 as int)) & 32767"))
    val cand = bands.select($"doc_id".as("da"), $"simhash".as("ha"), $"band", $"bsig")
      .join(bands.select($"doc_id".as("db"), $"simhash".as("hb"), $"band", $"bsig"),
        Seq("band", "bsig"))
      .filter($"da" < $"db")
      .select($"da", $"db", $"ha", $"hb").distinct()
    cand
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter($"hamming" <= 3)
      .select($"da", $"db", $"hamming")
  }

  /** Shared CTE prefix ending in `spairs(da, db, hamming)` — the single
    * SQL definition of the simhash near-dup pair set, used by the
    * dd_simhash_pairs oracle AND the connected-components oracles so the
    * pair semantics can never silently diverge between gates. */
  private[operators] val simhashPairsSqlCte: String = {
    val h = h60Sql.format("tok")
    s"""tk AS (SELECT doc_id,
       |    unnest(list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+'))) AS tok
       |  FROM documents),
       |th AS (SELECT doc_id, $h AS h FROM tk),
       |bits AS (
       |  SELECT doc_id, i,
       |    sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS c
       |  FROM th, (SELECT unnest(range(0, 60)) AS i) js
       |  GROUP BY doc_id, i),
       |sig AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN c > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, simhash, band, (simhash >> (band * 15)) & 32767 AS bsig
       |  FROM sig, (SELECT unnest(range(0, 4)) AS band) bs),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
       |    a.simhash AS ha, b.simhash AS hb
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
       |spairs AS (
       |  SELECT da, db, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
       |  FROM cand WHERE bit_count(xor(ha, hb)) <= 3)""".stripMargin
  }

  val ddSimhashPairsSql: String =
    s"""WITH $simhashPairsSqlCte
       |SELECT da, db, hamming FROM spairs ORDER BY da, db""".stripMargin

  /** Default document-frequency cap for ngramJaccardPairs. The Jaccard
    * denominators still use the full shingle-set sizes, so capped scores
    * are a lower bound of the exact ones. */
  private val DF_CAP = 50

  /** Df-capped operator default at threshold 0.7. */
  def dd_ngram_jaccard_capped(s: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(s, dir, 0.7)

  val ddNgramCappedSql: String =
    s"""WITH $shinglesSqlCte,
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |rare AS (SELECT hs FROM sh GROUP BY hs HAVING count(*) <= ${DF_CAP}),
       |shr AS (SELECT sh.doc_id, sh.hs FROM sh JOIN rare ON sh.hs = rare.hs),
       |inter AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
       |  FROM shr a JOIN shr b ON a.hs = b.hs AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT da, db, i AS n_common,
       |  CAST(i AS DOUBLE) / (x.n + y.n - i) AS jaccard
       |FROM inter JOIN sz x ON da = x.doc_id JOIN sz y ON db = y.doc_id
       |WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.7
       |ORDER BY da, db""".stripMargin

  // --------------------------------------------- bloom-prefiltered overlap
  /** Per-document overlap with a reference set (here: docs 0–19 stand in
    * for an eval benchmark), accelerated by a Bloom prefilter — the
    * 100 TB decontamination shape: the benchmark's shingle set is
    * compressed to a Bloom filter built driver-side and shipped in a
    * broadcast (MBs for 10⁸ shingles at 1% fpp, vs GBs for the exact
    * set), so ~99% of corpus shingles are dropped IN THE MAP STAGE
    * before any shuffle. Survivors are confirmed by an exact broadcast
    * semi-join against the true set, so the OUTPUT is exact regardless
    * of the filter's false-positive rate — the Bloom stage is purely a
    * shuffle-volume optimization, which is why a plain-join oracle can
    * gate it. */
  def dd_bloom_membership(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val sh = shingles(s, dir)
    val bench = sh.filter($"doc_id" < 20).select($"hs").distinct().cache()
    // size the filter from the ACTUAL benchmark cardinality (a fixed
    // expectedNumItems silently degrades fpp — and the prefilter's
    // pruning power — once the benchmark outgrows it); the count rides
    // the same cached frame the filter build scans
    val nBench = math.max(bench.count(), 1L)
    // Spark's native runtime-filter Bloom pair: the agg builds the
    // serialized filter distributed (map-combinable), and the filter
    // bytes enter the corpus scan as a foldable literal tested by the
    // codegen'd might_contain — same mechanics as Catalyst's own
    // injected row-level runtime filters, replacing the boxed per-row
    // UDF this stage used to pay on every corpus shingle
    val bfBytes = bench
      .agg(call_function("graft_bloom_agg", $"hs", lit(nBench)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    // the cache exists to share one bench scan between the count and the
    // filter build; release it here — the left-semi join below rebuilds
    // the (tiny, post-prefilter) build side rather than pinning a
    // session-lifetime cache
    bench.unpersist()
    sh.filter($"doc_id" >= 20)
      .filter(call_function("graft_might_contain", lit(bfBytes), $"hs"))
      .join(broadcast(bench), Seq("hs"), "left_semi")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_bench_shingles"))
      .orderBy($"doc_id")
  }

  val ddBloomMembershipSql: String =
    s"""WITH $shinglesSqlCte,
       |bench AS (SELECT DISTINCT hs FROM sh WHERE doc_id < 20)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bench_shingles
       |FROM sh JOIN bench USING (hs)
       |WHERE doc_id >= 20
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- span (line) dedup
  /** Duplicated-span removal — the C4/RefinedWeb "remove repeated
    * lines/substrings" pass at BLOCK granularity (the synthetic corpus
    * has no newlines, so the dedup unit is a fixed n-token block; on a
    * corpus with lines the same operator runs with lines as blocks):
    * every document splits into consecutive `n`-token blocks, block
    * CONTENT is df-counted across the whole corpus, and any block
    * occurring in more than `maxDf` places is dropped from every
    * document that carries it. Emits per-doc stats plus the cleaned
    * text reassembled from surviving blocks in order.
    *
    * 100 TB shape: blocks are O(corpus tokens / n) rows keyed by a
    * 60-bit content hash (8-byte shuffle keys like [[shingles]]); the
    * df count is a map-side-combinable groupBy, and the count joins
    * back on the same key — AQE's skew-join splits a hot boilerplate
    * block's partition instead of melting one task. Per-doc reassembly
    * regroups on doc_id: every stage is a bounded equi-shuffle, no
    * pair space anywhere (contrast dd_ngram_jaccard, which compares
    * documents; this op only counts content). */
  def spanDedup(s: SparkSession, docs: DataFrame, n: Int = 8,
      maxDf: Long = 1L): DataFrame = {
    import s.implicits._
    val tk = docs.select($"doc_id", toks($"text").as("t"))
      .filter(size($"t") >= 1)
    val bl = tk.select($"doc_id", posexplode(
        transform(sequence(lit(0), floor((size($"t") - 1) / lit(n)).cast("int")),
          i => slice($"t", i * n + 1, lit(n)))).as(Seq("bi", "block")))
      // chr(1)-joined key: without a separator ("ab","c") and ("a","bc")
      // would collide; the oracle keys the same chr(1)-joined string
      .withColumn("key", h60(s, concat_ws("\u0001", $"block")))
    val df = bl.groupBy($"key").agg(count(lit(1)).as("df"))
    bl.join(df, "key")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when($"df" > maxDf, 1L).otherwise(0L)).as("removed_blocks"),
        concat_ws(" ", flatten(transform(
          array_sort(collect_list(when($"df" <= maxDf, struct($"bi", $"block")))),
          kb => kb("block")))).as("clean_text"))
      .orderBy($"doc_id")
  }

  def dd_span_dedup(s: SparkSession, dir: String): DataFrame =
    spanDedup(s, Tables.documents(s, dir))

  /** Exact-substring dedup, OFFSET-ROBUST (the RefinedWeb/C4 variant
    * [[spanDedup]]'s block alignment can miss): every stride-1 n-token
    * shingle is df-counted across the corpus (occurrence count, so a
    * self-repeating doc marks its own repeats too), and every TOKEN
    * covered by any shingle with df > maxDf is removed. A duplicated
    * passage is caught at ANY offset — the suffix-array semantics of
    * published exact-substring dedup, expressed as bounded equi-joins:
    * shingle rows are O(corpus tokens), the df count is map-side
    * combinable, dup starts regroup per doc, and the token marking is
    * LINEAR per row: the sorted dup starts merge into disjoint
    * [st, st+n−1] intervals (one fold — VERDICT r13 item 3; the old
    * per-token `exists` over raw starts degraded to O(tokens²) on a
    * pathologically self-repetitive doc), and the kept text is the gap
    * slices between intervals, O(tokens + intervals) — no pair space,
    * no driver state. Docs shorter than n tokens carry no shingles and
    * pass through untouched. */
  def exactSubstringDedup(s: SparkSession, docs: DataFrame, n: Int = 10,
      maxDf: Long = 1L): DataFrame = {
    import s.implicits._
    val tk = docs.select($"doc_id", toks($"text").as("t"))
      .filter($"t".isNotNull) // null text → null token array, not a row
    val sh = tk.filter(size($"t") >= n)
      .select($"doc_id", posexplode(
        transform(sequence(lit(1), size($"t") - (n - 1)),
          i => h60(s, concat_ws("\u0001", slice($"t", i, lit(n))))))
        .as(Seq("p0", "key")))
      .select($"doc_id", ($"p0" + 1).as("pos"), $"key") // 1-based starts
    val df = sh.groupBy($"key").agg(count(lit(1)).as("df"))
    val dupStarts = sh.join(df.filter($"df" > maxDf), "key")
      .groupBy($"doc_id").agg(sort_array(collect_list($"pos")).as("starts"))
    val ivT = "array<struct<lo:int,hi:int>>"
    tk.join(dupStarts, Seq("doc_id"), "left")
      .withColumn("st", coalesce($"starts", array().cast("array<int>")))
      // merge the sorted starts into disjoint covered intervals: starts
      // ascend and every interval is n long, so one fold suffices — a
      // start overlapping/adjacent to the last interval extends it
      .withColumn("iv", aggregate($"st", array().cast(ivT), (acc, st) => {
        val last = element_at(acc, -1)
        val hi = (st + (n - 1)).cast("int")
        when(size(acc) === 0 || last("hi") < st - 1,
            concat(acc, array(struct(st.cast("int").as("lo"), hi.as("hi")))))
          .otherwise(concat(slice(acc, lit(1), size(acc) - 1),
            array(struct(last("lo").as("lo"),
              greatest(last("hi"), hi).as("hi")))))
      }))
      // kept text = the gap slices between covered intervals — a single
      // linear sweep (zero-length gaps slice to empty arrays)
      .withColumn("kept", flatten(zip_with(
        concat(array(lit(1)), transform($"iv", x => x("hi") + 1)),
        concat(transform($"iv", x => x("lo") - 1), array(size($"t"))),
        (a, b) => slice($"t", a, greatest(b - a + 1, lit(0))))))
      .select($"doc_id",
        size($"t").cast("long").as("n_tokens"),
        (size($"t") - size($"kept")).cast("long").as("removed_tokens"),
        concat_ws(" ", $"kept").as("clean_text"))
      .orderBy($"doc_id")
  }

  def dd_exact_substring(s: SparkSession, dir: String): DataFrame =
    exactSubstringDedup(s, Tables.documents(s, dir))

  val ddExactSubstringSql: String = {
    val n = 10
    val h = h60Sql.format(s"array_to_string(t[i:i+$n-1], chr(1))")
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> len(x) > 0) AS t
       |  FROM documents
       |  WHERE text IS NOT NULL),
       |sh AS (
       |  SELECT doc_id, i AS pos, $h AS key
       |  FROM tok, unnest(range(1, len(t) - $n + 2)) AS u(i)
       |  WHERE len(t) >= $n),
       |cnt AS (SELECT key, count(*) AS df FROM sh GROUP BY key),
       |dup AS (
       |  SELECT s.doc_id, list_sort(list(s.pos)) AS starts
       |  FROM sh s JOIN cnt c USING (key) WHERE c.df > 1 GROUP BY s.doc_id),
       |mark AS (
       |  SELECT k.doc_id, k.t, coalesce(d.starts, []) AS st
       |  FROM tok k LEFT JOIN dup d USING (doc_id)),
       |res AS (
       |  SELECT doc_id, t,
       |    list_filter(list_transform(t, (x, j) ->
       |      CASE WHEN len(list_filter(st, s -> s <= j AND j <= s + $n - 1)) = 0
       |           THEN x ELSE NULL END), y -> y IS NOT NULL) AS kept
       |  FROM mark)
       |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
       |  CAST(len(t) - len(kept) AS BIGINT) AS removed_tokens,
       |  coalesce(array_to_string(kept, ' '), '') AS clean_text
       |FROM res ORDER BY doc_id""".stripMargin
  }

  val ddSpanDedupSql: String = {
    val h = h60Sql.format("array_to_string(b, chr(1))")
    """WITH tok AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> len(x) > 0) AS t
      |  FROM documents WHERE len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> len(x) > 0)) >= 1),
      |bl AS (
      |  SELECT doc_id, i AS bi, t[(i*8 + 1):least((i+1)*8, len(t))] AS b
      |  FROM tok, unnest(range(0, (len(t) - 1) // 8 + 1)) AS u(i)),
      |keyed AS (SELECT doc_id, bi, b, HKEY AS key FROM bl),
      |cnt AS (SELECT key, count(*) AS df FROM keyed GROUP BY key)
      |SELECT k.doc_id,
      |  count(*) AS n_blocks,
      |  CAST(sum(CASE WHEN c.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS removed_blocks,
      |  coalesce(string_agg(CASE WHEN c.df <= 1 THEN array_to_string(k.b, ' ') END, ' ' ORDER BY k.bi), '') AS clean_text
      |FROM keyed k JOIN cnt c USING (key)
      |GROUP BY k.doc_id ORDER BY k.doc_id""".stripMargin.replace("HKEY", h)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact"         -> dd_exact _,
    "dd_span_dedup"    -> dd_span_dedup _,
    "dd_exact_substring" -> dd_exact_substring _,
    "dd_ngram_jaccard" -> dd_ngram_jaccard _,
    "dd_ngram_jaccard_capped" -> dd_ngram_jaccard_capped _,
    "dd_minhash_lsh"   -> dd_minhash_lsh _,
    "dd_simhash"       -> dd_simhash _,
    "dd_simhash_pairs" -> dd_simhash_pairs _,
    "dd_bloom_membership" -> dd_bloom_membership _
  )

  val oracles: Map[String, String] = Map(
    "dd_exact"         -> ddExactSql,
    "dd_span_dedup"    -> ddSpanDedupSql,
    "dd_exact_substring" -> ddExactSubstringSql,
    "dd_ngram_jaccard" -> ddNgramSql,
    "dd_ngram_jaccard_capped" -> ddNgramCappedSql,
    "dd_minhash_lsh"   -> ddMinhashSql,
    "dd_simhash"       -> ddSimhashSql,
    "dd_simhash_pairs" -> ddSimhashPairsSql,
    "dd_bloom_membership" -> ddBloomMembershipSql
  )
}
