package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic testdata upsampler for scaling-exponent measurement
  * (VERDICT r10 item 5 / r9 item 4): synthesizes sf·K from sf by
  * replicating `documents` and `embeddings` K× under transforms chosen
  * so the CORPUS-LEVEL structure scales the way a real corpus does —
  * duplicate/near-duplicate density stays CONSTANT per replica instead
  * of exploding across replicas:
  *
  *  - documents: every word in replica r>0 gets a `_r<r>` suffix, so a
  *    replica shares zero shingles with any other replica (no spurious
  *    cross-replica near-dup pairs) while the within-replica n-gram /
  *    MinHash / SimHash neighbor structure is byte-for-byte isomorphic
  *    to the source corpus. doc_id is offset by r·10^9.
  *  - embeddings: replica r>0 is mapped through a fixed random ROTATION
  *    (Gram–Schmidt QR of a seeded Gaussian matrix — orthogonal), so
  *    all within-replica distances and cosines are EXACTLY preserved
  *    while cross-replica cosines collapse to O(1/√d) noise — no
  *    spurious neighbor pairs across replicas. vec_id offset likewise.
  *
  * Under this model runtime ratio vs data ratio directly measures each
  * operator's scaling exponent: pair spaces grow linearly (per-replica),
  * which is the 100 TB regime SCALE.md argues (duplicate rate does not
  * rise just because the corpus grows).
  *
  * Usage: runMain graft.tools.GenScale <srcSfDir> <destDir> <K>
  * Writes <destDir>/documents.parquet and <destDir>/embeddings.parquet.
  */
object GenScale {
  /** Deterministic d×d orthogonal matrix per replica (modified
    * Gram–Schmidt over an LCG-seeded Gaussian matrix; replica 0 =
    * identity). */
  private[graft] def rotation(d: Int, replica: Int): Array[Array[Double]] = {
    if (replica == 0) return Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val rng = new java.util.Random(0x5DEECE66DL * (replica + 1) + 42)
    val a = Array.fill(d, d)(rng.nextGaussian())
    var i = 0
    while (i < d) {
      var j = 0
      while (j < i) {
        var dot = 0.0
        var k = 0
        while (k < d) { dot += a(i)(k) * a(j)(k); k += 1 }
        k = 0
        while (k < d) { a(i)(k) -= dot * a(j)(k); k += 1 }
        j += 1
      }
      var nrm = 0.0
      var k = 0
      while (k < d) { nrm += a(i)(k) * a(i)(k); k += 1 }
      nrm = math.sqrt(nrm)
      k = 0
      while (k < d) { a(i)(k) /= nrm; k += 1 }
      i += 1
    }
    a
  }

  private val ID_STRIDE = 1000000000L

  /** Replica stride for a table whose keys reach `maxId`: the fixed
    * 10^9 while keys fit under it, else the next power of ten. A fixed
    * stride COLLIDED under repeated application (r17 find): applying
    * GenScale twice put replica (r1, r2) at id + (r1+r2)·10^9, so all
    * (r1, r2) pairs with equal sum mapped the same base id to the SAME
    * output id — up to 10 duplicate doc_id/vec_id rows per id in the
    * 100× corpus, which quadratically inflated any id-keyed pair or CC
    * structure measured on it. Adaptive stride keeps the first
    * application byte-identical (ids < 10^9) and makes every further
    * decade collision-free. */
  private def strideFor(maxId: Long): Long = {
    var s = ID_STRIDE
    while (s <= maxId) s *= 10
    s
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, destDir, kStr) = args
    val k = kStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // documents: regexp_replace needs a literal replacement string, so
    // each replica is its own no-shuffle scan+map branch, unioned — K is
    // tiny (≤10) and union of maps stays one stage.
    // ONE stride across every table: cross-table key conventions
    // (vec_id == doc_id, o_custkey == c_custkey, lineitem FKs) survive
    // replication only when every id family offsets identically.
    val allMaxima = scala.collection.mutable.ArrayBuffer.empty[Long]
    allMaxima += spark.read.parquet(s"$srcDir/documents.parquet")
      .agg(max($"doc_id")).head.getLong(0)
    allMaxima += spark.read.parquet(s"$srcDir/embeddings.parquet")
      .agg(max($"vec_id")).head.getLong(0)
    if (new java.io.File(s"$srcDir/events.parquet").exists())
      allMaxima += graft.Tables.eventsRaw(spark, srcDir)
        .agg(greatest(max($"user_id"), max($"event_id"))).head.getLong(0)
    val tpchKeys = Map(
      "customer" -> Seq("c_custkey"),
      "orders"   -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "part"     -> Seq("p_partkey"),
      "supplier" -> Seq("s_suppkey"))
    for ((table, keys) <- tpchKeys
         if new java.io.File(s"$srcDir/$table.parquet").exists())
      allMaxima += spark.read.parquet(s"$srcDir/$table.parquet")
        .agg(keys.map(k2 => max(col(k2))).reduce(greatest(_, _)))
        .head.getLong(0)
    val stride = strideFor(allMaxima.max)

    (0 until k).map { r =>
      val base = spark.read.parquet(s"$srcDir/documents.parquet")
        .withColumn("doc_id", $"doc_id" + lit(r.toLong * stride))
      if (r == 0) base
      else base.withColumn("text", regexp_replace($"text", "(\\S+)", s"$$1_r$r"))
    }.reduce(_ unionAll _)
      .write.mode(SaveMode.Overwrite).parquet(s"$destDir/documents.parquet")

    val srcEmb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val d = srcEmb.select(size($"embedding")).as[Int].head()
    val brots = spark.sparkContext.broadcast(
      (0 until k).map(r => rotation(d, r).map(_.map(_.toFloat))).toArray)
    val rotate = udf { (v: Seq[Float], r: Int) =>
      val m = brots.value(r)
      val out = new Array[Float](m.length)
      var i = 0
      while (i < m.length) {
        var s = 0.0f
        val row = m(i)
        var j = 0
        while (j < row.length) { s += row(j) * v(j); j += 1 }
        out(i) = s
        i += 1
      }
      out.toSeq
    }
    val replicas = (0 until k).toDF("replica")
    srcEmb.crossJoin(broadcast(replicas))
      .withColumn("vec_id", $"vec_id" + $"replica" * stride)
      .withColumn("embedding", rotate($"embedding", $"replica"))
      .drop("replica")
      .write.mode(SaveMode.Overwrite).parquet(s"$destDir/embeddings.parquet")

    // events: replica r>0 is a fresh disjoint user population doing the
    // SAME things at the SAME times (user_id/event_id offset, ts
    // unchanged) — the realistic growth axis for an event stream. Every
    // per-user structure (sessions, funnels, as-of chains) is isomorphic
    // across replicas, per-hour buckets get K× rows, and no spurious
    // cross-replica interaction exists, so runtime ratio vs K measures
    // the operators' user-scaling exponent directly. Read through
    // Tables.eventsRaw so both historical ts encodings normalize.
    if (new java.io.File(s"$srcDir/events.parquet").exists()) {
      graft.Tables.eventsRaw(spark, srcDir).crossJoin(broadcast(replicas))
        .withColumn("user_id", $"user_id" + $"replica" * stride)
        .withColumn("event_id", $"event_id" + $"replica" * stride)
        .drop("replica")
        .write.mode(SaveMode.Overwrite).parquet(s"$destDir/events.parquet")
    }

    // TPC-H fact/dim chain: replica r is a disjoint key range — every
    // surrogate key offsets by the same stride, so referential
    // integrity (customer←orders←lineitem, part/supplier←lineitem)
    // holds within each replica and join fan-outs scale linearly.
    // nation/region are fixed vocabularies (like a real deployment) and
    // copy through unchanged.
    for ((table, keys) <- tpchKeys
         if new java.io.File(s"$srcDir/$table.parquet").exists()) {
      val src = spark.read.parquet(s"$srcDir/$table.parquet")
      keys.foldLeft(src.crossJoin(broadcast(replicas))) { (df, k) =>
        df.withColumn(k, col(k) + $"replica" * stride)
      }.drop("replica")
        .write.mode(SaveMode.Overwrite).parquet(s"$destDir/$table.parquet")
    }
    for (table <- Seq("nation", "region")
         if new java.io.File(s"$srcDir/$table.parquet").exists()) {
      spark.read.parquet(s"$srcDir/$table.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$destDir/$table.parquet")
    }

    println(s"GenScale: wrote ${k}x documents+embeddings from $srcDir to $destDir")
    spark.stop()
  }
}
