package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition probe for the curation decade's two heavy
  * stages (minhash+CC and trained-semantic+CC): times each sub-piece
  * alone so the super-linear component can be NAMED instead of
  * guessed. Diagnostic main, not a gate. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s -> $r")
    }
    timed("dd_minhash_lsh.count")(Dedup.dd_minhash_lsh(s, sfDir).count())
    timed("dd_minhash_lsh.count(2nd)")(Dedup.dd_minhash_lsh(s, sfDir).count())
    val mh = Dedup.dd_minhash_lsh(s, sfDir).select($"da", $"db").localCheckpoint()
    timed("mh.cc")(Components.connectedComponents(mh, "da", "db").count())
    val e = Similarity.emb(s, sfDir).localCheckpoint()
    val n = e.count()
    timed("quant.fitSampled") {
      val q = KMeansQuantizer.fitSampled(e,
        KMeansQuantizer.chooseK(n, targetCellRows = 250L), n, maxIter = 10,
        pointsPerCell = 192)
      q.numCells
    }
    timed("semanticPairsTrained.count")(
      Similarity.semanticPairsTrained(s, sfDir, 0.45).count())
    timed("semanticPairsTrained(warm)")(
      Similarity.semanticPairsTrained(s, sfDir, 0.45).count())
    // decompose: fit once, then band expansion / fanout / raw join
    val q = KMeansQuantizer.fitSampled(e,
      KMeansQuantizer.chooseK(n, targetCellRows = 250L), n, maxIter = 10,
      pointsPerCell = 192)
    val cells = e.withColumn("cell", explode(q.probeAdaptiveCol($"v", 0.5)))
      .localCheckpoint()
    timed("band.membership")(cells.count())
    timed("band.fanout")(cells.groupBy($"cell").agg(count(lit(1)).as("n"))
      .agg(coalesce(sum($"n" * $"n"), lit(0L))).head().getLong(0))
    val a = cells.select($"cell", $"vec_id".as("da"), $"v".as("va"))
    val b = cells.select($"cell", $"vec_id".as("db"), $"v".as("vb"))
    timed("rawjoin.countpairs")(
      a.join(b, Seq("cell")).filter($"da" < $"db").count())
    timed("join+dot.count")(
      a.join(b, Seq("cell")).filter($"da" < $"db")
        .filter(call_function("graft_dot", $"va", $"vb") >= lit(0.0)).count())
    s.stop()
  }
}
