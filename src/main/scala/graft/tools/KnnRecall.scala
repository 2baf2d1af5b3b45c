package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.{KMeansQuantizer, Similarity}

/** Measurement harness for the trained kNN-graph recall floor (VERDICT
  * r15 item 1) and the SemDeDup adaptive probe (item 8): prints 3-NN
  * edge recall vs the exact graph plus wall time for each probe config,
  * so the gate's floor and probeRatio are MEASURED numbers, not guesses.
  *
  * Usage: runMain graft.tools.KnnRecall <sfDir> [ratios...]
  */
object KnnRecall {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val tcr = if (args.length > 1) args(1).toLong else 250L
    val ratios = if (args.length > 2) args.drop(2).map(_.toDouble).toSeq
                 else Seq.empty
    val s = SparkSession.builder()
      .appName("graft-knn-recall").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm",
        org.apache.spark.sql.functions.sqrt(
          org.apache.spark.sql.functions.aggregate(
            org.apache.spark.sql.functions.zip_with($"v", $"v", (a, b) => a * b),
            org.apache.spark.sql.functions.lit(0.0), (acc, x) => acc + x)))
      .localCheckpoint()
    val n = e.count()
    val k = KMeansQuantizer.chooseK(n, targetCellRows = tcr)
    var quant = KMeansQuantizer.fitSampled(e, k, n)
    for (i <- 1 to 3) {
      val tf0 = System.nanoTime()
      quant = KMeansQuantizer.fitSampled(e, k, n)
      println(f"n=$n k=$k fit_sec=${(System.nanoTime() - tf0) / 1e9}%.2f")
    }

    def run(label: String, nprobe: Int, ratio: Double): Unit = {
      val t0 = System.nanoTime()
      val g = Similarity.knnGraph(e, quant, topK = 3,
        nprobe = nprobe, probeRatio = ratio).localCheckpoint()
      val edges = g.count()
      val tGraph = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val recall = Similarity.knnEdgeRecall(e, g, topK = 3)
      val tRec = (System.nanoTime() - t1) / 1e9
      println(f"$label%-16s recall=$recall%.4f edges=$edges graph_sec=$tGraph%.2f recall_sec=$tRec%.2f")
    }
    def runSem(label: String, nprobe: Int, ratio: Double): Unit = {
      val t0 = System.nanoTime()
      val (out, recall) =
        Similarity.trainedSemanticDedupWithRecall(s, dir, nprobe, ratio)
      val rows = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"sem:$label%-14s recall=$recall%.4f rows=$rows sec=$sec%.2f")
    }
    if (sys.env.contains("GRAFT_SEM")) {
      runSem("warmup", 1, 0.5)
      runSem("nprobe=1", 1, 0.0)
      runSem("nprobe=2", 2, 0.0)
      ratios.foreach(r => runSem(f"ratio=$r%.2f", 1, r))
    } else {
      run("nprobe=3", 3, 0.0)
      run("nprobe=3b", 3, 0.0)
      ratios.foreach(r => run(f"ratio=$r%.2f", 1, r))
    }
    s.stop()
  }
}
