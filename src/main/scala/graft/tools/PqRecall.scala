package graft.tools

/** Measures the sim_ann_pq / sim_ann_ivfpq recall DISTRIBUTION (mean +
  * min over the 10 standard queries) at a given sf dir — the SCALE.md
  * PQ-recall table's source (VERDICT r17 item 3: the floor must carry
  * measured headroom, not sit exactly on the minimum). */
object PqRecall {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("pq-recall").getOrCreate()
    try {
      for (gate <- Seq("sim_ann_pq", "sim_ann_ivfpq")) {
        val t0 = System.nanoTime()
        val rec = graft.SparkEntry.queries(gate)(s, dir)
          .select("recall").collect().map(_.getDouble(0))
        val sec = (System.nanoTime() - t0) / 1e9
        if (rec.isEmpty) println(f"$gate%-14s EMPTY (floor tripped) ${sec}%.2f s")
        else println(f"$gate%-14s mean=${rec.sum / rec.length}%.3f " +
          f"min=${rec.min}%.3f n=${rec.length} ${sec}%.2f s")
      }
    } finally s.stop()
  }
}
