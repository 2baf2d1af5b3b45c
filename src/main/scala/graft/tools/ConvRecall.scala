package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.TextMetrics

/** Measure the conversation eval's quality-vs-nprobe curve (the
  * measurement ADVICE r19 asked for as the alternative to scaling
  * nprobe): same triple construction, head, and index as the
  * `ft_conversation_*` gates, then one serve per requested nprobe off
  * the SAME prepared index, reporting mean token-F1, exact-match rate,
  * and serve seconds. The r20 decade re-measure showed why this curve
  * must be measured rather than assumed: auto-√numCells probes held F1
  * but quadrupled the 10× eval cost and DIED at 100× on the 8 GB
  * broadcast cap, while the k-means cells localize these template-
  * vocabulary queries so well that the floor-4 probe already recovers
  * the full-probe F1 (the standard IVF picture — FAISS-style fixed
  * small nprobe — not the adversarial nprobe/numCells decay bound).
  *
  * Usage: ConvRecall <sfDir> [nprobe,nprobe,...] — one JSON line. */
object ConvRecall {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val probes = (if (args.length > 1) args(1) else "2,4,0")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .appName("graft-conv-recall").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    s.sparkContext.setLogLevel("ERROR")

    val toks = filter(split(trim(lower($"text")), "\\s+"), x => length(x) > 0)
    val d = Tables.documents(s, dir).select($"doc_id", $"text",
      concat_ws(" ", slice(toks, 1, 3)).as("system"),
      concat_ws(" ", slice(toks, 4, 5)).as("user"),
      concat_ws(" ", slice(toks, 9, 10)).as("assistant"))
      .localCheckpoint()

    val cat = new graft.ml.Catalog(s,
      java.nio.file.Files.createTempDirectory("convrecall").toString)
    graft.llm.Finetune.finetune(s, cat, graft.llm.Finetune.FinetuneConfig(
      projectName = "RecallConv", task = "conversation",
      data = Some(d.select($"system", $"user", $"assistant")),
      textCol = "system", text2Col = "user", labelCol = "assistant",
      dim = 64, hyperparams = Map("max_iter" -> "10")))
    val handle = graft.llm.Finetune.prepareConvIndex(s, cat, "RecallConv",
      d.select($"assistant".as("response")))

    val per = probes.map { np =>
      val t0 = System.nanoTime()
      val resp = graft.llm.Finetune.respondTextAnnIndexed(s, cat,
        "RecallConv", d.select($"system", $"user"), "system", "user",
        handle, nprobe = np)
      val r = d.join(resp, Seq("system", "user"))
        .select(TextMetrics.tokens($"response").as("tp"),
          TextMetrics.tokens($"assistant").as("tg"))
        .select(size($"tp").as("np"), size($"tg").as("ng"),
          TextMetrics.clippedOverlap($"tp", $"tg").as("nc"),
          when($"tp" === $"tg", 1.0).otherwise(0.0).as("em"))
        .agg(avg(when($"np" + $"ng" > 0,
            lit(2.0) * $"nc" / ($"np" + $"ng")).otherwise(0.0)).as("f1"),
          avg($"em").as("em"), count(lit(1)).as("n")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      val label = if (np <= 0) s"auto(${graft.llm.Finetune.autoNprobe(handle.quant.numCells)})"
        else np.toString
      s""""$label":{"f1":${r.getDouble(0)},"em":${r.getDouble(1)},""" +
        s""""n":${r.getLong(2)},"sec":$sec}"""
    }
    println(s"""{"dir":"$dir","numCells":${handle.quant.numCells},""" +
      per.mkString(",") + "}")
    s.stop()
  }
}
