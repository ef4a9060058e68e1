package graft

/** Long-horizon probe for [[StreamBench.runPipeline]]'s compaction A/B:
  * the 40-batch StreamBench leg shows compaction COSTING more than it
  * saves (the fold work lands in-batch while the uncompacted read-amp
  * hasn't bitten yet); this runs the same drive to an arbitrary horizon
  * to locate the crossover. Args: batches [docsPerBatch].
  */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val batches = if (args.nonEmpty) args(0).toInt else 120
    val docs = if (args.length > 1) args(1).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    Seq(8, 0).foreach { thr =>
      val spark = Bench.newSession(cpus)
      spark.sparkContext.setLogLevel("WARN")
      try {
        val p = StreamBench.runPipeline(spark, batches, docs,
          numBuckets = 64, compactThreshold = thr)
        val quart = p.batchMs.grouped(p.batchMs.length / 4 max 1)
          .map(g => g.sum / g.length).mkString("[", ",", "]")
        println(s"""{"probe":"pipeline","compact_threshold":$thr,""" +
          s""""batches":$batches,"docs_per_batch":$docs,"kept":${p.keptTotal},""" +
          s""""docs_per_sec":${f"${p.docsPerSec}%.1f"},""" +
          s""""batch_ms_quartiles":$quart}""")
      } finally spark.stop()
    }
  }
}
