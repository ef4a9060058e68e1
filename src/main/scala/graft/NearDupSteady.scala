package graft

import org.apache.spark.sql.SparkSession

/** Scratch steady-state run for the streaming near-dup probe (round-8;
  * numbers go to SCALE_r8 §6b, file removed after): 90 batches with
  * compactThreshold=4 so per-bucket file counts reach the compaction
  * bound well before the last third — the regime where pruned-probe
  * latency must be FLAT.
  */
object NearDupSteady {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = StreamBench.runNearDup(spark, batches = 90, docsPerBatch = 10,
      numBuckets = 256, probeAll = false, compactThreshold = 4)
    println(s"[nd-steady] batches=${s.batches} docs=${s.docs} matches=${s.matches} " +
      s"p50_first=${s.firstThirdMsP50} p50_last=${s.lastThirdMsP50} " +
      s"rows_first=${s.rowsScannedFirst} rows_last=${s.rowsScannedLast}")
    spark.stop()
  }
}
