package graft

import org.apache.spark.sql.SparkSession

/** Scale-knob probe for the LSH near-dup sketch: times
  * `Similarity.nearDupPairsLsh` at a given (tables, bits) over the
  * embeddings table in SPARK_GRAFT_SF_DIR.
  *
  * Why it exists: the banded candidate space is Σ_buckets b² ≈
  * n²·tables/2^bits — QUADRATIC in corpus size for a fixed bit width. The
  * sf1 headroom run (SCALE_r4.md) measured exactly that: 10× the vectors
  * took 72× the time at the sf0.1-sized default (16×8). The scale
  * response is not more executors, it's more bits: holding
  * n/2^bits constant keeps per-bucket occupancy — and therefore
  * candidate-join work per row — flat. This main is the runnable evidence
  * for that knob (usage: runMain graft.ScaleProbe [threshold] [tables] [bits]).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val threshold = args.headOption.map(_.toDouble).getOrElse(0.3)
    val tables = args.lift(1).map(_.toInt).getOrElse(16)
    val bits = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val t0 = System.nanoTime()
    val pairs = graft.operators.Similarity
      .nearDupPairsLsh(emb, threshold, tables, bits).count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(s"""{"probe":"neardup_lsh","sf":"$sfDir","tables":$tables,"bits":$bits,"pairs":$pairs,"sec":$dt}""")
    spark.stop()
  }
}
