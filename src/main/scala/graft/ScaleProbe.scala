package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-knob probe for the LSH near-dup sketch: times
  * `Similarity.nearDupPairsLsh` at a given (tables, bits) over the
  * embeddings table in SPARK_GRAFT_SF_DIR, and reports the sketch's
  * measured per-bucket occupancy and candidate volume.
  *
  * Why it exists: the banded candidate space is Σ_buckets b² ≈
  * n²·tables/2^bits — QUADRATIC in corpus size for a fixed bit width. The
  * sf1 headroom run (SCALE_r4.md) measured exactly that: 10× the vectors
  * took 72× the time at the sf0.1-sized default (16×8). The scale
  * response is not more executors, it's more bits: holding
  * n/2^bits constant keeps per-bucket occupancy — and therefore
  * candidate-join work per row — flat. Round 5 encodes that rule as
  * `Similarity.autoLshBits` (the operator default); this main is the
  * runnable evidence (usage:
  * runMain graft.ScaleProbe [threshold] [tables] [bits] — bits 0 = the
  * auto default; compare occ_avg across SF dirs to see it held flat).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val threshold = args.headOption.map(_.toDouble).getOrElse(0.3)
    val tables = args.lift(1).map(_.toInt).getOrElse(16)
    val bits = args.lift(2).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val effBits =
      if (bits > 0) bits else graft.operators.Similarity.autoLshBits(n)
    // sketch shape at this config: mean bucket occupancy (the quantity the
    // auto rule holds flat) and the exact candidate volume Σ C(b,2)
    val sizes = graft.operators.Similarity
      .lshTablesFast(emb, tables, effBits)
      .groupBy("t", "tbucket").agg(count(lit(1)).as("b"))
    // guard the empty-table case (global agg over zero rows yields null
    // avg/sum); report BOTH occupancy readings — occ_avg averages only
    // occupied buckets (skew signal), occ_load is n·tables/2^bits over
    // the full bucket space (the exact quantity autoLshBits holds flat)
    val shape = sizes.agg(
      avg(col("b")).as("occ_avg"),
      (sum(col("b") * (col("b") - 1)) / 2).as("cand")).first()
    val occ = if (shape.isNullAt(0)) 0.0 else shape.getDouble(0)
    val cand = if (shape.isNullAt(1)) 0.0 else shape.getDouble(1)
    val load = n.toDouble / (1L << effBits)
    val t0 = System.nanoTime()
    val pairs = graft.operators.Similarity
      .nearDupPairsLsh(emb, threshold, tables, effBits).count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(s"""{"probe":"neardup_lsh","sf":"$sfDir","n":$n,"tables":$tables,"bits":$effBits,"auto":${bits <= 0},"occ_avg":$occ,"occ_load":$load,"cand":$cand,"pairs":$pairs,"sec":$dt}""")
    spark.stop()
  }
}
