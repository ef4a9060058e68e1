package graft

// Temporary stage-timing diagnostic for nearDupPairsLsh (not part of the
// library surface): times sketch / candidates / full pipeline separately.
object ScaleProbe2 {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions._

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val tables = 16
    val bits = 12
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"[probe2] $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }

    time("sketch")(graft.operators.Similarity.lshTablesFast(emb, tables, bits).count())
    time("unitVectors") {
      val u = graft.operators.Similarity.unitVectors(emb)
      val n = u.count(); u.unpersist(true); n
    }
    time("candidates") {
      val tb = graft.operators.Similarity.lshTablesFast(emb, tables, bits)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = tb.select(col("vec_id").as("vec_a"), col("t"), col("tbucket"))
      val b = tb.select(col("vec_id").as("vec_b"), col("t"), col("tbucket"))
      val n = a.join(b, Seq("t", "tbucket"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct().count()
      tb.unpersist(true); n
    }
    time("full")(graft.operators.Similarity.nearDupPairsLsh(emb, 0.8, tables, bits).count())
    spark.stop()
  }
}
