package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection utility: prints the formatted physical plan for the
  * named queries (default: a representative set) so shuffle counts,
  * PushedFilters, ReadSchema and WholeStageCodegen spans can be reviewed.
  * Run: sbt 'runMain graft.Explain [sfDir] [query...]'
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing", "q3_shipping", "gun_ham_merge", "minhash_lsh_pairs", "emb_knn")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // lazy composition mode: operators skip their eager checkpoint so the
    // printed plan is the real pipeline, not a materialized-result scan
    spark.conf.set(graft.operators.Caching.EagerReleaseKey, "false")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      // operators leave their caches to the caller in lazy mode
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
