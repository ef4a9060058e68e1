package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Deterministic scale probe: runs named declared queries against
  * SPARK_GRAFT_SF_DIR and reports total shuffle write volume
  * (records/bytes) per query. Shuffle volume is a PLAN property —
  * identical across repeats on this noisy VM — so cross-SF ratios of
  * these numbers are the signal SCALE_r* docs use to argue linearity
  * (wall-clock is reported too, but it swings 2×+ run-to-run; see
  * BENCH_STABILITY.md).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf3 sbt "runMain graft.ShuffleProbe q1 q2"
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val recs = new AtomicLong(0L)
    val bytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    args.foreach { name =>
      recs.set(0L); bytes.set(0L)
      val t0 = System.nanoTime()
      // count() on the PHYSICAL plan's row RDD, not Dataset.count():
      // the latter re-optimizes with only the row count demanded, so
      // Catalyst prunes every column the count doesn't need — for a
      // query ending in an aggregation that can elide the expensive
      // exchanges entirely (measured: doc_line_dedup's window exchange
      // vanished and the probe read exactly #docs+1 records). toRdd
      // freezes the plan with the query's full projection, so the probe
      // measures what materializing the RESULT shuffles. (Queries
      // ending in localCheckpoint were immune — the checkpoint already
      // forces full materialization — so their earlier records stand.)
      val rows = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously after the last task ends
      Thread.sleep(1000)
      println(s"""{"probe":"shuffle","query":"$name","sf":"$sfDir","rows":$rows,"shuffle_records":${recs.get},"shuffle_mb":${bytes.get / 1024 / 1024.0},"sec":$dt}""")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
