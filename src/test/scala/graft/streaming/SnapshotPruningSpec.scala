package graft.streaming

import graft.SparkSuite
import graft.core.{GunCell, GunValue}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The snapshot seed of a subscription must stay a POINT READ as the store
  * grows (VERDICT round 5 #3): the old typed-lambda filter
  * (`store.filter(c => c.soul == ...)`) deserialized every store row and
  * defeated both Parquet pushdown and bucket pruning — a full scan per new
  * subscriber at 100× store size. The path-based form routes through
  * [[HamStream.fetchFromStore]]'s partition-pruned scan; this spec executes
  * that PRODUCTION scan and asserts the one-bucket bound from its metrics.
  */
class SnapshotPruningSpec extends SparkSuite {
  import spark.implicits._
  import HamStream.Update

  private val NumBuckets = 16

  test("point-read scan touches exactly one bucket partition") {
    val dir = java.nio.file.Files.createTempDirectory("snap_prune").toString + "/cells"
    // 400 souls spread across all 16 buckets
    HamStream.mergeBatchIntoStore(
      (1 to 400).map(i =>
        Update(s"soul$i", "f", GunValue.number(i.toLong), 1000)).toDS(),
      0L, dir, NumBuckets)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("bucket=")) == NumBuckets)

    val df = HamStream.pointReadDf(spark, dir, "soul7", "f", NumBuckets)
    val rows = df.collect() // execute first: scan metrics fill on run
    assert(rows.length == 1 && rows.head.getString(0) == "number")
    // fileScans descends into AQE query stages — the point read now
    // carries the HAM-collapse aggregation (delta-store support), which
    // puts the scan below a staged shuffle
    val scans = graft.PlanScans.fileScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected a parquet scan in the point-read plan")
    val partitionsRead = scans.map(s =>
      s.metrics.get("numPartitions").map(_.value).getOrElse(-1L))
    assert(partitionsRead == Seq(1L),
      s"point read must prune to ONE bucket dir, read $partitionsRead of $NumBuckets")
  }

  test("path-based subscribeWithSnapshot: pruned seed, then live updates") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("snap_sub_path").toString + "/cells"
    HamStream.mergeBatchIntoStore(
      (1 to 100).map(i =>
        Update(s"soul$i", "f", GunValue.number(i.toLong), 1000)).toDS(),
      0L, dir, NumBuckets)

    val in = MemoryStream[GunCell]
    val sub = HamStream.subscribeWithSnapshot(
      dir, HamStream.updates(in.toDS(), timers = false),
      "soul42", "f", dedupeRetention = "7 hours", numBuckets = NumBuckets)
    val q = sub.writeStream
      .format("memory").queryName("snap_path").outputMode("append").start()
    try {
      q.processAllAvailable()
      def rows() = spark.sql("SELECT value.num, state FROM snap_path ORDER BY state")
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(rows() == Seq(("42", 1000.0))) // snapshot value first
      in.addData(GunCell("soul42", "f", GunValue.number(999L), 2000),
        GunCell("soul1", "f", GunValue.number(-1L), 2000)) // other cell filtered
      q.processAllAvailable()
      assert(rows() == Seq(("42", 1000.0), ("999", 2000.0)))
    } finally q.stop()

    // absent cell: no seed row, subscription still live
    val in2 = MemoryStream[GunCell]
    val sub2 = HamStream.subscribeWithSnapshot(
      dir, HamStream.updates(in2.toDS(), timers = false),
      "soul42", "nope", dedupeRetention = "7 hours", numBuckets = NumBuckets)
    val q2 = sub2.writeStream
      .format("memory").queryName("snap_path_miss").outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.sql("SELECT * FROM snap_path_miss").count() == 0)
    } finally q2.stop()
  }
}
