package graft.streaming

import graft.SparkSuite
import graft.core.GunValue
import graft.streaming.HamStream.Update

/** The LSM-style delta store ([[HamStream.appendIntoStore]]): per-batch
  * I/O is O(batch) — each micro-batch lands as immutable delta files in
  * the bucket dirs it touches — and every read collapses to the HAM
  * winner, so correctness holds at any compaction lag. Point reads stay
  * bucket-pruned; [[HamStream.compactStore]] folds the deltas back to one
  * row per key; at-least-once replay (duplicate appends) is idempotent.
  */
class DeltaStoreSpec extends SparkSuite {
  import spark.implicits._

  private val NumBuckets = 8

  private def newDir() =
    java.nio.file.Files.createTempDirectory("delta_store").toString + "/cells"

  test("appended batches resolve to the HAM winner on every read path") {
    val dir = newDir()
    HamStream.appendBatchIntoStore(
      Seq(Update("s1", "f", GunValue.string("old"), 1000),
        Update("s2", "f", GunValue.string("keep"), 500)).toDS(),
      0L, dir, NumBuckets)
    HamStream.appendBatchIntoStore(
      Seq(Update("s1", "f", GunValue.string("new"), 2000)).toDS(),
      1L, dir, NumBuckets)

    // raw store carries both generations of s1/f (append-only)...
    assert(spark.read.parquet(dir)
      .filter($"soul" === "s1" && $"field" === "f").count() == 2)
    // ...as ONE delta file per touched bucket per batch (the repartition
    // bound on file-count growth between compactions)
    new java.io.File(dir).listFiles().filter(_.getName.startsWith("bucket="))
      .foreach { b =>
        val perBatch = b.listFiles().filter(_.getName.endsWith(".parquet"))
          .groupBy(_.getName.split("-")(1))
        perBatch.foreach { case (batch, files) =>
          assert(files.length == 1, s"${b.getName} batch $batch: ${files.length} files")
        }
      }
    // ...but the point read returns the winner
    val r = HamStream.fetchFromStore(spark, dir, "s1", "f", NumBuckets)
    assert(r.value.contains(GunValue.string("new")) && r.state.contains(2000.0))
    // and the bulk merged view is one row per key
    val merged = HamStream.readStore(spark, dir)
      .collect().map(x => (x.getString(0), x.getString(1))).toSeq
    assert(merged.map(t => t._1).sorted == Seq("s1", "s2"))
  }

  test("replayed append (at-least-once) is idempotent") {
    val dir = newDir()
    val batch = Seq(Update("s1", "f", GunValue.string("v"), 1000)).toDS()
    HamStream.appendBatchIntoStore(batch, 0L, dir, NumBuckets)
    HamStream.appendBatchIntoStore(batch, 0L, dir, NumBuckets) // WAL replay
    val r = HamStream.fetchFromStore(spark, dir, "s1", "f", NumBuckets)
    assert(r.value.contains(GunValue.string("v")))
    assert(HamStream.readStore(spark, dir).count() == 1)
  }

  test("compaction folds deltas to one row per key, merge-then-TTL") {
    val dir = newDir()
    HamStream.appendBatchIntoStore(
      Seq(Update("s1", "f", GunValue.string("loser"), 1000),
        Update("fresh", "f", GunValue.string("live"), 9000)).toDS(),
      0L, dir, NumBuckets)
    HamStream.appendBatchIntoStore(
      // winner for s1/f, but EXPIRED relative to the compaction cutoff:
      // merge-then-TTL must drop the cell, not resurrect the in-window loser
      Seq(Update("s1", "f", GunValue.string("winner-expired"), 2000)).toDS(),
      1L, dir, NumBuckets)
    HamStream.compactStore(spark, dir, nowMs = 10000, ttlMs = 5000)
    val rows = spark.read.parquet(dir)
      .select("soul", "value.str").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("fresh", "live")))
    // compacted store is one physical row per surviving key
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("delta point read still prunes to one bucket partition") {
    val dir = newDir()
    HamStream.appendBatchIntoStore(
      (1 to 200).map(i =>
        Update(s"soul$i", "f", GunValue.number(i.toLong), 1000)).toDS(),
      0L, dir, NumBuckets)
    val df = HamStream.pointReadDf(spark, dir, "soul7", "f", NumBuckets)
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getString(0) == "number")
    val scans = graft.PlanScans.fileScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected a parquet scan in the point-read plan")
    val partitionsRead = scans.map(s =>
      s.metrics.get("numPartitions").map(_.value).getOrElse(-1L))
    assert(partitionsRead == Seq(1L),
      s"delta point read must prune to ONE bucket dir, read $partitionsRead")
  }
}
