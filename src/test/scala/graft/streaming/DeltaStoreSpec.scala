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

  test("auto-compaction bounds the per-bucket delta-file count over a long run") {
    val dir = newDir()
    val threshold = 4
    val buckets = 2 // few buckets so every batch touches all of them
    def maxFiles(): Int = {
      val bs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("bucket="))
      if (bs.isEmpty) 0
      else bs.map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
    }
    for (b <- 0 until 30) {
      HamStream.appendBatchIntoStore(
        Seq(Update("s1", "f", GunValue.string(s"v$b"), 1000.0 + b),
          Update("s2", "g", GunValue.string(s"w$b"), 1000.0 + b)).toDS(),
        b.toLong, dir, buckets, compactThreshold = threshold)
      // invariant at EVERY batch, not just the end: the trigger fires the
      // moment a bucket crosses the threshold, folding it back to 1 file
      assert(maxFiles() <= threshold,
        s"batch $b: a bucket holds ${maxFiles()} delta files (> $threshold)")
    }
    // folded store still reads to the latest HAM winner
    val r = HamStream.fetchFromStore(spark, dir, "s1", "f", buckets)
    assert(r.value.contains(GunValue.string("v29")) && r.state.contains(1029.0))
    assert(HamStream.readStore(spark, dir).count() == 2)
    // fold-only: ancient states (epoch ~1970) survive the auto trigger —
    // TTL expiry belongs to the caller's compactStore cadence, and a
    // count-based trigger running at wall-clock now must not purge them
    assert(spark.read.parquet(dir).filter($"soul" === "s2").count() >= 1)
  }

  test("disabled trigger (compactThreshold <= 0) appends without folding") {
    val dir = newDir()
    for (b <- 0 until 6)
      HamStream.appendBatchIntoStore(
        Seq(Update("s1", "f", GunValue.string(s"v$b"), 1000.0 + b)).toDS(),
        b.toLong, dir, 1, compactThreshold = 0)
    val files = new java.io.File(dir + "/bucket=0").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 6, s"expected 6 uncompacted deltas, found $files")
    assert(HamStream.readStore(spark, dir).count() == 1)
  }

  test("buffered sink folds N micro-batches into one delta write, flush drains") {
    val dir = newDir()
    val sink = new HamStream.BufferedDeltaSink(dir, NumBuckets,
      compactThreshold = 0, flushEvery = 2, durable = false)
    sink.add(Seq(Update("s1", "f", GunValue.string("a"), 1000)).toDS(), 0L)
    assert(sink.pending == 1) // below flushEvery: nothing written yet
    assert(!new java.io.File(dir).exists())
    sink.add(Seq(Update("s1", "f", GunValue.string("b"), 2000)).toDS(), 1L)
    assert(sink.pending == 0) // second add crossed flushEvery: one write
    // both batches landed in ONE delta generation (file name carries the
    // flush's last batch id)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket="))
      .flatMap(_.listFiles()).map(_.getName).filter(_.endsWith(".parquet"))
    assert(files.nonEmpty && files.forall(_.startsWith("delta-b1-")))
    // remainder flush on demand (the termination-listener path)
    sink.add(Seq(Update("s2", "g", GunValue.string("c"), 3000)).toDS(), 2L)
    assert(sink.pending == 1)
    sink.flush()
    assert(sink.pending == 0)
    val merged = HamStream.readStore(spark, dir)
      .select("soul", "value.str").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(merged == Set(("s1", "b"), ("s2", "c")))
  }

  test("durable buffered sink: crash between add and flush loses nothing") {
    val dir = newDir()
    val sink = new HamStream.BufferedDeltaSink(dir, NumBuckets,
      compactThreshold = 0, flushEvery = 4) // durable default
    sink.add(Seq(Update("s1", "f", GunValue.string("a"), 1000)).toDS(), 0L)
    sink.add(Seq(Update("s2", "g", GunValue.string("b"), 2000)).toDS(), 1L)
    assert(sink.pending == 2)
    // nothing in the store yet — the batches are committed upstream
    // (foreachBatch returned, source WAL pruned) but only journaled here
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("bucket=")))
    // "crash": discard the sink (its in-memory state is gone) WITHOUT a
    // flush — the exact window ADVICE_r7 flagged for the in-memory buffer.
    // The next appendIntoStore start replays the journal:
    assert(HamStream.recoverBufferJournal(spark, dir, NumBuckets, 0) == 2)
    val merged = HamStream.readStore(spark, dir)
      .select("soul", "value.str").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(merged == Set(("s1", "a"), ("s2", "b")))
    // journal drained: a second recovery is a no-op
    assert(HamStream.recoverBufferJournal(spark, dir, NumBuckets, 0) == 0)
  }

  test("durable buffered sink: flush drains the journal; partial journal dirs are discarded") {
    val dir = newDir()
    val sink = new HamStream.BufferedDeltaSink(dir, NumBuckets,
      compactThreshold = 0, flushEvery = 2)
    sink.add(Seq(Update("s1", "f", GunValue.string("a"), 1000)).toDS(), 0L)
    sink.add(Seq(Update("s1", "f", GunValue.string("b"), 2000)).toDS(), 1L)
    assert(sink.pending == 0) // crossed flushEvery: journal folded + deleted
    assert(!new java.io.File(dir, ".buffer-journal").exists() ||
      new java.io.File(dir, ".buffer-journal").listFiles().isEmpty)
    val r = HamStream.fetchFromStore(spark, dir, "s1", "f", NumBuckets)
    assert(r.value.contains(GunValue.string("b")))
    // a journal dir WITHOUT _SUCCESS is a write interrupted before its
    // batch committed — the source will replay that batch, so recovery
    // must drop it rather than double-apply a partial file set
    val partial = new java.io.File(dir, ".buffer-journal/batch-7")
    assert(partial.mkdirs())
    java.nio.file.Files.writeString(
      partial.toPath.resolve("part-garbage.parquet"), "not parquet")
    assert(HamStream.recoverBufferJournal(spark, dir, NumBuckets, 0) == 0)
    assert(!partial.exists())
  }

  test("journal leftovers are healed on the UNBUFFERED append path and by readers") {
    // ADVICE_r8 medium: r8 replayed the journal only when the next run
    // also used bufferBatches > 1 — a crashed durable-buffered run whose
    // store is next opened unbuffered (or only read) kept its committed
    // batches locked in `.buffer-journal` forever.
    val dir = newDir()
    val sink = new HamStream.BufferedDeltaSink(dir, NumBuckets,
      compactThreshold = 0, flushEvery = 4) // durable default
    sink.add(Seq(Update("s1", "f", GunValue.string("a"), 1000)).toDS(), 0L)
    // "crash" (sink discarded, no flush); next run opens UNBUFFERED
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Update]
    val q = HamStream.appendIntoStore(in.toDS(), dir, NumBuckets,
      compactThreshold = 0, bufferBatches = 1)
    try {
      // recovery ran synchronously at appendIntoStore entry
      val journal = new java.io.File(dir, ".buffer-journal")
      assert(!journal.exists() || journal.listFiles().isEmpty,
        "unbuffered open left the journal unrecovered")
    } finally q.stop()
    val r = HamStream.fetchFromStore(spark, dir, "s1", "f", NumBuckets)
    assert(r.value.contains(GunValue.string("a")))
    // a pure READER heals too: journal a batch, crash, then just readStore
    val sink2 = new HamStream.BufferedDeltaSink(dir, NumBuckets,
      compactThreshold = 0, flushEvery = 4)
    sink2.add(Seq(Update("s2", "g", GunValue.string("b"), 2000)).toDS(), 1L)
    val merged = HamStream.readStore(spark, dir, NumBuckets)
      .select("soul", "value.str").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(merged == Set(("s1", "a"), ("s2", "b")),
      s"reader did not surface journaled-only cells: $merged")
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
