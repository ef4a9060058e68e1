package graft.streaming

import graft.SparkSuite
import graft.core.GunCell
import graft.sources.{GunWire, InMemoryPeerConn}

/** End-to-end streaming crash recovery, COMPOSED: the crash window between
  * the gun source's WAL journal write (during batch planning) and
  * `mergeIntoStore`'s bucket swap (during batch execution). The pieces are
  * each spec'd elsewhere (GunSourceSpec: WAL replay; HamStreamSpec:
  * swap-crash windows); this drives the full restart path — a query dies
  * AFTER the source journaled the planned range and BEFORE any store
  * write, restarts from the same checkpoint, replays the range from the
  * journal, and converges to exactly the store a no-crash run produces
  * (at-least-once replay + HAM idempotence = effectively-once).
  */
class CrashRecoverySpec extends SparkSuite {

  test("crash after WAL journal, before store merge: restart converges the store") {
    val spark2 = spark
    import spark2.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("gun_crash_ckpt").toString
    val storeDir = java.nio.file.Files.createTempDirectory("gun_crash_store").toString
    val storePath = s"$storeDir/store"
    val (ours, theirs) = InMemoryPeerConn.pair()
    InMemoryPeerConn.register("crash-src", ours)
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)

    def startQuery(injectCrash: Boolean) = {
      val frames = spark.readStream.format("gun")
        .option("conn", "crash-src").option("pid", "spark-engine").load()
      val cells = GunWire.framesToCells(frames, "frame").as[GunCell]
      HamStream.updates(cells, timers = false).writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[HamStream.Update], batchId: Long) =>
          // The injected death point: batch planning has already run, so
          // the source's gun-wal journal holds this range — but nothing
          // has touched the store yet. This is the window where a real
          // driver kill loses the in-memory frame buffer.
          if (injectCrash && !batch.isEmpty && crashed.compareAndSet(false, true))
            throw new RuntimeException("injected crash: after WAL, before merge")
          HamStream.mergeBatchIntoStore(batch, batchId, storePath, numBuckets = 8)
        }
        .start()
    }

    try {
      theirs.send("""{"#":"c1","put":{"cs":{"_":{"#":"cs",">":{"f":1000}},"f":"v1"}}}""")
      val q1 = startQuery(injectCrash = true)
      // the query must die on the injected crash
      try {
        q1.processAllAvailable()
        // processAllAvailable can return if the failure races it; either
        // way the query must be terminated with our exception
        q1.awaitTermination(15000)
      } catch { case _: Exception => () }
      assert(crashed.get, "crash was never injected (batch did not run)")
      assert(q1.exception.isDefined, "query survived the injected crash")
      q1.stop()

      // the store saw nothing: the crash landed before any bucket write
      val fs = new org.apache.hadoop.fs.Path(storePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(storePath)))

      // restart from the same checkpoint: Spark replans the committed
      // range, the fresh source instance (empty in-memory buffer) serves
      // it from the gun-wal journal, and the merge applies it
      val q2 = startQuery(injectCrash = false)
      try {
        q2.processAllAvailable()
        // progress after recovery: a second write lands through the same
        // restarted query
        theirs.send("""{"#":"c2","put":{"cs2":{"_":{"#":"cs2",">":{"g":2000}},"g":"v2"}}}""")
        val deadline = System.currentTimeMillis() + 15000
        def stored() =
          if (!fs.exists(new org.apache.hadoop.fs.Path(storePath))) Set.empty
          else spark.read.parquet(storePath)
            .select("soul", "field", "value.str", "state")
            .collect()
            .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
            .toSet
        var rows: Set[(String, String, String, Double)] = Set.empty
        while (rows.size < 2 && System.currentTimeMillis() < deadline) {
          Thread.sleep(100)
          q2.processAllAvailable()
          rows = stored().asInstanceOf[Set[(String, String, String, Double)]]
        }
        // exactly the no-crash outcome: both writes present, once each
        assert(rows == Set(
          ("cs", "f", "v1", 1000.0),
          ("cs2", "g", "v2", 2000.0)))
      } finally q2.stop()
    } finally {
      InMemoryPeerConn.unregister("crash-src")
      theirs.close(); ours.close()
    }
  }

  test("crash after WAL journal, before DELTA append: restart converges the store") {
    val spark2 = spark
    import spark2.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("gun_dcrash_ckpt").toString
    val storeDir = java.nio.file.Files.createTempDirectory("gun_dcrash_store").toString
    val storePath = s"$storeDir/store"
    val (ours, theirs) = InMemoryPeerConn.pair()
    InMemoryPeerConn.register("dcrash-src", ours)
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)

    def startQuery(injectCrash: Boolean) = {
      val frames = spark.readStream.format("gun")
        .option("conn", "dcrash-src").option("pid", "spark-engine").load()
      val cells = GunWire.framesToCells(frames, "frame").as[GunCell]
      HamStream.updates(cells, timers = false).writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[HamStream.Update], batchId: Long) =>
          if (injectCrash && !batch.isEmpty && crashed.compareAndSet(false, true))
            throw new RuntimeException("injected crash: after WAL, before append")
          HamStream.appendBatchIntoStore(batch, batchId, storePath, numBuckets = 8)
        }
        .start()
    }

    try {
      theirs.send("""{"#":"d1","put":{"ds":{"_":{"#":"ds",">":{"f":1000}},"f":"v1"}}}""")
      val q1 = startQuery(injectCrash = true)
      try {
        q1.processAllAvailable()
        q1.awaitTermination(15000)
      } catch { case _: Exception => () }
      assert(crashed.get, "crash was never injected (batch did not run)")
      assert(q1.exception.isDefined, "query survived the injected crash")
      q1.stop()

      val fs = new org.apache.hadoop.fs.Path(storePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(storePath)))

      // restart: the journaled range replays through the APPEND path; a
      // second write both proves progress and (replayed or not) only adds
      // HAM-idempotent deltas — the merged view must equal the no-crash run
      val q2 = startQuery(injectCrash = false)
      try {
        q2.processAllAvailable()
        theirs.send("""{"#":"d2","put":{"ds2":{"_":{"#":"ds2",">":{"g":2000}},"g":"v2"}}}""")
        val deadline = System.currentTimeMillis() + 15000
        def merged(): Set[(String, String, String, Double)] =
          if (!fs.exists(new org.apache.hadoop.fs.Path(storePath)))
            Set.empty
          else HamStream.readStore(spark, storePath)
            .select("soul", "field", "value.str", "state")
            .collect()
            .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
            .toSet
        var rows = Set.empty[(String, String, String, Double)]
        while (rows.size < 2 && System.currentTimeMillis() < deadline) {
          Thread.sleep(100)
          q2.processAllAvailable()
          rows = merged()
        }
        assert(rows == Set(
          ("ds", "f", "v1", 1000.0),
          ("ds2", "g", "v2", 2000.0)))
      } finally q2.stop()
    } finally {
      InMemoryPeerConn.unregister("dcrash-src")
      theirs.close(); ours.close()
    }
  }

  test("crash mid-compaction (bucket parked in trash): next append heals and proceeds") {
    val spark2 = spark
    import spark2.implicits._
    import graft.core.GunValue
    import graft.streaming.HamStream.Update
    val storePath =
      java.nio.file.Files.createTempDirectory("gun_ccrash_store").toString + "/store"
    val buckets = 1 // everything in bucket=0: the trash window is the whole store
    HamStream.appendBatchIntoStore(
      Seq(Update("s1", "f", GunValue.string("v1"), 1000)).toDS(),
      0L, storePath, buckets)
    // simulate the swapBucket crash window inside the auto-compaction fold:
    // live renamed to trash (step 1 done), staged never promoted (step 2
    // lost with the staging dir) — the bucket is ABSENT from the live tree
    val fs = new org.apache.hadoop.fs.Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(storePath, "bucket=0"),
      new org.apache.hadoop.fs.Path(storePath, ".trash-bucket=0"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(storePath, "bucket=0")))

    // the next append's recoverStore restores the parked bucket before
    // touching anything, so no write is lost and the new delta lands on top
    HamStream.appendBatchIntoStore(
      Seq(Update("s1", "f", GunValue.string("v2"), 2000)).toDS(),
      1L, storePath, buckets)
    val r = HamStream.fetchFromStore(spark, storePath, "s1", "f", buckets)
    assert(r.value.contains(GunValue.string("v2")) && r.state.contains(2000.0))
    assert(spark.read.parquet(storePath).count() == 2) // both generations present
  }
}
