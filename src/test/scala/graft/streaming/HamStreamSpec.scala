package graft.streaming

import graft.SparkSuite
import graft.core.{GunCell, GunValue}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class HamStreamSpec extends SparkSuite {
  import HamStream._

  private val empty = KeyState(None, None, Nil)
  private val k = ("s1", "f")
  private def cell(v: String, st: Double) = GunCell("s1", "f", GunValue.string(v), st)

  test("step: first write emits; newer wins; older discarded") {
    val (st1, out1) = step(k, Seq(cell("a", 1000)), empty, nowMs = 2000, ttlMs = 1e9)
    assert(out1.map(_.value) == Seq(GunValue.string("a")))
    val (st2, out2) = step(k, Seq(cell("b", 1500), cell("stale", 500)), st1, 2000, 1e9)
    assert(out2.map(_.value) == Seq(GunValue.string("b")))
    assert(st2.value.contains(GunValue.string("b")) && st2.state.contains(1500.0))
  }

  test("step: duplicate value+state not re-emitted (subscription dedupe)") {
    val (st1, _) = step(k, Seq(cell("a", 1000)), empty, 2000, 1e9)
    val (_, out2) = step(k, Seq(cell("a", 1000)), st1, 2000, 1e9)
    assert(out2.isEmpty)
  }

  test("step: same-state tiebreak by canonical json") {
    val (st1, _) = step(k, Seq(cell("a", 1000)), empty, 2000, 1e9)
    val (st2, out2) = step(k, Seq(cell("b", 1000)), st1, 2000, 1e9)
    assert(out2.map(_.value) == Seq(GunValue.string("b")))
    val (_, out3) = step(k, Seq(cell("a", 1000)), st2, 2000, 1e9)
    assert(out3.isEmpty) // lexically smaller → keep
  }

  test("step: conflicting future write deferred, applied when clock catches up") {
    val (st1, _) = step(k, Seq(cell("now", 1000)), empty, 2000, 1e9)
    val (st2, out2) = step(k, Seq(cell("future", 5000)), st1, 2000, 1e9)
    assert(out2.isEmpty && st2.deferred.map(_.state) == List(5000.0))
    val (st3, out3) = step(k, Nil, st2, nowMs = 6000, ttlMs = 1e9)
    assert(out3.map(_.value) == Seq(GunValue.string("future")))
    assert(st3.deferred.isEmpty && st3.state.contains(5000.0))
  }

  test("step: ttl evicts idle value") {
    val (st1, _) = step(k, Seq(cell("a", 1000)), empty, 2000, ttlMs = 1e9)
    val (st2, out) = step(k, Nil, st1, nowMs = 1000 + 2e9, ttlMs = 1e9)
    assert(st2.value.isEmpty && out.isEmpty)
  }

  test("step convergence: any batch split reaches the same final state (property)") {
    // CRDT property at the streaming-operator level: for non-future cells,
    // applying a cell multiset through ANY sequence of step() calls must
    // converge to the same (value, state) winner — the same guarantee
    // HamMergeSpec asserts for the batch operator, here for the state
    // machine the wire path runs on.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val cellGen = Gen.listOfN(8, for {
      v <- Gen.oneOf("a", "b", "aa", "z", "")
      st <- Gen.chooseNum(1L, 50L)
    } yield cell(v, st.toDouble * 100))
    (0 until 40).foreach { i =>
      cellGen(Gen.Parameters.default, Seed(7000L + i)).foreach { cells =>
        val now = 10000.0 // all generated states ≤ 5000 → nothing defers
        // reference outcome: one big batch
        val (oneShot, _) = step(k, cells, empty, now, ttlMs = 1e12)
        // split points derived from the seed: apply in 1-4 chunks
        val nChunks = 1 + (i % 4)
        val chunks = cells.grouped(math.max(1, cells.size / nChunks)).toSeq
        val (multi, _) = chunks.foldLeft((empty, Seq.empty[Update])) {
          case ((st0, _), chunk) => step(k, chunk, st0, now, ttlMs = 1e12)
        }
        assert(multi.value == oneShot.value && multi.state == oneShot.state,
          s"seed ${7000 + i}: split into $nChunks chunks diverged " +
            s"(${multi.value}/${multi.state} vs ${oneShot.value}/${oneShot.state})")
      }
    }
  }

  test("merged-store sink: updates foreachBatch-merge into a parquet store") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ham_store").toString + "/cells"
    val in = MemoryStream[GunCell]
    val q = mergeIntoStore(updates(in.toDS(), timers = false), dir)
    try {
      in.addData(GunCell("s1", "f", GunValue.string("v1"), 1000))
      q.processAllAvailable()
      in.addData(
        GunCell("s1", "f", GunValue.string("v2"), 2000), // newer → wins
        GunCell("s2", "g", GunValue.number(9L), 500))
      q.processAllAvailable()
      val store = spark.read.parquet(dir).collect()
        .map(r => (r.getString(0), r.getString(1),
          r.getStruct(2).getAs[String]("str"), r.getStruct(2).getAs[String]("num"),
          r.getDouble(3)))
        .toSet
      assert(store == Set(
        ("s1", "f", "v2", null, 2000.0),
        ("s2", "g", null, "9", 500.0)))
    } finally q.stop()
  }

  test("subscribeWithSnapshot: current value delivered first, then transitions") {
    // gun/scoped_fetch.go:104-107 — a subscriber to an already-written cell
    // sees the current local value immediately, then each later update.
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val snapshot = Seq(GunCell("s1", "f", GunValue.string("current"), 1000),
      GunCell("s9", "x", GunValue.string("other-cell"), 900)).toDS()
    val in = MemoryStream[GunCell]
    val sub = subscribeWithSnapshot(snapshot, updates(in.toDS(), timers = false), "s1", "f")
    val q = sub.writeStream
      .format("memory").queryName("snap_sub").outputMode("append").start()
    try {
      q.processAllAvailable()
      val first = spark.sql("SELECT value.str, state FROM snap_sub")
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(first == Seq(("current", 1000.0))) // initial emit, nothing else
      in.addData(GunCell("s1", "f", GunValue.string("next"), 2000),
        GunCell("s9", "x", GunValue.string("not-subscribed"), 2000))
      q.processAllAvailable()
      val all = spark.sql("SELECT value.str FROM snap_sub ORDER BY state")
        .collect().map(_.getString(0)).toSeq
      assert(all == Seq("current", "next")) // soul-interest filter held
    } finally q.stop()
  }

  test("merged-store sink is incremental: untouched buckets' files stay put") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ham_store_inc").toString + "/cells"
    val in = MemoryStream[GunCell]
    val q = mergeIntoStore(updates(in.toDS(), timers = false), dir, numBuckets = 8)
    try {
      // seed several souls across buckets
      in.addData((1 to 20).map(i => GunCell(s"soul$i", "f", GunValue.number(i.toLong), 1000)): _*)
      q.processAllAvailable()
      def bucketFiles(): Map[String, Set[(String, Long)]] = {
        val root = new java.io.File(dir)
        root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("bucket="))
          .map(d => d.getName ->
            d.listFiles().filter(_.getName.endsWith(".parquet"))
              .map(f => (f.getName, f.lastModified())).toSet)
          .toMap
      }
      val before = bucketFiles()
      assert(before.size > 1) // data actually spread over several buckets
      // second batch touches exactly one soul → one bucket
      in.addData(GunCell("soul1", "f", GunValue.number(999L), 2000))
      q.processAllAvailable()
      val after = bucketFiles()
      val touchedBucket = {
        val b = spark.range(1).select(
          HamStream.bucketOf(
            org.apache.spark.sql.functions.lit("soul1"),
            org.apache.spark.sql.functions.lit("f"), 8)).head().getLong(0)
        s"bucket=$b"
      }
      // untouched buckets: identical file listings AND timestamps (no rewrite)
      (before.keySet - touchedBucket).foreach { b =>
        assert(after(b) == before(b), s"bucket $b was rewritten")
      }
      assert(after(touchedBucket) != before(touchedBucket))
      // and the merge is correct: soul1 updated, others intact
      val store = spark.read.parquet(dir)
        .select($"soul", $"value.num".as("num")).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(store("soul1") == "999" && store("soul2") == "2" && store.size == 20)
    } finally q.stop()
  }

  test("fetchFromStore: point read prunes to one bucket directory") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ham_store_read").toString + "/cells"
    val in = MemoryStream[GunCell]
    val q = mergeIntoStore(updates(in.toDS(), timers = false), dir, numBuckets = 8)
    try {
      in.addData((1 to 16).map(i =>
        GunCell(s"rsoul$i", "f", GunValue.number(i.toLong), 1000)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val hit = HamStream.fetchFromStore(spark, dir, "rsoul7", "f", numBuckets = 8)
    assert(hit.valueExists && hit.value.contains(GunValue.number(7L)))
    val miss = HamStream.fetchFromStore(spark, dir, "rsoul7", "nope", numBuckets = 8)
    assert(!miss.valueExists)
    // the partition filter reaches the scan: exactly one bucket selected
    import org.apache.spark.sql.functions.{col, lit}
    val b = spark.range(1)
      .select(HamStream.bucketOf(lit("rsoul7"), lit("f"), 8)).head().getLong(0)
    val plan = spark.read.parquet(dir).filter(col("bucket") === b)
      .queryExecution.executedPlan.toString
    assert(plan.contains(s"bucket = $b") || plan.contains(s"bucket#") ||
      plan.contains("PartitionFilters"))
  }

  test("compactStore drops expired cells and removes fully-expired buckets") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ham_store_ttl").toString + "/cells"
    val in = MemoryStream[GunCell]
    val q = mergeIntoStore(updates(in.toDS(), timers = false), dir, numBuckets = 4)
    try {
      in.addData(
        GunCell("old1", "f", GunValue.string("a"), 1000),
        GunCell("old2", "f", GunValue.string("b"), 2000),
        GunCell("new1", "f", GunValue.string("c"), 99000))
      q.processAllAvailable()
    } finally q.stop()
    HamStream.compactStore(spark, dir, nowMs = 100000, ttlMs = 5000)
    val kept = spark.read.parquet(dir).select("soul").as[String].collect().toSet
    assert(kept == Set("new1"))
    // no bucket dir holds only-expired data anymore
    val bucketDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(bucketDirs.nonEmpty)
    bucketDirs.foreach { d =>
      assert(d.listFiles().exists(_.getName.endsWith(".parquet")))
    }
  }

  test("subscribeWithSnapshot: dedupe state is watermark-bounded, race still deduped") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    // the write that produced the snapshot is still "in flight" on the
    // update stream: it must be delivered exactly once (the dedupe race)
    val snapshot = Seq(GunCell("s1", "f", GunValue.string("v0"), t0.toDouble)).toDS()
    val in = MemoryStream[GunCell]
    val sub = subscribeWithSnapshot(snapshot, updates(in.toDS(), timers = false),
      "s1", "f", dedupeRetention = "10 seconds")
    val q = sub.writeStream
      .format("memory").queryName("wm_sub").outputMode("append").start()
    try {
      in.addData(GunCell("s1", "f", GunValue.string("v0"), t0.toDouble))
      q.processAllAvailable()
      val v0count = spark.sql("SELECT * FROM wm_sub WHERE value.str = 'v0'").count()
      assert(v0count == 1) // snapshot + in-flight write collapsed to one emit
      // advance event time far beyond the 10 s retention, batch by batch:
      // earlier transitions age out of the dedupe state store
      (1 to 5).foreach { i =>
        in.addData(GunCell("s1", "f", GunValue.string(s"v$i"),
          (t0 + i * 60000L).toDouble))
        q.processAllAvailable()
      }
      val dedupeRows = q.lastProgress.stateOperators
        .find(_.operatorName.toLowerCase.contains("dedupe"))
        .map(_.numRowsTotal)
      // 6 distinct transitions passed through; only those within the
      // watermark window may remain tracked
      assert(dedupeRows.exists(_ < 6),
        s"dedupe state not bounded: $dedupeRows rows after 6 transitions")
      // every transition was still delivered exactly once
      val delivered = spark.sql("SELECT value.str FROM wm_sub")
        .collect().map(_.getString(0)).toSeq
      assert(delivered.sorted == (0 to 5).map(i => s"v$i"))
    } finally q.stop()
  }

  test("swap crash windows: bucket stays readable (old or new, never neither)") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ham_store_swap").toString + "/cells"
    val in = MemoryStream[GunCell]
    val q = mergeIntoStore(updates(in.toDS(), timers = false), dir, numBuckets = 4)
    try {
      in.addData((1 to 12).map(i =>
        GunCell(s"ssoul$i", "f", GunValue.number(i.toLong), 1000)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val all = spark.read.parquet(dir).select("soul").as[String].collect().toSet
    assert(all.size == 12)
    val storeDir = new org.apache.hadoop.fs.Path(dir)
    val fs = storeDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val someBucket = fs.listStatus(storeDir)
      .map(_.getPath.getName).filter(_.startsWith("bucket=")).head

    // Crash point A: between rename(live → trash) and rename(staged → live)
    // — live dir absent, old data parked in trash. Any store entry point
    // must heal it before serving.
    fs.rename(new org.apache.hadoop.fs.Path(storeDir, someBucket),
      new org.apache.hadoop.fs.Path(storeDir, s".trash-$someBucket"))
    assert(spark.read.parquet(dir).count() < 12) // bucket really absent pre-heal
    HamStream.recoverStore(fs, storeDir)
    assert(spark.read.parquet(dir).select("soul").as[String].collect().toSet == all)

    // Crash point B: after rename(staged → live) but before the trash
    // delete — both live and trash exist. Recovery must drop the trash
    // (the swap completed), and the dot-dir must be invisible to reads
    // (no double counting even BEFORE recovery runs).
    val live = new org.apache.hadoop.fs.Path(storeDir, someBucket)
    val trash = new org.apache.hadoop.fs.Path(storeDir, s".trash-$someBucket")
    org.apache.hadoop.fs.FileUtil.copy(fs, live, fs, trash, false,
      spark.sparkContext.hadoopConfiguration)
    assert(spark.read.parquet(dir).count() == 12) // hidden-file filter holds
    HamStream.recoverStore(fs, storeDir)
    assert(!fs.exists(trash) && fs.exists(live))
    assert(spark.read.parquet(dir).select("soul").as[String].collect().toSet == all)
  }

  test("lsh candidate hot-bucket cap rep-links oversized buckets") {
    import graft.operators.Dedup
    val spark2 = spark
    import spark2.implicits._
    // 3 docs share band key "X" (bucket of 3), 2 docs share "Y" (bucket of 2)
    val sigs = Seq(
      (1L, 0L, 100L), (2L, 0L, 100L), (3L, 0L, 100L),
      (4L, 0L, 200L), (5L, 0L, 200L)).toDF("doc_id", "i", "sig")
    val uncapped = Dedup.minhashCandidates(sigs).count()
    val capped = Dedup.minhashCandidates(sigs, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == 4) // 3C2 + 1
    // hot bucket X switches to representative linking: members pair with
    // the bucket-min doc (1) instead of all-pairs — (2,3) is the only pair
    // the cap sacrifices, and the family stays connected through 1
    assert(capped == Set((1L, 2L), (1L, 3L), (4L, 5L)))
  }

  test("streaming end-to-end: MemoryStream → HAM updates → memory sink") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[GunCell]
    val q = updates(in.toDS(), timers = false).writeStream
      .format("memory").queryName("ham_updates").outputMode("append").start()
    try {
      in.addData(
        GunCell("s1", "f", GunValue.string("v1"), 1000),
        GunCell("s1", "f", GunValue.string("v0"), 500), // arrives with older state
        GunCell("s2", "g", GunValue.number(7L), 1200))
      q.processAllAvailable()
      in.addData(GunCell("s1", "f", GunValue.string("v2"), 2000))
      q.processAllAvailable()
      val rows = spark.sql("SELECT soul, field, value.str, value.num, state FROM ham_updates")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getDouble(4)))
        .toSet
      assert(rows.contains(("s1", "f", "v1", null, 1000.0)))
      assert(rows.contains(("s1", "f", "v2", null, 2000.0)))
      assert(rows.contains(("s2", "g", null, "7", 1200.0)))
      // the out-of-order older write must NOT have been emitted
      assert(!rows.exists(_._3 == "v0"))
    } finally q.stop()
  }
}
