package graft.streaming

import graft.SparkSuite
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Incremental MinHash-LSH near-dup detection (StreamingNearDup): a
  * late-arriving near-duplicate of a long-ingested document is caught by
  * probing ONLY the band buckets the new doc hashes into — never a
  * corpus rescan — with all cross-batch state on disk (driver state is
  * O(batch)).
  */
class StreamingNearDupSpec extends SparkSuite {
  import spark.implicits._

  private val baseText = ("spark stream batch window merge join filter " +
    "scan table column vector hash key value group sort order part line " +
    "data query fast slow small big agg row customer the dup").trim
  private def fillerText(i: Int): String =
    (0 until 30).map(j => s"w${i}x$j").mkString(" ")

  private def runBatches(batches: Seq[Seq[(Long, String)]],
                         numBuckets: Int = 16,
                         minEq: Int = 8,
                         compactThreshold: Int = 3)
      : (Seq[StreamingNearDup.ProbeStats], String, String) = {
    implicit val sqlCtx = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("snd-idx").toString
    val out = java.nio.file.Files.createTempDirectory("snd-out").toString
    val statsBuf = new java.util.concurrent.ConcurrentLinkedQueue[StreamingNearDup.ProbeStats]
    val in = MemoryStream[(Long, String)]
    val q = StreamingNearDup.start(
      in.toDS().toDF("doc_id", "text"), idx, out,
      numBuckets = numBuckets, minEq = minEq,
      compactThreshold = compactThreshold, onStats = statsBuf.add)
    try {
      batches.foreach { b =>
        in.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    (statsBuf.asScala.toSeq.sortBy(_.batchId), idx, out)
  }

  private def allMatches(out: String): Set[(Long, Long, Long)] = {
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("batch-"))
    dirs.flatMap { d =>
      spark.read.parquet(d.toString).collect()
        .map(r => (r.getAs[Long]("new_doc"), r.getAs[Long]("old_doc"),
          r.getAs[Number]("n_eq").longValue()))
    }.toSet
  }

  test("late near-duplicate of an old doc matches without corpus rescan") {
    val editedBase = baseText.split(" ").dropRight(1).mkString(" ") + " changed"
    val (stats, _, out) = runBatches(Seq(
      Seq(1L -> baseText) ++ (100 until 120).map(i => i.toLong -> fillerText(i)),
      (200 until 220).map(i => i.toLong -> fillerText(i)),
      Seq(999L -> editedBase)))
    val m = allMatches(out)
    assert(m.exists { case (n, o, eq) => n == 999L && o == 1L && eq >= 8 },
      s"expected (999, 1) near-dup match, got $m")
    // the probe touched only the new doc's own band buckets (≤ 4 bands),
    // a strict subset of the occupied index...
    val s3 = stats.find(_.batchId == 2L).get
    assert(s3.bucketsProbed <= 4 && s3.bucketsProbed < s3.bucketsOccupied,
      s"probe not bucket-pruned: $s3")
    // ...and scanned a fraction of the indexed rows (41 docs × 4 bands)
    assert(s3.indexRowsScanned < 41L * 4,
      s"probe rescanned the corpus: $s3")
  }

  test("exact duplicate across batches matches at full signature agreement") {
    val (_, _, out) = runBatches(Seq(
      Seq(1L -> baseText, 2L -> fillerText(2)),
      Seq(50L -> baseText)))
    val m = allMatches(out)
    assert(m.contains((50L, 1L, Dedup.NumHashes.toLong)), s"got $m")
  }

  test("within-batch duplicate pair is emitted once") {
    val (_, _, out) = runBatches(Seq(
      Seq(7L -> baseText, 8L -> baseText)))
    val m = allMatches(out)
    assert(m.count { case (n, o, _) => Set(n, o) == Set(7L, 8L) } == 1, s"got $m")
    assert(m.contains((8L, 7L, Dedup.NumHashes.toLong)), s"got $m")
  }

  test("unrelated docs never match") {
    val (_, _, out) = runBatches(Seq(
      (0 until 10).map(i => i.toLong -> fillerText(i)),
      (10 until 20).map(i => i.toLong -> fillerText(i))))
    assert(allMatches(out).isEmpty)
  }

  test("bucket-count layout guard rejects a mismatched reopen") {
    val idx = java.nio.file.Files.createTempDirectory("snd-layout").toString
    val out = java.nio.file.Files.createTempDirectory("snd-layout-out").toString
    import spark.implicits._
    val b = Seq(1L -> baseText).toDF("doc_id", "text")
    StreamingNearDup.processBatch(b, 0L, idx, out,
      numBuckets = 16, minEq = 8, compactThreshold = 8)
    val e = intercept[IllegalArgumentException] {
      StreamingNearDup.processBatch(b, 1L, idx, out,
        numBuckets = 32, minEq = 8, compactThreshold = 8)
    }
    assert(e.getMessage.contains("numBuckets=16"))
  }

  test("over-threshold batch falls back to the broadcast semi-join probe (same matches, no driver literal)") {
    import spark.implicits._
    def run(maxKeys: Int): Set[(Long, Long, Long)] = {
      val idx = java.nio.file.Files.createTempDirectory("snd-push").toString
      val out = java.nio.file.Files.createTempDirectory("snd-push-out").toString
      val b0 = (Seq(1L -> baseText) ++
        (100 until 110).map(i => i.toLong -> fillerText(i))).toDF("doc_id", "text")
      val b1 = (Seq(999L -> baseText) ++
        (200 until 210).map(i => i.toLong -> fillerText(i))).toDF("doc_id", "text")
      val s0 = StreamingNearDup.processBatch(b0, 0L, idx, out, 16, 8, 8,
        maxPushdownKeys = maxKeys)
      val s1 = StreamingNearDup.processBatch(b1, 1L, idx, out, 16, 8, 8,
        maxPushdownKeys = maxKeys)
      // batch 0 probes an EMPTY index (no pushdown at all); batch 1 is
      // the real probe: IN-list leg reports its key count, fallback -1
      assert(s0.inListKeys == 0, s"$s0")
      if (maxKeys > 1000) assert(s1.inListKeys > 0, s"$s1")
      else assert(s1.inListKeys == -1, s"$s1")
      allMatches(out)
    }
    val viaInList = run(maxKeys = 4096)
    val viaSemiJoin = run(maxKeys = 1) // 11 docs × 4 bands >> 1: forced fallback
    assert(viaInList == viaSemiJoin, s"$viaInList vs $viaSemiJoin")
    assert(viaSemiJoin.exists { case (n, o, _) => n == 999L && o == 1L })
  }

  test("hot band key degrades to representative matching, not unbounded fan-out") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("snd-hot").toString
    val out = java.nio.file.Files.createTempDirectory("snd-hot-out").toString
    val cap = 8
    // 3 batches × 10 copies of the same text hammer one band-key family
    (0 until 3).foreach { b =>
      StreamingNearDup.processBatch(
        (0 until 10).map(i => (b * 100L + i) -> baseText).toDF("doc_id", "text"),
        b.toLong, idx, out, 16, 8, 0, maxKeyRows = cap)
    }
    val probe = StreamingNearDup.processBatch(
      Seq(9999L -> baseText).toDF("doc_id", "text"),
      3L, idx, out, 16, 8, 0, maxKeyRows = cap)
    // 30 indexed family members, but the capped old side keeps only the
    // `cap` smallest doc_ids — the probe matches exactly the family
    // representatives (the batch contract: connectivity, not enumeration)
    val newMatches = spark.read.parquet(s"$out/batch-3")
      .select("old_doc").collect().map(_.getLong(0)).toSet
    assert(newMatches == (0 until cap).map(_.toLong).toSet,
      s"expected the $cap smallest representatives, got $newMatches")
    assert(probe.matches == cap.toLong, s"$probe")
  }

  test("same-batchId replay of a crashed compaction never empties the bucket") {
    // Crash model: compaction promoted compact-b<id>-0 but crashed before
    // deleting the old deltas; the micro-batch replays under the SAME
    // batchId. The replay's rename skips (dest exists), so the promoted
    // compact file may be the bucket's only full copy — the delete pass
    // must not touch it.
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("snd-crash").toString
    val out = java.nio.file.Files.createTempDirectory("snd-crash-out").toString
    def oneDoc(id: Long) = Seq(id -> baseText).toDF("doc_id", "text")
    // three un-compacted deltas per touched bucket
    (0 until 3).foreach(i => StreamingNearDup.processBatch(
      oneDoc(100L + i), i.toLong, idx, out, 16, 8, compactThreshold = 0))
    def bucketDirs = new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    val snapshot = bucketDirs.flatMap(_.listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.toPath -> java.nio.file.Files.readAllBytes(f.toPath)))
    // batch 3 fires compaction (4 files >= threshold 2): deltas deleted,
    // compact-b3-0 promoted...
    StreamingNearDup.processBatch(
      oneDoc(103L), 3L, idx, out, 16, 8, compactThreshold = 2)
    assert(bucketDirs.forall(_.listFiles()
      .exists(_.getName.startsWith("compact-b3-"))))
    // ...now restore the old deltas next to it = the crashed state
    snapshot.foreach { case (p, bytes) => java.nio.file.Files.write(p, bytes) }
    // replay batch 3 under the same batchId
    StreamingNearDup.processBatch(
      oneDoc(103L), 3L, idx, out, 16, 8, compactThreshold = 2)
    assert(bucketDirs.nonEmpty)
    assert(bucketDirs.forall(_.listFiles().exists(_.getName.endsWith(".parquet"))),
      "replayed compaction emptied a bucket")
    // the index still answers: a later near-dup probe matches the old docs
    StreamingNearDup.processBatch(
      oneDoc(999L), 4L, idx, out, 16, 8, compactThreshold = 8)
    val m = allMatches(out)
    assert((100L to 103L).forall(o => m.exists {
      case (n, o2, eq) => n == 999L && o2 == o && eq == Dedup.NumHashes.toLong
    }), s"index lost rows after crash replay: $m")
  }

  test("delta files compact once a bucket crosses the threshold") {
    // 6 batches all touching the same band keys (same doc text) with
    // compactThreshold=2: without compaction each bucket would
    // accumulate 6 delta files. Under the count-and-size-ratio trigger
    // (VERDICT_r16 #3) the fold schedule is geometric — the first fold
    // fires on count alone (no base yet), later folds wait for the
    // delta bytes to catch the base up — so the bound is
    // O(log batches), not the old fold-every-threshold 2.
    val (_, idx, out) = runBatches(
      (0 until 6).map(b => Seq((1000L + b) -> baseText)),
      compactThreshold = 2)
    val bucketDirs = new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(bucketDirs.nonEmpty)
    val maxFiles = bucketDirs.map(
      _.listFiles().count(_.getName.endsWith(".parquet"))).max
    assert(maxFiles < 6, s"compaction never fired: $maxFiles files in a bucket")
    assert(bucketDirs.exists(
      _.listFiles().exists(_.getName.startsWith("compact-"))))
    // the index survives compaction: every later copy still matched doc 1000
    val m = allMatches(out)
    assert((1 until 6).forall(b => m.exists {
      case (n, o, eq) => n == 1000L + b && eq == Dedup.NumHashes.toLong && o < n
    }), s"got $m")
  }
}
