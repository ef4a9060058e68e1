package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental MinHash-LSH near-duplicate detection over a document
  * stream — the streaming form of [[Dedup.minhashCandidates]]: a
  * late-arriving near-duplicate of a document ingested long ago is
  * caught WITHOUT rescanning the corpus.
  *
  * The reference's standing-subscription dataflow
  * (`/root/reference/gun/scoped_fetch.go:89-217` — seed from the store,
  * then match each live update against registered interest) is the
  * pattern: here the "interest set" is the LSH band-bucket index of
  * every document seen so far, persisted as a bucket-partitioned
  * parquet store built with the same machinery as
  * [[HamStream.appendIntoStore]]'s LSM delta sink (per-batch staged
  * write → idempotent parallel rename promotion → file-count-triggered
  * per-bucket compaction).
  *
  * Per micro-batch:
  *   1. MinHash signatures + band keys for the batch docs (map-side;
  *      [[Dedup.minhashSignatures]] / [[Dedup.bandKeys]]).
  *   2. PROBE: read ONLY the index buckets the batch's band keys hash
  *      into — per-batch probe I/O is O(batch × bands), bounded by
  *      `numBuckets`, and independent of corpus size. The join yields
  *      (new, old) candidates sharing ≥1 band; candidates are verified
  *      by signature agreement (`n_eq` of NumHashes components equal —
  *      an integer-lattice Jaccard estimate) against `minEq`.
  *   3. Within-batch pairs via the same band self-join (a batch
  *      carrying both copies of a doc must still match).
  *   4. Matches land at `matchesPath/batch-<id>` (overwrite —
  *      idempotent on micro-batch replay); the batch's
  *      (band, band_key, doc_id, sig) rows append to the index as one
  *      delta file per touched bucket.
  *
  * State: the driver holds NOTHING across batches — all cross-batch
  * state is the on-disk index, so memory is O(batch) while history is
  * disk-bounded (the only thing that CAN hold 100 TB of signatures).
  * Replayed batches re-append under the same batchId (dest-exists
  * renames skip) and rewrite the same matches dir, so the output is a
  * set under at-least-once delivery; compaction dedupes
  * (band, band_key, doc_id) rows, making a crash between compaction
  * steps at worst a transient duplicate that the next compaction folds.
  *
  * Docs under 3 whitespace tokens have no 3-gram shingles, hence no
  * signature — they never index or match (same contract as the batch
  * operator).
  */
object StreamingNearDup {

  /** Per-batch probe telemetry (driver-side metadata only — counts and
    * bucket ids, never row data). `inListKeys` is the number of band
    * keys pushed down as a parquet IN filter, or -1 when the batch was
    * over [[MaxPushdownKeys]] and the probe fell back to the broadcast
    * semi-join (bounded driver memory, no filter literal).
    */
  final case class ProbeStats(
      batchId: Long,
      batchDocs: Long,
      bucketsProbed: Int,
      bucketsOccupied: Int,
      indexRowsScanned: Long,
      matches: Long,
      processMs: Long,
      inListKeys: Int = 0)

  /** Band-key-count ceiling for the collected IN-list probe pushdown.
    * Under it, the batch's distinct band keys are pushed as a parquet
    * In() filter — compaction sorts the index by band_key, so the scan
    * row-group-prunes to point lookups. Over it (a catch-up batch of
    * millions of docs), the collected literal would put O(batch×bands)
    * strings in driver memory AND in the plan; the probe switches to a
    * broadcast LEFT SEMI join of the bucket scan against the batch's
    * band keys — same candidate set, no driver round-trip. The
    * threshold probe costs one `limit(N+1)` collect, so driver memory
    * is bounded by N either way.
    */
  val MaxPushdownKeys = 4096

  /** Per-band_key cap on the OLD side of the candidate joins — the
    * streaming mirror of [[Dedup.DefaultMaxBucket]]: one viral band key
    * (boilerplate shared by a large fraction of the corpus) would
    * otherwise make the probe join fan-out, and the per-key index read,
    * grow without bound. Keys over the cap keep their `MaxKeyRows`
    * SMALLEST doc_ids (the stable family representatives — a new copy
    * still matches the family through them, same contract as the batch
    * operator's representative linking); only intra-family pair
    * enumeration beyond the cap is sacrificed.
    */
  val MaxKeyRows = 1024

  private val indexSchema = StructType(Seq(
    StructField("band", LongType),
    StructField("band_key", StringType),
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType))))

  /** Start the standing query: `docs` must stream (doc_id, text) rows.
    * `minEq` is the match threshold in signature components (of
    * [[Dedup.NumHashes]]): 8/16 ≈ Jaccard 0.5.
    */
  def start(
      docs: DataFrame,
      indexPath: String,
      matchesPath: String,
      numBuckets: Int = 64,
      minEq: Int = 8,
      compactThreshold: Int = 8,
      onStats: ProbeStats => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onStats(processBatch(batch, batchId, indexPath, matchesPath,
          numBuckets, minEq, compactThreshold))
      }
      .start()

  /** One micro-batch: probe → match → append. Exposed for the bench
    * harness (drive batches without a streaming source) and tests.
    */
  private[graft] def processBatch(
      batch: DataFrame,
      batchId: Long,
      indexPath: String,
      matchesPath: String,
      numBuckets: Int,
      minEq: Int,
      compactThreshold: Int,
      probeAllBuckets: Boolean = false,
      maxPushdownKeys: Int = MaxPushdownKeys,
      maxKeyRows: Int = MaxKeyRows): ProbeStats = {
    val t0 = System.nanoTime()
    val spark = batch.sparkSession
    val sigs = Dedup.minhashSignatures(batch.toDF(), "doc_id", "text")
    val rows = Dedup.bandKeys(sigs)
      .join(Dedup.sigArray(sigs), "doc_id")
      .withColumn("bucket", pmod(hash(col("band"), col("band_key")), lit(numBuckets)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // touched buckets: driver-side METADATA, ≤ numBuckets ids — the
      // same O(#partitions) collect the prefix-sum packing does, not a
      // data collect
      val touched = rows.select("bucket").distinct().collect()
        .map(_.getInt(0)).toSet
      val storeDir = new org.apache.hadoop.fs.Path(indexPath)
      val fs = storeDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      checkIndexLayout(fs, storeDir, numBuckets)
      val occupied =
        if (!fs.exists(storeDir)) Array.empty[Int]
        else fs.listStatus(storeDir)
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
          .map(_.getPath.getName.stripPrefix("bucket=").toInt)
      val probeIds =
        if (probeAllBuckets) occupied.toSeq // the naive A/B leg: full-index probe
        else occupied.filter(touched.contains).toSeq
      val probePaths = probeIds.map(b => s"$indexPath/bucket=$b")
      // the batch's band keys, pushed into the bucket scan so
      // compaction-sorted files row-group-prune to point lookups
      // (PushedFilters: In(band_key, ...)) — but BOUNDED: the collect is
      // limit(MaxPushdownKeys + 1), and past the threshold the probe
      // switches to a broadcast semi-join instead of a driver literal
      // (ADVICE_r8: an unbounded batch×NumBands IN-list is a driver-
      // memory and plan-size blowup on a catch-up batch). The naive A/B
      // leg skips it — it exists to price the rescan shape.
      var inListKeys = 0
      val idx =
        if (probePaths.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], indexSchema)
        else {
          val scan = spark.read.schema(indexSchema).parquet(probePaths: _*)
          if (probeAllBuckets) scan
          else {
            val distinctKeys = rows.select("band_key").distinct()
            val sample = distinctKeys.limit(maxPushdownKeys + 1).collect()
            if (sample.length <= maxPushdownKeys) {
              inListKeys = sample.length
              scan.filter(col("band_key").isInCollection(
                sample.map(_.getString(0)).toSeq))
            } else {
              inListKeys = -1
              scan.join(broadcast(distinctKeys), Seq("band_key"), "left_semi")
            }
          }
        }
      // hot-key guard: cap the OLD side of both candidate joins to the
      // MaxKeyRows smallest doc_ids per (band, band_key) — runs on the
      // already-pruned probe subset, so the window is O(probe), and a
      // viral key degrades to representative matching instead of an
      // unbounded fan-out
      def capPerKey(df: DataFrame): DataFrame =
        if (maxKeyRows <= 0) df
        else df.withColumn("_rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("band", "band_key").orderBy("old_doc")))
          .filter(col("_rn") <= maxKeyRows).drop("_rn")
      val old = capPerKey(idx.select(col("band"), col("band_key"),
        col("doc_id").as("old_doc"), col("sig").as("old_sig")))
      val newBands = rows.select(col("doc_id").as("new_doc"),
        col("band"), col("band_key"), col("sig"))
      val vsHistory = newBands.join(old, Seq("band", "band_key"))
        .filter(col("old_doc") =!= col("new_doc"))
      // within-batch: both sides new, ordered to emit each pair once
      val inBatch = newBands.join(
        capPerKey(rows.select(col("doc_id").as("old_doc"), col("band"),
          col("band_key"), col("sig").as("old_sig"))),
        Seq("band", "band_key"))
        .filter(col("old_doc") < col("new_doc"))
      val nEq = aggregate(
        zip_with(col("sig"), col("old_sig"),
          (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v)
      val matches = vsHistory.unionByName(inBatch)
        .groupBy("new_doc", "old_doc")
        .agg(count(lit(1)).as("n_shared_bands"),
          first(col("sig")).as("sig"), first(col("old_sig")).as("old_sig"))
        .withColumn("n_eq", nEq)
        .filter(col("n_eq") >= minEq)
        .select("new_doc", "old_doc", "n_shared_bands", "n_eq")
      matches.write.mode("overwrite").parquet(s"$matchesPath/batch-$batchId")
      val nMatches = spark.read.parquet(s"$matchesPath/batch-$batchId").count()
      val idxRows = if (probePaths.isEmpty) 0L else idx.count()
      appendIndexDelta(rows, batchId, indexPath, numBuckets, compactThreshold, fs, storeDir)
      ProbeStats(batchId, rows.select("doc_id").distinct().count(),
        probeIds.size, occupied.length, idxRows, nMatches,
        (System.nanoTime() - t0) / 1000000L, inListKeys)
    } finally rows.unpersist()
  }

  /** Bucket-count layout guard: `bucketOf` routing is only consistent if
    * every writer AND prober of an index uses the same `numBuckets` — a
    * restart with a different value would silently probe the wrong
    * buckets (missed duplicates, no error). First touch stamps a marker;
    * later touches must match it (HamStream.checkLayout's contract).
    */
  private def checkIndexLayout(
      fs: org.apache.hadoop.fs.FileSystem,
      storeDir: org.apache.hadoop.fs.Path,
      numBuckets: Int): Unit = {
    val marker = new org.apache.hadoop.fs.Path(storeDir, "_nd_layout")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val recorded =
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toInt
        finally in.close()
      require(recorded == numBuckets,
        s"near-dup index at $storeDir was built with numBuckets=$recorded, " +
          s"probed with $numBuckets — band-bucket routing would be wrong")
    } else {
      fs.mkdirs(storeDir)
      val out = fs.create(marker, true)
      try out.write(numBuckets.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Append the batch's index rows as ONE delta file per touched bucket —
    * the [[HamStream.appendBatchIntoStore]] discipline: staged
    * bucket-partitioned write, idempotent parallel rename promotion
    * (dest-exists = same-batch replay, benign), then fold any bucket
    * whose delta-file count crossed `compactThreshold` into a single
    * deduped file.
    */
  private def appendIndexDelta(
      rows: DataFrame,
      batchId: Long,
      indexPath: String,
      numBuckets: Int,
      compactThreshold: Int,
      fs: org.apache.hadoop.fs.FileSystem,
      storeDir: org.apache.hadoop.fs.Path): Unit = {
    val spark = rows.sparkSession
    val staging = new org.apache.hadoop.fs.Path(indexPath, s".staging-delta-$batchId")
    rows.select("band", "band_key", "doc_id", "sig", "bucket")
      .repartition(numBuckets min
        spark.sessionState.conf.numShufflePartitions, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(staging.toString)
    val bucketDirs = fs.listStatus(staging)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
    val overThreshold =
      if (bucketDirs.isEmpty) Array.empty[String]
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          bucketDirs.length min 16)
        try {
          val futures = bucketDirs.map { bdir =>
            pool.submit(new java.util.concurrent.Callable[(String, Int)] {
              override def call(): (String, Int) = {
                val name = bdir.getPath.getName
                val live = new org.apache.hadoop.fs.Path(storeDir, name)
                if (!fs.exists(live)) fs.mkdirs(live)
                fs.listStatus(bdir.getPath)
                  .filter(_.getPath.getName.endsWith(".parquet")).zipWithIndex
                  .foreach { case (f, i) =>
                    val dest = new org.apache.hadoop.fs.Path(
                      live, s"delta-b$batchId-$i.parquet")
                    if (!fs.rename(f.getPath, dest) && !fs.exists(dest))
                      throw new java.io.IOException(
                        s"index delta promotion failed: ${f.getPath} -> $dest")
                  }
                name -> fs.listStatus(live)
                  .count(_.getPath.getName.endsWith(".parquet"))
              }
            })
          }
          futures.map(_.get()).collect {
            case (name, n) if compactThreshold > 0 && n >= compactThreshold => name
          }
        } finally pool.shutdown()
      }
    fs.delete(staging, true)
    overThreshold.foreach { name =>
      val live = new org.apache.hadoop.fs.Path(storeDir, name)
      val before = fs.listStatus(live)
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath)
      // sorted by band_key: the compacted file's parquet row-group stats
      // become selective for the probe's band_key join, so a point probe
      // inside a big bucket skips row groups instead of scanning them
      val compacted = spark.read.schema(indexSchema)
        .parquet(before.map(_.toString): _*)
        .dropDuplicates("band", "band_key", "doc_id")
        .coalesce(1)
        .sortWithinPartitions("band_key", "band", "doc_id")
      val cStaging = new org.apache.hadoop.fs.Path(
        indexPath, s".compact-staging-$name-b$batchId")
      compacted.write.mode("overwrite").parquet(cStaging.toString)
      val cFiles = fs.listStatus(cStaging)
        .filter(_.getPath.getName.endsWith(".parquet"))
      cFiles.zipWithIndex.foreach { case (f, i) =>
        val dest = new org.apache.hadoop.fs.Path(live, s"compact-b$batchId-$i.parquet")
        if (!fs.rename(f.getPath, dest) && !fs.exists(dest))
          throw new java.io.IOException(s"compaction promote failed: $dest")
      }
      // crash between promote and these deletes leaves old deltas next to
      // the compacted copy — duplicate ROWS the set-semantic probe absorbs
      // and the next compaction folds. On a same-batchId REPLAY of that
      // crash, `before` includes the prior attempt's compact-b<batchId>-*
      // dest (the rename above then skips as dest-exists): that dest may
      // by then be the bucket's ONLY copy, so it must never be on the
      // delete list — deleting it would silently empty the bucket.
      before.filterNot(_.getName.startsWith(s"compact-b$batchId-"))
        .foreach(fs.delete(_, false))
      fs.delete(cStaging, true)
    }
  }
}
