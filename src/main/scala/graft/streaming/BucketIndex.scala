package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Shared disk-bucket-index machinery for the streaming near-dup
  * operators ([[StreamingNearDup]] minhash signatures,
  * [[StreamingEmbNearDup]] embedding sketches): an LSM-style
  * bucket-partitioned parquet store built with the
  * [[HamStream.appendIntoStore]] delta discipline — per-batch staged
  * write → idempotent parallel rename promotion → count-and-size-ratio
  * triggered per-bucket compaction (see [[appendDelta]]) that sorts by
  * the probe key so point probes row-group-prune.
  *
  * Crash contract: a replayed batch re-appends under the same batchId
  * (dest-exists renames skip) — duplicate rows, folded by the next
  * compaction. A crash between a compaction's promote and its deletes
  * leaves old deltas next to the compacted copy; on the same-batchId
  * replay the promoted `compact-b<id>-*` dest may be the bucket's ONLY
  * copy, so it is excluded from the delete list (ADVICE_r8 high — the
  * delete would otherwise silently empty the bucket).
  */
private[graft] object BucketIndex {

  /** Layout guard: bucket routing (and any sketch geometry recorded in
    * `layout`) must match between every writer and prober of an index —
    * a mismatched reopen would silently probe the wrong buckets. First
    * touch stamps the marker; later touches must match it exactly.
    */
  def checkLayout(
      fs: org.apache.hadoop.fs.FileSystem,
      storeDir: org.apache.hadoop.fs.Path,
      markerName: String,
      layout: String): Unit = {
    val marker = new org.apache.hadoop.fs.Path(storeDir, markerName)
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val recorded =
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      require(recorded == layout,
        s"index at $storeDir was built with layout '$recorded', " +
          s"opened with '$layout' — bucket/sketch routing would be wrong")
    } else {
      fs.mkdirs(storeDir)
      val out = fs.create(marker, true)
      try out.write(layout.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Append `rows` (must carry a `bucket` partition column plus
    * `dataCols`) as ONE delta file per touched bucket, then fold a
    * bucket into a single deduped file sorted by `sortCols` (first of
    * which should be the probe's pushdown key, so its row-group stats
    * become selective) when BOTH triggers agree:
    *
    *   - file count ≥ `compactThreshold` (the LSM level-0 trigger —
    *     probe cost is per-file, so the count bounds read
    *     amplification), AND
    *   - accumulated delta BYTES ≥ the compacted base's bytes (the
    *     size-ratio trigger: each fold roughly doubles the base, so a
    *     bucket ingesting N bytes rewrites O(N) total instead of the
    *     fixed-count trigger's O(N²/threshold) — the measured ~4 s/batch
    *     rewrite tax that made compaction LOSE the 100-batch
    *     2k-KB-doc production run, 186.1 vs 236.8 docs/s, SCALE_r16 §3).
    *
    * A bucket with no base yet folds on count alone (first fold), and a
    * hard ceiling of 8×`compactThreshold` files folds regardless of the
    * byte ratio so a long tail of tiny deltas behind a big base cannot
    * grow probe amplification unboundedly. At the tiny-doc shape this
    * schedule folds at ~8, 16, 32, … batches (geometric), keeping the
    * file count O(log batches) — still far under the compaction-off
    * leg's linear growth that loses from ~150 batches (SCALE_r15 §4).
    */
  def appendDelta(
      rows: DataFrame,
      dataCols: Seq[String],
      batchId: Long,
      indexPath: String,
      numBuckets: Int,
      compactThreshold: Int,
      schema: StructType,
      dedupCols: Seq[String],
      sortCols: Seq[String],
      fs: org.apache.hadoop.fs.FileSystem,
      storeDir: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = rows.sparkSession
    val staging = new org.apache.hadoop.fs.Path(indexPath, s".staging-delta-$batchId")
    rows.select((dataCols :+ "bucket").map(col): _*)
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
            pool.submit(new java.util.concurrent.Callable[(String, Int, Long, Long)] {
              override def call(): (String, Int, Long, Long) = {
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
                // one post-promotion listing feeds BOTH triggers: the
                // file count and the delta-vs-base byte split (base =
                // prior compact-* output, delta = everything since)
                val files = fs.listStatus(live)
                  .filter(_.getPath.getName.endsWith(".parquet"))
                val (base, delta) =
                  files.partition(_.getPath.getName.startsWith("compact-"))
                (name, files.length,
                  delta.map(_.getLen).sum, base.map(_.getLen).sum)
              }
            })
          }
          futures.map(_.get()).collect {
            case (name, n, deltaBytes, baseBytes)
                if compactThreshold > 0 && n >= compactThreshold &&
                  (baseBytes == 0L || deltaBytes >= baseBytes ||
                    n >= compactThreshold * 8) => name
          }
        } finally pool.shutdown()
      }
    fs.delete(staging, true)
    overThreshold.foreach { name =>
      val live = new org.apache.hadoop.fs.Path(storeDir, name)
      val before = fs.listStatus(live)
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath)
      // sorted by sortCols: the compacted file's parquet row-group stats
      // become selective for the probe's key filter, so a point probe
      // inside a big bucket skips row groups instead of scanning them
      val compacted = spark.read.schema(schema)
        .parquet(before.map(_.toString): _*)
        .dropDuplicates(dedupCols)
        .coalesce(1)
        .sortWithinPartitions(sortCols.map(col): _*)
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
