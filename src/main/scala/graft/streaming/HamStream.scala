package graft.streaming

import graft.core.{GunCell, GunValue, Ham}
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming form of the reference's standing dataflow (SURVEY
  * §3.3): continuous ingest → HAM merge per (soul, field) → update stream
  * for subscribers.
  *
  * One `flatMapGroupsWithState` keyed by (soul, field) holds the current
  * winner plus parked future writes, reproducing:
  *   - HAM resolution per incoming cell (gun/state.go:60-79),
  *   - deferral of conflicting future writes with a processing-time timer
  *     re-applying them when the clock catches up (+100 ms slack,
  *     gun/storage.go:107-117),
  *   - TTL eviction of idle keys (7 h default, gun/gun.go:84-85) via the
  *     same timer mechanism,
  *   - emit-on-transition only (subscribers see each value once — the
  *     per-subscription dedupe of gun/scoped_fetch.go:173-178 falls out).
  *
  * Scale: state is one small record per live (soul, field); the watermark/
  * TTL bound keeps the state store finite. The operator shuffles once on
  * the key — the same partitioning a 1000-executor cluster would use.
  */
object HamStream {

  /** Per-key state: the current winner (if any) + deferred future cells. */
  final case class KeyState(
      value: Option[GunValue],
      state: Option[Double],
      deferred: List[DeferredCell])
  final case class DeferredCell(value: GunValue, state: Double)

  /** An emitted update (what a subscriber receives). */
  final case class Update(soul: String, field: String, value: GunValue, state: Double)

  val DeferSlackMs = 100L

  /** Core state-transition function, factored out for unit testing: applies
    * a batch of cells at machine-time `nowMs`, returning the new state and
    * the emitted updates.
    *
    * Batch semantics (deterministic under shuffle reordering, unlike the
    * reference's arrival-order sequential application): the micro-batch's
    * cells collapse to their HAM winner first, then that winner resolves
    * against the current value — subscribers see the batch's net state
    * transition, which is also the reference's eventual outcome since HAM
    * merge is commutative/associative. Deferral: cells beyond machine-now
    * are parked only when they CONFLICT with an existing value; a
    * never-seen key accepts any state immediately (gun/storage.go:100-117).
    */
  def step(
      key: (String, String),
      cells: Seq[GunCell],
      st: KeyState,
      nowMs: Double,
      ttlMs: Double): (KeyState, Seq[Update]) = {
    var cur: Option[(GunValue, Double)] = st.value.zip(st.state)
    var deferred = st.deferred
    val out = Seq.newBuilder[Update]

    def mergePair(a: (GunValue, Double), b: (GunValue, Double)): (GunValue, Double) =
      if (b._2 > a._2) b
      else if (b._2 < a._2) a
      else if (Ham.byteCompare(
        graft.core.CanonicalJson.encode(a._1),
        graft.core.CanonicalJson.encode(b._1)) < 0) b
      else a

    val (matured, stillDeferred) = deferred.partition(_.state <= nowMs)
    deferred = stillDeferred
    var cands: Seq[(GunValue, Double)] =
      matured.map(d => (d.value, d.state)) ++ cells.map(c => (c.value, c.state))

    // Future cells defer when they CONFLICT with something: an existing
    // value, or a present-time cell for the same key in this very batch
    // (batch order is declared present-before-future — the reference
    // applies sequentially, so the present write would land first and the
    // future one would then hit the conflict path, gun/storage.go:100-117).
    // Only a key with no current value and no present-time cell accepts a
    // future state immediately (never-seen rule).
    val (future, applicable) = cands.partition(_._2 > nowMs)
    if (cur.isDefined || applicable.nonEmpty) {
      deferred = future.map { case (v, s) => DeferredCell(v, s) }.toList ::: deferred
      cands = applicable
    }
    if (cands.nonEmpty) {
      val winner = cands.reduce(mergePair)
      val res = Ham.resolve(cur, winner._1, winner._2, Double.MaxValue /* already filtered */)
      if (res.isImmediateUpdate) {
        cur = Some(winner)
        out += Update(key._1, key._2, winner._1, winner._2)
      }
    }

    // TTL: an idle value older than the retention window is evicted.
    if (cur.exists(_._2 < nowMs - ttlMs)) cur = None

    (KeyState(cur.map(_._1), cur.map(_._2), deferred), out.result())
  }

  /** Wire the state machine into a streaming Dataset of cells. Produces the
    * update stream (one record per net state transition).
    *
    * `timers = true` (production) uses processing-time timers to re-apply
    * matured deferred writes and TTL-evict idle keys even when no new data
    * arrives for them — at the cost of Spark running periodic empty
    * micro-batches. `timers = false` applies deferred/TTL transitions
    * lazily on the key's next incoming cell (useful for tests and for
    * pipelines where a periodic compaction pass handles eviction).
    *
    * `tracking` applies the reference's ingest tracking policy to EVERY
    * received put before it can touch state (gun/gun.go:59-78, 266-286 —
    * the same rule `HamMerge.applyTracking` implements for batch):
    * `TrackingEverything` merges all; `TrackingRequested` drops cells for
    * keys this operator has never seen (state-presence gate — seed the
    * known keys from a store snapshot via `initialStore`); `TrackingNothing`
    * drops everything (wire passthrough, no merge). `initialStore` is
    * HAM-collapsed to one winner per key and loaded as the operator's
    * initial state, so a restart (or a policy gate) starts from the merged
    * store rather than empty — the streaming analogue of the reference
    * answering from storage.
    */
  def updates(
      cells: Dataset[GunCell],
      ttlMs: Double = 7.0 * 3600 * 1000,
      timers: Boolean = true,
      tracking: graft.operators.HamMerge.Tracking =
        graft.operators.HamMerge.TrackingEverything,
      initialStore: Option[Dataset[GunCell]] = None): Dataset[Update] = {
    import graft.operators.HamMerge
    implicit val keyEnc: Encoder[(String, String)] = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val updEnc: Encoder[Update] = Encoders.product[Update]
    implicit val stEnc: Encoder[KeyState] = Encoders.product[KeyState]
    val timeoutConf =
      if (timers) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val fn = (key: (String, String), it: Iterator[GunCell], gs: GroupState[KeyState]) => {
      if (tracking == HamMerge.TrackingNothing) Iterator.empty
      else if (tracking == HamMerge.TrackingRequested && gs.getOption.isEmpty) {
        // never-seen key under the Requested policy: drop without creating
        // state (the reference's onlyIfExists storage put)
        Iterator.empty
      } else {
        val nowMs = gs.getCurrentProcessingTimeMs().toDouble
        val st = gs.getOption.getOrElse(KeyState(None, None, Nil))
        val (newSt, out) = step(key, it.toSeq, st, nowMs, ttlMs)
        if (newSt.value.isEmpty && newSt.deferred.isEmpty) {
          gs.remove()
        } else {
          gs.update(newSt)
          if (timers) {
            // Re-fire when the earliest deferred cell matures (+slack),
            // or at TTL expiry for eviction; floor at 1s to avoid
            // hot-spinning micro-batches.
            val nextDefer = newSt.deferred.map(_.state).minOption
              .map(s => (s - nowMs).toLong + DeferSlackMs)
            val ttlFire = newSt.state.map(s => (s + ttlMs - nowMs).toLong)
            (nextDefer.toSeq ++ ttlFire.toSeq).minOption
              .foreach(ms => gs.setTimeoutDuration(ms max 1000L))
          }
        }
        out.iterator
      }
    }
    val grouped = cells.groupByKey(c => (c.soul, c.field))
    initialStore match {
      case Some(snap) =>
        val init = HamMerge.mergeTyped(snap)
          .groupByKey(c => (c.soul, c.field))
          .mapValues(c => KeyState(Some(c.value), Some(c.state), Nil))
        grouped.flatMapGroupsWithState[KeyState, Update](
          OutputMode.Append(), timeoutConf, init)(fn)
      case None =>
        grouped.flatMapGroupsWithState[KeyState, Update](
          OutputMode.Append(), timeoutConf)(fn)
    }
  }

  /** A subscription = the update stream filtered to one cell — the
    * reference's soul-interest routing (gun/gun.go:299-307): N subscribers
    * share one source and one merge operator.
    */
  def subscribe(updates: Dataset[Update], soul: String, field: String): Dataset[Update] =
    updates.filter(u => u.soul == soul && u.field == field)

  /** Snapshot-then-stream subscription — the reference's `Fetch` contract
    * (gun/scoped_fetch.go:98-110, initial emit at :104-107): a new
    * subscriber first receives the CURRENT local value of the cell (if
    * any), then every subsequent transition. The snapshot side is a point
    * read of the merged store (≤1 row — a legitimate driver-side lookup,
    * same class as Scoped.fetchOne) seeded into a one-shot in-memory
    * stream and unioned with the live subscription, so the result is a
    * single streaming Dataset a sink can consume uniformly. The
    * per-subscription dedupe (gun/scoped_fetch.go:173-178) suppresses a
    * repeated (value, state) pair — in particular the case where the
    * write that produced the snapshot is still in flight on the update
    * stream when the subscription starts. Dedupe state is BOUNDED by a
    * watermark over a timestamp derived from `state` (`dedupeRetention`):
    * transitions older than the watermark age out of the dedupe store
    * instead of accumulating for the life of a standing subscription. The
    * default matches the reference's 7 h storage retention
    * (gun/gun.go:84-85): a watermark narrower than the store TTL would not
    * merely stop deduping a stale-but-winning write — `dropDuplicates`
    * DROPS rows older than the watermark, so a 2 h-stale write that
    * legitimately wins the upstream HAM merge would never reach
    * subscribers. Retention-aligned, delivery matches the store: anything
    * the store still accepts, the subscription still delivers.
    */
  def subscribeWithSnapshot(
      store: Dataset[GunCell],
      updates: Dataset[Update],
      soul: String,
      field: String,
      dedupeRetention: String = "7 hours"): Dataset[Update] = {
    import org.apache.spark.sql.functions.col
    // Column predicates, NOT a typed lambda: a Scala-closure filter would
    // deserialize every store row and defeat Parquet predicate pushdown —
    // at 100× store size the one-cell snapshot becomes a full scan. With
    // col() the (soul, field) equality reaches the scan as PushedFilters.
    val initial = store
      .filter(col("soul") === soul && col("field") === field)
      .limit(1).as[GunCell](Encoders.product[GunCell])
      .collect()
      .map(c => Update(c.soul, c.field, c.value, c.state))
    seedAndSubscribe(initial.toIndexedSeq, updates, soul, field, dedupeRetention)
  }

  /** [[subscribeWithSnapshot]] against an on-disk bucketed store: the
    * snapshot seed is a [[fetchFromStore]] point read — bucket computed up
    * front and pushed as a partition filter, so the initial-value read
    * touches exactly ONE `bucket=N/` directory regardless of store size
    * (SnapshotPruningSpec asserts the single-directory bound).
    */
  def subscribeWithSnapshot(
      storePath: String,
      updates: Dataset[Update],
      soul: String,
      field: String,
      dedupeRetention: String,
      numBuckets: Int): Dataset[Update] = {
    val res = fetchFromStore(updates.sparkSession, storePath, soul, field, numBuckets)
    val initial = (res.value, res.state) match {
      case (Some(v), Some(s)) => Seq(Update(soul, field, v, s))
      case _                  => Seq.empty[Update]
    }
    seedAndSubscribe(initial, updates, soul, field, dedupeRetention)
  }

  /** Union a snapshot seed (≤1 row, via a one-shot MemoryStream) with the
    * live subscription and apply the watermark-bounded per-subscription
    * dedupe — the shared tail of both [[subscribeWithSnapshot]] forms.
    */
  private def seedAndSubscribe(
      initial: Seq[Update],
      updates: Dataset[Update],
      soul: String,
      field: String,
      dedupeRetention: String): Dataset[Update] = {
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    val spark = updates.sparkSession
    implicit val updEnc: Encoder[Update] = Encoders.product[Update]
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Update]
    if (initial.nonEmpty) mem.addData(initial.toIndexedSeq)
    mem.toDS().unionByName(subscribe(updates, soul, field))
      .withColumn("event_ts", timestamp_millis(col("state").cast("long")))
      .withWatermark("event_ts", dedupeRetention)
      .dropDuplicates(Seq("soul", "field", "value", "state", "event_ts"))
      .drop("event_ts")
      .as[Update]
  }

  /** Store bucket id for a cell: xxhash64 over (soul, field) — NOT the
    * soul alone. Soul-only bucketing concentrated every cell of a viral
    * soul (unbounded fields/subscribers on one hot node) into ONE bucket,
    * making that bucket's rewrite O(soul size) on every batch that
    * touches it; hashing the full cell key spreads a hot soul uniformly
    * across buckets (HotSoulSpec measures the bound). The store's only
    * read shapes — point reads ([[fetchFromStore]]) and the per-key HAM
    * merge — are per (soul, field), so every one of them still prunes to
    * exactly one bucket.
    */
  private[streaming] def bucketOf(
      soul: org.apache.spark.sql.Column,
      field: org.apache.spark.sql.Column,
      numBuckets: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    pmod(xxhash64(soul, field), lit(numBuckets.toLong))
  }

  /** Store layout version, stamped as a `_layout` file in the store root.
    * v2 = buckets keyed by xxhash64(soul, field). The round-5 change from
    * soul-only bucketing silently mis-read older stores: point reads pruned
    * to the NEW bucket and reported valueExists=false for cells parked in
    * an old one, and merges left stale duplicate keys in untouched old
    * buckets. Every store entry point now verifies the marker and fails
    * fast on a store written under a different (or unmarked pre-v2)
    * layout — corruption by silent mis-read is strictly worse than an
    * explicit "re-bucket this store" error. (Underscore-prefixed files are
    * invisible to parquet scans, like `_SUCCESS`.)
    */
  val LayoutVersion = "v2"

  /** Verify the store's `_layout` marker, stamping it on stores that have
    * no bucket data yet. Throws [[IllegalStateException]] on a mismatched
    * or missing-but-populated marker. `stamp = false` (read paths) never
    * writes — a read of a pre-v2 store must fail, not quietly re-label it.
    */
  private[streaming] def checkLayout(
      fs: org.apache.hadoop.fs.FileSystem,
      storeDir: org.apache.hadoop.fs.Path,
      stamp: Boolean): Unit = {
    if (!fs.exists(storeDir)) return // first write stamps after the swap
    val marker = new org.apache.hadoop.fs.Path(storeDir, "_layout")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val found =
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      if (found != LayoutVersion) throw new IllegalStateException(
        s"store at $storeDir has layout '$found' but this build reads " +
          s"'$LayoutVersion' — re-bucket the store (read every bucket, " +
          "rewrite through mergeBatchIntoStore against a fresh root) " +
          "instead of letting point reads prune to the wrong bucket")
    } else {
      val hasBuckets = fs.listStatus(storeDir)
        .exists(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      if (hasBuckets) throw new IllegalStateException(
        s"store at $storeDir has bucket data but no _layout marker: it " +
          s"predates layout $LayoutVersion (xxhash64(soul, field) " +
          "bucketing); reading it here would silently miss cells parked " +
          "in soul-only buckets — re-bucket it first")
      else if (stamp) writeLayoutMarker(fs, storeDir)
    }
  }

  private def writeLayoutMarker(
      fs: org.apache.hadoop.fs.FileSystem,
      storeDir: org.apache.hadoop.fs.Path): Unit =
    if (!fs.exists(new org.apache.hadoop.fs.Path(storeDir, "_layout"))) {
      val out = fs.create(new org.apache.hadoop.fs.Path(storeDir, "_layout"), true)
      try out.write(LayoutVersion.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }

  /** Merged-store streaming sink (SURVEY §3.3 output (a)), incremental and
    * bucketed: the store directory is laid out as `bucket=N/` partitions
    * (N = xxhash64(soul, field) mod numBuckets — see [[bucketOf]] for why
    * the full cell key), and each micro-batch
    *   1. computes the buckets its updates touch,
    *   2. reads ONLY those partitions back (partition pruning on the
    *      bucket column — per-batch I/O is proportional to touched
    *      buckets, not store size),
    *   3. HAM-merges them with the batch (per-key state already collapsed
    *      each batch to net winners; HAM idempotence makes at-least-once
    *      replays safe),
    *   4. writes the merged buckets to a staging dir and swaps each bucket
    *      directory into place with the recoverable trash-then-swap
    *      ordering of [[swapBucket]] — no crash point leaves a bucket
    *      permanently absent from the live tree (old data parks in a
    *      `.trash-*` dir that [[recoverStore]], run at every
    *      merge/compact/fetch entry, restores or clears).
    *
    * Missing-store detection is an explicit FileSystem existence check;
    * any OTHER read error (permissions, corruption) propagates — it must
    * fail the batch, not silently restart from an empty store.
    *
    * Write amplification: per-batch I/O is O(touched-bucket DATA) — the
    * right shape when batches concentrate on few buckets, but a batch
    * whose keys spread across all buckets rewrites the whole store
    * (StreamBench measures it). For high-rate ingest prefer
    * [[appendIntoStore]] (LSM delta append, O(batch) I/O) with
    * [[compactStore]] on a cadence.
    */
  def mergeIntoStore(
      updates: Dataset[Update],
      storePath: String,
      numBuckets: Int = 64): org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Update], batchId: Long) =>
        mergeBatchIntoStore(batch, batchId, storePath, numBuckets)
      }
      .start()

  /** One micro-batch of [[mergeIntoStore]], exposed so restart/crash specs
    * (and custom foreachBatch sinks that add their own checkpointing or
    * fault injection) drive the exact production merge body.
    */
  private[graft] def mergeBatchIntoStore(
      batch: Dataset[Update], batchId: Long,
      storePath: String, numBuckets: Int): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    val spark = batch.sparkSession
    val newCells = batch.toDF()
      .select(col("soul"), col("field"), col("value"), col("state"),
        lit(true).as("valueExists"),
        bucketOf(col("soul"), col("field"), numBuckets).as("bucket"))
      .localCheckpoint(true) // materialize once: reused for buckets + merge
    val touched = newCells.select("bucket").distinct()
      .collect().map(_.getLong(0)).sorted
    if (touched.nonEmpty) {
      val hconf = spark.sparkContext.hadoopConfiguration
      val storeDir = new org.apache.hadoop.fs.Path(storePath)
      val fs = storeDir.getFileSystem(hconf)
      checkLayout(fs, storeDir, stamp = true) // fail fast on a pre-v2 store
      recoverStore(fs, storeDir) // heal any interrupted prior swap first
      // "empty" = no bucket data yet (the dir may already hold the marker)
      val hasBuckets = fs.exists(storeDir) && fs.listStatus(storeDir)
        .exists(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      val existing =
        if (!hasBuckets) {
          spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), newCells.schema)
        } else {
          // partition pruning keeps this read to the touched buckets
          spark.read.parquet(storePath)
            .filter(col("bucket").isin(touched: _*))
            .select(newCells.columns.map(col): _*)
        }
      val merged = graft.operators.HamMerge
        .mergeSnapshot(
          existing.drop("bucket").unionByName(newCells.drop("bucket")))
        .withColumn("bucket", bucketOf(col("soul"), col("field"), numBuckets))
      val staging = new org.apache.hadoop.fs.Path(storePath, s".staging-$batchId")
      merged.write.mode("overwrite")
        .partitionBy("bucket").parquet(staging.toString)
      touched.foreach { b =>
        swapBucket(fs, storeDir, s"bucket=$b",
          new org.apache.hadoop.fs.Path(staging, s"bucket=$b"))
      }
      fs.delete(staging, true)
      writeLayoutMarker(fs, storeDir) // idempotent: stamps the first write
    }
  }

  /** DELTA-mode streaming sink — the LSM answer to [[mergeIntoStore]]'s
    * write amplification. The rewrite sink's per-batch cost is
    * O(touched-bucket DATA): a batch whose keys spread across all buckets
    * re-reads and re-writes the whole store (StreamBench measured exactly
    * that — per-batch cost flat in batch size, dominated by the bucket
    * rewrite). This sink appends each micro-batch as immutable
    * `delta-b<batchId>-*.parquet` files inside the bucket directories it
    * touches — per-batch I/O is O(batch), full stop.
    *
    * The read contract changes with it: a delta store may hold SEVERAL
    * rows per (soul, field) — every reader collapses to the HAM winner
    * ([[pointReadDf]] does, and bulk readers go through [[readStore]]),
    * which is exactly the CRDT's own merge, so reads are correct at any
    * compaction lag. [[compactStore]] folds deltas back to one row per
    * key (merge-then-TTL). Crash safety: files land via write-to-staging
    * then one rename each; a crash mid-move leaves some buckets with the
    * delta and some without, and the WAL's at-least-once replay re-appends
    * the batch — duplicate cells are HAM-idempotent, so the store stays
    * correct (just uncompacted). At-least-once + idempotent merge is the
    * same contract the reference's peers rely on.
    */
  def appendIntoStore(
      updates: Dataset[Update],
      storePath: String,
      numBuckets: Int = 64,
      compactThreshold: Int = DefaultCompactThreshold,
      bufferBatches: Int = 1,
      bufferDurable: Boolean = true): org.apache.spark.sql.streaming.StreamingQuery = {
    // A crashed durable-buffered run may have left committed-but-unflushed
    // batches in `.buffer-journal/` — the journal is their ONLY copy (the
    // source WAL was pruned when foreachBatch returned). Replay them
    // regardless of THIS run's buffering config: recovering only on the
    // bufferBatches > 1 branch (the r8 shape) deferred the at-most-once
    // loss to a mere config change (ADVICE_r8 medium).
    recoverBufferJournal(updates.sparkSession, storePath, numBuckets,
      compactThreshold)
    if (bufferBatches <= 1)
      updates.writeStream
        .outputMode("append")
        .foreachBatch { (batch: Dataset[Update], batchId: Long) =>
          appendBatchIntoStore(batch, batchId, storePath, numBuckets, compactThreshold)
        }
        .start()
    else {
      // BUFFERED mode: fold `bufferBatches` micro-batches into one delta
      // write. The per-batch floor of the delta sink is dominated by fixed
      // write-job cost (launch + shuffle + commit), not data volume
      // (SCALE_r6 §1) — amortizing it over N batches raises ingest
      // throughput without changing the store contract.
      //
      // Durability (ADVICE_r7 high): the source's WAL does NOT cover the
      // buffer window — foreachBatch returning commits the batch, and
      // GunSource.commit prunes the WAL journals for that range, so a
      // crash before the flush would lose up to bufferBatches-1 committed
      // micro-batches with an in-memory buffer. Default `bufferDurable`
      // therefore journals each batch to `<store>/.buffer-journal/` BEFORE
      // foreachBatch returns and replays leftovers on the next start
      // ([[recoverBufferJournal]]) — at-least-once, HAM-idempotent.
      // `bufferDurable = false` keeps the journal-free fast path and
      // accepts the documented at-most-once window. A graceful stop
      // flushes the remainder via the termination listener. (Journal
      // recovery ran above, before the branch.)
      val sink = new BufferedDeltaSink(storePath, numBuckets, compactThreshold,
        bufferBatches, durable = bufferDurable)
      val spark = updates.sparkSession
      val q = updates.writeStream
        .outputMode("append")
        .foreachBatch { (batch: Dataset[Update], batchId: Long) =>
          sink.add(batch, batchId)
        }
        .start()
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
          if (e.id == q.id) {
            try sink.flush()
            finally spark.streams.removeListener(this)
          }
      }
      spark.streams.addListener(listener)
      q
    }
  }

  /** The buffered delta sink of [[appendIntoStore]]`(bufferBatches > 1)`:
    * accumulates micro-batches and flushes them as ONE
    * [[appendBatchIntoStore]] call every `flushEvery` batches (and on
    * query termination).
    *
    * `durable = true` (default): each batch is written to
    * `<store>/.buffer-journal/batch-<id>` BEFORE `add` returns. Once
    * foreachBatch returns, Structured Streaming commits the batch and the
    * gun source prunes its WAL for that range (GunSource.commit) — from
    * that moment the journal is the ONLY durable copy until the flush
    * lands it in the store. A crash between adds replays the journal on
    * the next [[appendIntoStore]] start ([[recoverBufferJournal]]);
    * journal dirs are deleted only AFTER the flushed append, so a crash
    * mid-flush re-appends the same cells — HAM-idempotent.
    *
    * `durable = false`: the journal-free fast path — each batch is
    * `localCheckpoint`ed in memory (the micro-batch's source blocks are
    * only valid during its own foreachBatch call, so the buffer must own
    * a materialized copy; blocks release at flush). AT-MOST-ONCE across
    * crashes: up to `flushEvery - 1` committed-but-unflushed batches are
    * lost if the driver dies before the flush. Use only where the
    * upstream can re-send (or the loss window is acceptable).
    */
  final class BufferedDeltaSink(
      storePath: String,
      numBuckets: Int,
      compactThreshold: Int,
      flushEvery: Int,
      durable: Boolean = true) {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Dataset[Update]]
    private val journaled = scala.collection.mutable.ArrayBuffer.empty[String]
    private var lastBatchId = 0L
    @volatile private var sess: SparkSession = _

    def add(batch: Dataset[Update], batchId: Long): Unit = synchronized {
      sess = batch.sparkSession
      if (durable) {
        val dir = journalBatchDir(storePath, batchId)
        // overwrite: a same-batchId redelivery (crash before the streaming
        // checkpoint committed) replaces its own partial journal dir
        batch.toDF().write.mode("overwrite").parquet(dir)
        journaled += dir
      } else {
        buf += batch.localCheckpoint(eager = true)
      }
      lastBatchId = batchId
      if ((if (durable) journaled.length else buf.length) >= flushEvery)
        flushLocked()
    }

    def flush(): Unit = synchronized { flushLocked() }

    private def flushLocked(): Unit =
      if (durable) {
        if (journaled.nonEmpty) {
          val spark = sess
          import spark.implicits._
          val all = spark.read.parquet(journaled.toSeq: _*).as[Update]
          appendBatchIntoStore(all, lastBatchId, storePath, numBuckets,
            compactThreshold)
          // delete AFTER the append: a crash between the two replays the
          // journal on restart; duplicate cells are HAM-idempotent
          val fs = new org.apache.hadoop.fs.Path(storePath)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          journaled.foreach(d =>
            fs.delete(new org.apache.hadoop.fs.Path(d), true))
          journaled.clear()
        }
      } else if (buf.nonEmpty) {
        val all = buf.reduce(_ unionByName _)
        appendBatchIntoStore(all, lastBatchId, storePath, numBuckets, compactThreshold)
        buf.clear()
      }

    /** Batches currently buffered (test/introspection hook). */
    def pending: Int = synchronized(if (durable) journaled.length else buf.length)
  }

  private def journalBatchDir(storePath: String, batchId: Long): String =
    new org.apache.hadoop.fs.Path(storePath,
      s".buffer-journal/batch-$batchId").toString

  /** Replay (or discard) `.buffer-journal` leftovers from a crashed
    * `bufferBatches > 1` run. A journal dir WITH a `_SUCCESS` marker holds
    * a batch whose foreachBatch returned — the streaming checkpoint
    * committed it and the source WAL was pruned, so the journal copy is
    * the only one left: fold it into the store. A dir WITHOUT the marker
    * is a write the crash interrupted BEFORE its batch committed — the
    * source replays that batch on restart, so drop the partial files.
    * Returns the number of batches replayed into the store.
    */
  private[graft] def recoverBufferJournal(
      spark: SparkSession,
      storePath: String,
      numBuckets: Int,
      compactThreshold: Int = DefaultCompactThreshold): Int = {
    val root = new org.apache.hadoop.fs.Path(storePath, ".buffer-journal")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) 0
    else {
      val dirs = fs.listStatus(root).filter(_.isDirectory)
      val (complete, partial) = dirs.partition(d =>
        fs.exists(new org.apache.hadoop.fs.Path(d.getPath, "_SUCCESS")))
      partial.foreach(d => fs.delete(d.getPath, true))
      if (complete.nonEmpty) {
        import spark.implicits._
        val batchId = complete.map(_.getPath.getName.stripPrefix("batch-"))
          .flatMap(_.toLongOption).foldLeft(0L)(_ max _)
        val all = spark.read
          .parquet(complete.map(_.getPath.toString).toIndexedSeq: _*).as[Update]
        appendBatchIntoStore(all, batchId, storePath, numBuckets,
          compactThreshold)
        complete.foreach(d => fs.delete(d.getPath, true))
      }
      complete.length
    }
  }

  /** Delta-file count per bucket above which [[appendBatchIntoStore]]
    * folds the bucket ([[compactBuckets]]). An LSM append path without a
    * compaction trigger degrades unboundedly — every point read collapses
    * ALL of a bucket's deltas through the HAM merge, so read cost grows
    * linearly with uncompacted-file count. The reference's storage layer
    * runs its own maintenance on a cadence (the 5 s purge ticker,
    * gun/storage.go:56-77); here the trigger is count-based (the standard
    * LSM level-0 file-count trigger) so maintenance cost stays proportional
    * to write activity: a bucket is folded only when ITS delta count
    * crosses the threshold, and only that bucket rewrites.
    */
  val DefaultCompactThreshold = 12

  /** One micro-batch of [[appendIntoStore]] (exposed for specs/sinks).
    *
    * `compactThreshold` ≤ 0 disables the auto-trigger (callers owning
    * their own compaction cadence). Auto-triggered folds are FOLD-ONLY
    * (ttl = ∞): TTL expiry is retention policy, owned by the caller's
    * [[compactStore]] cadence, not a side effect of crossing a file-count
    * threshold mid-ingest.
    */
  private[graft] def appendBatchIntoStore(
      batch: Dataset[Update], batchId: Long,
      storePath: String, numBuckets: Int,
      compactThreshold: Int = DefaultCompactThreshold): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    val spark = batch.sparkSession
    val newCells = batch.toDF()
      .select(col("soul"), col("field"), col("value"), col("state"),
        lit(true).as("valueExists"),
        bucketOf(col("soul"), col("field"), numBuckets).as("bucket"))
    val storeDir = new org.apache.hadoop.fs.Path(storePath)
    val fs = storeDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    checkLayout(fs, storeDir, stamp = true)
    recoverStore(fs, storeDir)
    val staging = new org.apache.hadoop.fs.Path(storePath, s".staging-delta-$batchId")
    // hash-repartition on the bucket column first: each bucket's rows land
    // in exactly one task, so a batch adds ONE delta file per touched
    // bucket (not files-per-task×bucket) — 4-8× slower file-count growth
    // between compactions for one small-batch shuffle. Task count is
    // capped at numBuckets (more tasks than buckets is pure launch
    // overhead on the per-batch floor).
    newCells.repartition(numBuckets min newCells.sparkSession.sessionState.conf.numShufflePartitions, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(staging.toString)
    // Promote staged delta files into the live bucket dirs IN PARALLEL: a
    // sequential driver loop serializes one rename RPC per touched bucket
    // (thousands of NameNode round-trips per batch at a 100k-bucket
    // production store). Hadoop FileSystem instances are thread-safe; a
    // bounded pool turns the promotion into max(RPC latency) instead of
    // sum(RPC latency). Each task returns the bucket's post-promotion
    // delta-file count so the compaction trigger needs no extra listing.
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
                    val dest =
                      new org.apache.hadoop.fs.Path(live, s"delta-b$batchId-$i.parquet")
                    // rename signals failure by returning FALSE, not by
                    // throwing. dest-already-exists is the same-batchId WAL
                    // replay (the delta landed on the previous attempt) —
                    // benign, HAM-idempotent. Any OTHER false must FAIL the
                    // batch so the checkpoint doesn't commit a batch whose
                    // cells never reached the store.
                    if (!fs.rename(f.getPath, dest) && !fs.exists(dest))
                      throw new java.io.IOException(
                        s"delta promotion rename failed: ${f.getPath} -> $dest")
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
    writeLayoutMarker(fs, storeDir)
    if (overThreshold.nonEmpty)
      compactBuckets(spark, storePath, overThreshold.toSeq,
        nowMs = 0.0, ttlMs = Double.PositiveInfinity,
        stagingName = s".compact-staging-b$batchId")
  }

  /** Bulk read of a store as its MERGED view — one HAM winner per
    * (soul, field) regardless of sink mode (a rewrite store is already
    * collapsed; a delta store collapses here). The merge is one hash
    * aggregation over the scan — partition pruning and filter pushdown
    * still apply to predicates a caller adds BEFORE calling (prefer
    * [[fetchFromStore]] for point reads: it prunes to one bucket first).
    */
  def readStore(
      spark: org.apache.spark.sql.SparkSession,
      storePath: String,
      numBuckets: Int = 64): org.apache.spark.sql.DataFrame = {
    val storeDir = new org.apache.hadoop.fs.Path(storePath)
    val fs = storeDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    checkLayout(fs, storeDir, stamp = false)
    recoverStore(fs, storeDir)
    // heal a crashed buffered run's leftovers too: the journal holds
    // committed batches no other copy has, and a reader must see them
    // (no-op when `.buffer-journal` is absent — i.e. always, outside a
    // crashed bufferDurable run; numBuckets routes the replayed cells)
    recoverBufferJournal(spark, storePath, numBuckets)
    graft.operators.HamMerge.mergeSnapshot(
      spark.read.parquet(storePath).drop("bucket"))
  }

  /** Swap a staged bucket directory into the live tree with a RECOVERABLE
    * ordering (the delete-before-rename of the round-2 version had a crash
    * window that left a bucket absent with no repair path):
    *   1. rename live → `.trash-bucket=N` (old data parked, not deleted),
    *   2. rename staged → live,
    *   3. delete the trash copy.
    * A crash after (1) leaves the old data in the trash dir;
    * [[recoverStore]] — run at every merge/compact/fetch entry — renames
    * it back, so every crash point leaves the bucket readable with either
    * the old or the new data, never neither. Dot-prefixed trash/staging
    * dirs are invisible to parquet reads (Hadoop's hidden-file filter), so
    * an in-flight swap never double-counts.
    */
  private[streaming] def swapBucket(
      fs: org.apache.hadoop.fs.FileSystem,
      storeDir: org.apache.hadoop.fs.Path,
      bucketName: String,
      staged: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(staged)) return
    val live = new org.apache.hadoop.fs.Path(storeDir, bucketName)
    val trash = new org.apache.hadoop.fs.Path(storeDir, s".trash-$bucketName")
    if (fs.exists(trash)) fs.delete(trash, true) // leftover from a healed swap
    if (fs.exists(live)) fs.rename(live, trash)
    fs.rename(staged, live)
    if (fs.exists(trash)) fs.delete(trash, true)
  }

  /** Heal an interrupted [[swapBucket]]: for every `.trash-bucket=N` dir,
    * restore it as the live bucket if the live dir is absent (crash landed
    * between the two renames), or drop it if the swap completed (crash
    * landed before the final delete). Idempotent and cheap (one directory
    * listing); called at the entry of every store operation.
    */
  def recoverStore(
      fs: org.apache.hadoop.fs.FileSystem,
      storeDir: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(storeDir)) return
    fs.listStatus(storeDir).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith(".trash-bucket=")) {
        val live = new org.apache.hadoop.fs.Path(storeDir, n.stripPrefix(".trash-"))
        if (!fs.exists(live)) fs.rename(s.getPath, live)
        else fs.delete(s.getPath, true)
      }
    }
  }

  /** Point read against a bucketed store — the read-side complement of
    * [[mergeIntoStore]]: the bucket is computed from the soul up front
    * and pushed as a partition filter, so the scan touches exactly ONE
    * `bucket=N/` directory regardless of store size (reference
    * storage-get semantics, gun/storage.go:79-89: absent ⇒ exists=false,
    * not an error). At 100 TB this is the difference between a point
    * read costing one file group and costing a full-store scan.
    */
  def fetchFromStore(
      spark: org.apache.spark.sql.SparkSession,
      storePath: String,
      soul: String,
      field: String,
      numBuckets: Int = 64): graft.core.FetchResult = {
    val rows = pointReadDf(spark, storePath, soul, field, numBuckets)
      .limit(1).collect()
    rows.headOption match {
      case None => graft.core.FetchResult(field, None, None, valueExists = false)
      case Some(r) =>
        val v = graft.core.GunValue(r.getString(0), Option(r.getString(1)),
          Option(r.getString(2)),
          if (r.isNullAt(3)) None else Some(r.getBoolean(3)), Option(r.getString(4)))
        graft.core.FetchResult(field, Some(v), Some(r.getDouble(5)), r.getBoolean(6))
    }
  }

  /** The point read's scan, exposed un-collected so specs can execute it
    * and assert the partition-pruning bound on the PRODUCTION plan (scan
    * metrics `numPartitions`/`numFiles` after execution — see
    * SnapshotPruningSpec) rather than on a replica of it.
    */
  private[graft] def pointReadDf(
      spark: org.apache.spark.sql.SparkSession,
      storePath: String,
      soul: String,
      field: String,
      numBuckets: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val storeDir = new org.apache.hadoop.fs.Path(storePath)
    val fs = storeDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    checkLayout(fs, storeDir, stamp = false) // a pre-v2 store must error, not miss
    recoverStore(fs, storeDir) // one listStatus; heals a crash-interrupted swap before reading
    recoverBufferJournal(spark, storePath, numBuckets) // one fs.exists when no journal; a reader must see journaled-only cells
    val bucket = spark.range(1)
      .select(bucketOf(lit(soul), lit(field), numBuckets))
      .head().getLong(0)
    val pruned = spark.read.parquet(storePath)
      .filter(col("bucket") === bucket) // partition-pruned to one dir
      .filter(col("soul") === soul && col("field") === field)
      .drop("bucket")
    // a DELTA store ([[appendIntoStore]]) holds one row per append for the
    // key — collapse to the HAM winner; on a rewrite store this aggregates
    // the single matching row (same plan shape, the scan still prunes)
    graft.operators.HamMerge.mergeSnapshot(pruned)
      .select("value.kind", "value.str", "value.num", "value.bool", "value.rel",
        "state", "valueExists")
  }

  /** TTL compaction of a bucketed store — the reference's periodic purge
    * tick (5 s scan dropping cells older than the retention window,
    * gun/storage.go:56-75; 7 h default gun/gun.go:84-85) as a batch job
    * run on the compaction cadence. Cells with `state < nowMs - ttlMs`
    * are dropped; surviving buckets rewrite via the same staging +
    * recoverable [[swapBucket]] ordering as [[mergeIntoStore]]; buckets
    * left fully expired are removed outright (an intentional delete, not a
    * swap-crash window).
    */
  def compactStore(
      spark: org.apache.spark.sql.SparkSession,
      storePath: String,
      nowMs: Double,
      ttlMs: Double = graft.operators.HamMerge.DefaultTtlMs): Unit = {
    val storeDir = new org.apache.hadoop.fs.Path(storePath)
    val fs = storeDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(storeDir)) return
    checkLayout(fs, storeDir, stamp = false)
    recoverStore(fs, storeDir)
    val liveBuckets = fs.listStatus(storeDir)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .map(_.getPath.getName)
    if (liveBuckets.isEmpty) return
    compactBuckets(spark, storePath, liveBuckets.toSeq, nowMs, ttlMs,
      stagingName = ".compact-staging")
  }

  /** Fold a SUBSET of buckets back to one row per (soul, field) —
    * merge-then-TTL, the shared body of [[compactStore]] (whole store, the
    * caller's retention cadence) and [[appendBatchIntoStore]]'s auto
    * trigger (only the buckets whose delta count crossed the threshold,
    * ttl = ∞).
    *
    * merge-then-TTL: collapse delta rows to their HAM winner FIRST, then
    * drop expired winners — an expired winner must not resurrect a
    * stale-but-in-window loser (reference purge drops the cell outright,
    * gun/storage.go:56-75). On a rewrite store the merge is a no-op
    * pass-through (already one row per key). `bucket` is functionally
    * determined by the key, so it passes through the merge as a group key.
    * The scan is partition-pruned to the requested buckets, so per-fold
    * I/O is O(folded-bucket data), not O(store); surviving buckets rewrite
    * via the recoverable [[swapBucket]] ordering, fully-expired buckets
    * are removed outright (an intentional delete, not a swap-crash
    * window).
    */
  private[streaming] def compactBuckets(
      spark: org.apache.spark.sql.SparkSession,
      storePath: String,
      bucketNames: Seq[String],
      nowMs: Double,
      ttlMs: Double,
      stagingName: String): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    val storeDir = new org.apache.hadoop.fs.Path(storePath)
    val fs = storeDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids = bucketNames.map(_.stripPrefix("bucket=").toLong)
    val kept = graft.operators.HamMerge
      .mergeSnapshot(
        spark.read.parquet(storePath).filter(col("bucket").isin(ids: _*)),
        passThrough = Seq("bucket"))
      .filter(col("state") >= lit(nowMs - ttlMs))
    val staging = new org.apache.hadoop.fs.Path(storePath, stagingName)
    // one task per folded bucket: the fold must not RAISE the bucket's
    // file count (a 32-task write of 3 buckets would)
    kept.repartition(ids.length, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(staging.toString)
    bucketNames.foreach { name =>
      val next = new org.apache.hadoop.fs.Path(staging, name)
      if (fs.exists(next)) swapBucket(fs, storeDir, name, next)
      else fs.delete(new org.apache.hadoop.fs.Path(storeDir, name), true) // fully expired
    }
    fs.delete(staging, true)
  }
}
