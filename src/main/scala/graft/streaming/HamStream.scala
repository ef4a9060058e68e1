package graft.streaming

import graft.core.{GunCell, GunValue, Ham}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
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

    if (cur.isDefined) {
      val (future, applicable) = cands.partition(_._2 > nowMs)
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
    */
  def updates(
      cells: Dataset[GunCell],
      ttlMs: Double = 7.0 * 3600 * 1000,
      timers: Boolean = true): Dataset[Update] = {
    implicit val keyEnc: Encoder[(String, String)] = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val updEnc: Encoder[Update] = Encoders.product[Update]
    implicit val stEnc: Encoder[KeyState] = Encoders.product[KeyState]
    val timeoutConf =
      if (timers) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    cells
      .groupByKey(c => (c.soul, c.field))
      .flatMapGroupsWithState[KeyState, Update](OutputMode.Append(), timeoutConf) {
        (key: (String, String), it: Iterator[GunCell], gs: GroupState[KeyState]) =>
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

  /** A subscription = the update stream filtered to one cell — the
    * reference's soul-interest routing (gun/gun.go:299-307): N subscribers
    * share one source and one merge operator.
    */
  def subscribe(updates: Dataset[Update], soul: String, field: String): Dataset[Update] =
    updates.filter(u => u.soul == soul && u.field == field)

  /** Merged-store sink (SURVEY §3.3 output (a)): each micro-batch of
    * updates HAM-merges into a parquet cell store via foreachBatch. The
    * per-key state machine already collapsed each batch to net winners, so
    * the merge below is a plain snapshot re-merge; HAM idempotence makes
    * at-least-once replays safe. At scale the store directory would be
    * bucketed by soul and compacted on the TTL cadence (SCALE.md).
    */
  def mergeIntoStore(
      updates: Dataset[Update],
      storePath: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions.{col, lit}
    updates.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Update], _: Long) =>
        val spark = batch.sparkSession
        val newCells = batch.toDF()
          .select(col("soul"), col("field"), col("value"), col("state"),
            lit(true).as("valueExists"))
        val existing =
          try spark.read.parquet(storePath)
          catch { case _: Exception => spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](),
            newCells.schema) }
        val merged = graft.operators.HamMerge
          .mergeSnapshot(existing.unionByName(newCells))
          .localCheckpoint(true) // cut lineage before overwriting the source dir
        merged.write.mode("overwrite").parquet(storePath)
        ()
      }
      .start()
  }
}
