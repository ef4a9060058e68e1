package graft.streaming

import graft.operators.{Lm, Pii}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The COMPOSED curation pipeline at ingest — the streaming twin of the
  * declared `doc_pipeline_e2e` query. Per arriving micro-batch:
  *
  *   1. PII scrub ([[Pii.scrub]] — the same one-definition patterns as
  *      the batch query; downstream stages see only scrubbed text);
  *   2. LM quality filter against a FROZEN snapshot ([[Lm]] unigram
  *      kernel; keep docs at or below the snapshot's bits-per-token
  *      threshold — trained once by [[trainAndFreeze]], immutable
  *      thereafter: a quality gate that drifted with the stream would
  *      let early garbage raise the bar for later good data);
  *   3. exact near-dup dedup against ALL HISTORY: the normalized
  *      64-char-prefix key of the batch query, first-arrival-wins —
  *      within a batch the lowest doc_id, across batches an anti-join
  *      on the on-disk key index written by prior batches;
  *   4. survivors appended under `out/batch=<id>` and their keys under
  *      `keys/batch=<id>`.
  *
  * Driver state across batches: NONE — the key index on disk IS the
  * dedup state (the [[StreamingNearDup]] discipline). Crash story:
  * both per-batch directories are overwritten WHOLE under the SAME
  * batch id on replay, and the history anti-join reads only batches
  * `< id`, so a driver kill anywhere between the two writes and the
  * checkpoint commit converges to exactly-once output — replay cannot
  * self-dedupe against its own failed attempt, double a survivor, or
  * resurrect a dropped one.
  *
  * Scale shape per batch: scrub + scoring are map-side against
  * broadcast snapshot tables; the only corpus-history work is ONE
  * equi-anti-join of the batch's ≤|batch| distinct keys against the
  * key index — shuffle-joinable at any history size, and the index is
  * a parquet directory a compactor can bucket/sort like the delta
  * store's (the key column is the natural partition key).
  */
object StreamingPipeline {

  /** Train the quality model on a curated corpus and freeze it:
    * [[Lm.saveModel]] (vocab + totals) plus the keep threshold — the
    * corpus mean bits-per-token, the same scalar-subquery rule as
    * `doc_pipeline_e2e` — as a 1-row parquet. Training runs on
    * SCRUBBED text, matching what the stream is scored on.
    */
  def trainAndFreeze(corpus: DataFrame, modelPath: String): Unit = {
    val clean = corpus.select(col("doc_id"), Pii.scrub(col("text")).as("text"))
    val rows = Lm.tokenStream(clean)
    val uni = Lm.unigrams(rows)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Lm.saveModel(uni, Lm.bigrams(rows), modelPath)
    val snap = Lm.loadModel(corpus.sparkSession, modelPath)
    Lm.scoreUnigram(rows, Lm.surprisalTable(snap.uni, snap.tvSql), snap.tvSql)
      .agg((sum(col("nll_q")) / sum(col("n_tokens"))).cast("long").as("th"))
      .coalesce(1).write.mode("overwrite").parquet(s"$modelPath/threshold")
    uni.unpersist(blocking = false)
  }

  def start(
      docs: DataFrame,
      modelPath: String,
      outPath: String,
      keysPath: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          processBatch(batch, batchId, modelPath, outPath, keysPath)
      }
      .start()

  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      modelPath: String, outPath: String, keysPath: String): Unit = {
    val spark = batch.sparkSession
    val scrubbed = batch
      .select(col("doc_id"), Pii.scrub(col("text")).as("text"))
    val snap = Lm.loadModel(spark, modelPath)
    val threshold =
      spark.read.parquet(s"$modelPath/threshold").head().getLong(0)
    val kept = Lm.scoreUnigramFrozen(scrubbed, snap)
      .filter(col("ppl_bits_q") <= threshold)
      .join(scrubbed, "doc_id")
      .withColumn("key_hash", md5(substring(lower(col("text")), 1, 64)))
    // first-arrival-wins: lowest doc_id within the batch…
    val w = Window.partitionBy(col("key_hash")).orderBy(col("doc_id"))
    val firstHere = kept.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    // …then anti-join the history (batches strictly before this id —
    // NOT this id's own failed attempt, or replay would emit nothing)
    val fresh = firstHere
      .join(priorKeys(spark, keysPath, batchId), Seq("key_hash"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fresh.select("doc_id", "text", "n_tokens", "ppl_bits_q")
      .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
    fresh.select("key_hash")
      .write.mode("overwrite").parquet(s"$keysPath/batch=$batchId")
    fresh.unpersist(blocking = false)
  }

  /** Key sets of every batch strictly before `batchId` (empty DF when
    * none): directory listing, not driver state — replay-safe.
    */
  private def priorKeys(spark: SparkSession, keysPath: String,
      batchId: Long): DataFrame = {
    val root = new Path(keysPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (!fs.exists(root)) Array.empty[String]
      else fs.listStatus(root).map(_.getPath)
        .filter(p => p.getName.startsWith("batch="))
        .filter(p => p.getName.stripPrefix("batch=").toLong < batchId)
        .map(_.toString)
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("key_hash", StringType))))
    else spark.read.parquet(dirs.toIndexedSeq: _*)
  }

  /** Everything curated so far; `batch` comes back as a partition col. */
  def readOut(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(outPath)
}
