package graft.streaming

import java.nio.file.Files

import graft.SparkSuite
import graft.operators.{Lm, Pii}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

final case class PDoc(doc_id: Long, text: String)

/** The at-ingest composed pipeline: every stage's semantics visible in
  * one flow (scrub before everything, quality gate against the FROZEN
  * threshold, first-arrival-wins dedup across batches), stream output
  * equal to the batch-kernel equivalent, and replay idempotent across
  * the crash window between the two per-batch writes.
  */
class StreamingPipelineSpec extends SparkSuite {
  import spark.implicits._

  // curated training corpus: common alpha/beta vocabulary, an email
  // (so the scrubbed "<email>" token is IN the frozen vocab), and a
  // rare singleton pulling the mean-bits threshold up
  private val corpus = Seq(
    PDoc(1L, "alpha beta alpha beta alpha beta"),
    PDoc(2L, "alpha beta gamma alpha admin@example.com gamma"),
    PDoc(3L, "omega"))

  // batch A: keeper, garbage, in-batch dup of the keeper, PII keeper;
  // batch B: cross-batch dup of the keeper, fresh keeper
  private val batchA = Seq(
    PDoc(10L, "alpha beta alpha beta"),
    PDoc(11L, "zzz yyy xxx www zzz"),
    PDoc(12L, "alpha beta alpha beta"),
    PDoc(13L, "alpha beta alpha admin@test.org"))
  private val batchB = Seq(
    PDoc(20L, "alpha beta alpha beta"),
    PDoc(21L, "beta alpha beta alpha beta"))

  /** The batch-kernel equivalent of the whole flow over ALL arriving
    * docs (global first-wins = lowest doc_id — arrival order and id
    * order coincide here by construction).
    */
  private def batchEquivalent(model: String): Set[(Long, Long, Long)] = {
    val scrubbed = (batchA ++ batchB).toDF()
      .select(col("doc_id"), Pii.scrub(col("text")).as("text"))
    val snap = Lm.loadModel(spark, model)
    val th = spark.read.parquet(s"$model/threshold").head().getLong(0)
    val w = Window.partitionBy(col("key_hash")).orderBy(col("doc_id"))
    Lm.scoreUnigramFrozen(scrubbed, snap)
      .filter(col("ppl_bits_q") <= th)
      .join(scrubbed, "doc_id")
      .withColumn("key_hash", md5(substring(lower(col("text")), 1, 64)))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("doc_id", "n_tokens", "ppl_bits_q")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("stream equals batch kernels; stages compose; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("spipe").toString
    val (model, out, keys) = (s"$base/model", s"$base/out", s"$base/keys")
    StreamingPipeline.trainAndFreeze(corpus.toDF(), model)

    val in = MemoryStream[PDoc]
    // small bucket count + aggressive compaction so the LSM fold runs
    // WITHIN this test, not just in theory
    val q = StreamingPipeline.start(in.toDF(), model, out, keys,
      s"$base/ckpt", numBuckets = 8, compactThreshold = 2)
    try {
      in.addData(batchA: _*); q.processAllAvailable()
      in.addData(batchB: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamingPipeline.readOut(spark, out)
    val ids = streamed.select("doc_id").as[Long].collect().toSet
    // quality gate dropped the garbage, dedup dropped BOTH dup arrivals
    assert(ids == Set(10L, 13L, 21L), s"unexpected survivors: $ids")
    // the PII doc survived WITH redaction (scrub ran before everything)
    val piiText = streamed.filter(col("doc_id") === 13L)
      .select("text").as[String].head()
    assert(piiText.contains("<EMAIL>") && !piiText.contains("@test.org"))

    // stream == the batch-kernel equivalent, value for value
    val got = streamed.select("doc_id", "n_tokens", "ppl_bits_q")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batchEquivalent(model),
      s"stream/batch divergence: $got vs ${batchEquivalent(model)}")

    // replay world (b): output committed, checkpoint lost — the batch
    // replays under the same id twice; the committed survivors are
    // authoritative and the key re-append is file-level idempotent
    StreamingPipeline.processBatch(batchB.toDF(), 1L, model, out, keys,
      numBuckets = 8, compactThreshold = 2)
    StreamingPipeline.processBatch(batchB.toDF(), 1L, model, out, keys,
      numBuckets = 8, compactThreshold = 2)
    val afterReplay = StreamingPipeline.readOut(spark, out)
      .select("doc_id").as[Long].collect().toSet
    assert(afterReplay == Set(10L, 13L, 21L),
      s"replay changed the output: $afterReplay")

    // the worst window: outputs committed but the ENTIRE key index lost
    // (crash between commit and append, every batch). Replaying both
    // ids must leave the outputs untouched and rebuild the index whole —
    // proven by a NEW batch whose dup of doc 10 is still dropped.
    val fs = new org.apache.hadoop.fs.Path(keys)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(keys), true)
    StreamingPipeline.processBatch(batchA.toDF(), 0L, model, out, keys,
      numBuckets = 8, compactThreshold = 2)
    StreamingPipeline.processBatch(batchB.toDF(), 1L, model, out, keys,
      numBuckets = 8, compactThreshold = 2)
    val batchC = Seq(
      PDoc(30L, "alpha beta alpha beta"),   // dup of doc 10 — must drop
      PDoc(31L, "alpha alpha beta alpha"))  // fresh — must survive
    StreamingPipeline.processBatch(batchC.toDF(), 2L, model, out, keys,
      numBuckets = 8, compactThreshold = 2)
    val finalIds = StreamingPipeline.readOut(spark, out)
      .select("doc_id").as[Long].collect().toSet
    assert(finalIds == Set(10L, 13L, 21L, 31L),
      s"rebuilt index missed history: $finalIds")
  }
}
