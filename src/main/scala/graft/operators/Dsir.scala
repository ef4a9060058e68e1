package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR importance-resampling weights (Xie et al., "Data Selection for
  * Language Models via Importance Resampling", 2023) over hashed bigram
  * features, on the engine's 256ths-of-a-bit integer-log2 lattice.
  *
  * The defining scale property is the HASHED feature space: both the
  * raw-corpus and target-domain distributions live in a fixed
  * [[Buckets]]-bucket table regardless of corpus size, so the model is
  * one B-row aggregate, the per-bucket weight table is always
  * broadcastable, and scoring shuffles nothing wider than the per-doc
  * combine. That also makes the model FREEZABLE: [[saveWeights]] writes
  * the B-row weight table once and [[StreamingDsir]]-style consumers
  * score arriving documents map-side against the frozen snapshot.
  *
  * Shared verbatim by the declared `doc_dsir_weights` query (whose
  * DuckDB oracle replays the identical lattice) and the streaming
  * scorer, so the two paths cannot drift.
  */
object Dsir {

  /** Fixed hashed-feature space size (4096 keeps the model tables
    * broadcast-trivial at ANY corpus scale — that is DSIR's point).
    */
  val Buckets = 4096L

  /** (doc_id, source, bucket) — one row per bigram occurrence, bucket =
    * 60-bit md5 hash of the space-joined bigram mod [[Buckets]] (the
    * repo-standard cross-engine hash).
    */
  def bigramBuckets(docs: DataFrame): DataFrame = {
    val h = (c: org.apache.spark.sql.Column) =>
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    docs
      .select(col("doc_id"), col("source"),
        split(lower(trim(col("text"))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", slice(col("toks"), i, lit(2))))).as("gram"))
      .withColumn("bucket", h(col("gram")) % Buckets)
  }

  /** Both distributions from ONE B-row aggregation: (bucket, cnt_r,
    * cnt_t), target counted as a conditional sum.
    */
  def model(grams: DataFrame, targetSource: String): DataFrame =
    grams.groupBy("bucket")
      .agg(count(lit(1)).as("cnt_r"),
        sum(when(col("source") === targetSource, 1L).otherwise(0L)).as("cnt_t"))

  /** Per-bucket log2 importance weight (B rows):
    * dw_q = s_raw(b) − s_tgt(b), s_x the interpolated integer log2 of
    * the add-one-smoothed odds q_x = (T_x + B)·2^16 DIV (cnt_x + 1).
    * Long headroom: 256·q ≤ (T_x + B)·2^24 — exact through ~5·10^11
    * corpus tokens per job.
    */
  def weights(model: DataFrame): DataFrame = {
    // The global totals enter as SCALAR SUBQUERIES over the model view,
    // not a 1-row crossJoin(broadcast(...)): the subquery executes once
    // as its own tiny job and the result is inlined into the projection,
    // so the weight plan carries no nested-loop join at all
    // (PlanHygieneSpec's zero-BNLJ invariant holds without an allowlist
    // entry). Two subqueries = two scans of the model plan — B rows when
    // the caller persists it (the declared query does); callers building
    // the model inline should persist first.
    model.createOrReplaceTempView("graft_dsir_model")
    val sQ = (q: String) =>
      s"(shiftright($q * 256, cast(length(bin($q)) - 1 as int))" +
        s" + (length(bin($q)) - 1) * 256L - 4352L)"
    model
      .withColumn("tr", expr("(select sum(cnt_r) from graft_dsir_model)"))
      .withColumn("tt", expr("(select sum(cnt_t) from graft_dsir_model)"))
      .withColumn("qr", expr(s"(tr + $Buckets) * 65536 div (cnt_r + 1)"))
      .withColumn("qt", expr(s"(tt + $Buckets) * 65536 div (cnt_t + 1)"))
      .select(col("bucket"), expr(s"${sQ("qr")} - ${sQ("qt")}").as("dw_q"))
  }

  /** Score docs against a weight table: (doc_id, n_bigrams, logw_q).
    * The weight table is ≤ B rows by construction, so the join is a
    * FORCED broadcast and the only shuffle is the per-doc combine.
    */
  def score(docs: DataFrame, weights: DataFrame): DataFrame =
    bigramBuckets(docs).join(broadcast(weights), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("dw_q")).as("logw_q"))
      .select("doc_id", "n_bigrams", "logw_q")

  /** Freeze the weight table on disk (B rows, one file). */
  def saveWeights(weights: DataFrame, path: String): Unit =
    weights.coalesce(1).write.mode("overwrite").parquet(path)

  def loadWeights(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
