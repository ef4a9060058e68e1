package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The n-gram language-model scoring kernels behind `doc_lm_surprisal`
  * (add-one unigram LM, the CCNet/Gopher perplexity-filter signal) and
  * `doc_lm_backoff` (bigram stupid backoff, Brants et al. 2007), on the
  * engine's 256ths-of-a-bit integer-log2 lattice — no floating-point
  * logarithm ever crosses the engine boundary, and per-doc Long sums
  * are summation-order-free.
  *
  * Why an operator and not query-local code (VERDICT_r10 next-round
  * #3): the model must be FREEZABLE for at-ingest quality filtering —
  * [[saveModel]] writes the trained vocab/bigram tables (plus the
  * 1-row totals) once, and [[graft.streaming.StreamingLm]] scores
  * arriving micro-batches against that immutable snapshot, exactly the
  * [[Dsir]] / StreamingDsir discipline. The declared batch queries call
  * THESE kernels with their corpus-derived tables, the streaming path
  * calls them with the loaded snapshot — one scoring implementation,
  * so the two paths cannot drift.
  *
  * Scale shape: training is one (or two) corpus-wide hash aggregations
  * with map-side combine; scoring joins the token stream to the model
  * tables on exact string keys (shuffle-joinable at any scale, AQE
  * broadcasts while the vocab fits) and ends in one per-doc combine.
  * A FROZEN model's totals are Long literals, so frozen scoring's only
  * shuffle is that per-doc combine.
  */
object Lm {

  /** Stupid-backoff penalty: log2(1/0.4) ≈ 338/256 bits — the integer
    * constant IS the contract (shared with the doc_lm_backoff oracle).
    */
  val BackoffPenaltyQ = 338L

  /** The interpolated integer log2 on the 2^16 odds scale, as a SQL
    * fragment: s(q) = 256·⌊log2 q⌋ + (256q >> ⌊log2 q⌋) − 256 − 4096.
    * `q` is substituted verbatim (twice) — pass a column reference or a
    * deterministic arithmetic expression.
    */
  def sQSql(q: String): String =
    s"(shiftright($q * 256, cast(length(bin($q)) - 1 as int))" +
      s" + (length(bin($q)) - 1) * 256L - 4352L)"

  /** (doc_id, pos, prev, cur) — the positional token stream both models
    * train and score on (prev is NULL at pos 0). Whitespace tokenizer,
    * shared with the oracles' `string_split_regex(lower(trim(text)))`.
    */
  def tokenStream(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
      .select(col("doc_id"), col("toks"), posexplode(col("toks")))
      .select(col("doc_id"), col("pos"),
        when(col("pos") >= 1, expr("toks[pos - 1]")).as("prev"),
        col("col").as("cur"))

  /** Unigram counts (tok, cnt) from a token stream — one hash agg. */
  def unigrams(rows: DataFrame): DataFrame =
    rows.groupBy(col("cur").as("tok")).agg(count(lit(1)).as("cnt"))

  /** Bigram counts (prev, cur, cnt_bi) from a token stream. */
  def bigrams(rows: DataFrame): DataFrame =
    rows.filter(col("prev").isNotNull)
      .groupBy("prev", "cur").agg(count(lit(1)).as("cnt_bi"))

  /** Per-token add-one surprisal table (tok, s_q) from the unigram
    * counts; `tvSql` is the T + V total as a SQL fragment — a scalar
    * subquery in the batch queries, a Long literal for a frozen model.
    */
  def surprisalTable(uni: DataFrame, tvSql: String): DataFrame =
    uni
      .withColumn("q", expr(s"($tvSql) * 65536 div (cnt + 1)"))
      .withColumn("k", (length(bin(col("q"))) - 1).cast("int"))
      .select(col("tok"),
        (expr("shiftright(q * 256, k)") + col("k") * lit(256L) - lit(4352L))
          .as("s_q"))

  /** A vocabulary at or under this many rows is explicitly broadcast
    * into the scoring join (≈ tens of MB at LM-table row width —
    * executor-safe). Why the caller must decide and not the planner:
    * the vocab table is built by an aggregation over the corpus and
    * then persisted, so Catalyst's size ESTIMATE scales with the
    * corpus (the aggregate inherits its child's stats) and AQE cannot
    * re-plan across the cached relation — measured at gen_sf 10
    * (500k docs, 48-word vocab): the join silently fell to sort-merge
    * and shuffled the full 26M-row token stream for a 48-row model
    * (SCALE_r11 §10). The caller KNOWS the real vocab size after pass
    * 1 (one cache-backed count), which is exactly the statistic the
    * estimate lacks.
    */
  val BroadcastVocabMaxRows = 1000000L

  /** Unigram scoring: join the token stream to the surprisal table,
    * sum per doc. Tokens NOT in the vocab (possible only against a
    * frozen model) pay the add-one unseen surprisal s((T+V)·2^16) —
    * for a model trained on the scored corpus itself the left join
    * never misses and the coalesce is a no-op. `broadcastModel` pins
    * the measured-small-vocab plan (see [[BroadcastVocabMaxRows]]);
    * false = planner's choice (sort-merge at real-vocabulary scale).
    */
  def scoreUnigram(rows: DataFrame, sur: DataFrame,
      tvSql: String, broadcastModel: Boolean = false): DataFrame =
    rows.select(col("doc_id"), col("cur").as("tok"))
      .join(if (broadcastModel) broadcast(sur) else sur, Seq("tok"), "left")
      .withColumn("s_q",
        coalesce(col("s_q"), expr(sQSql(s"(($tvSql) * 65536)"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("s_q")).as("nll_q"))
      .withColumn("ppl_bits_q", expr("nll_q div n_tokens"))
      .select("doc_id", "n_tokens", "nll_q", "ppl_bits_q")

  /** One cache-backed job over a persisted vocab: (T, V, tvSql-literal,
    * broadcast-the-model?). Callers run this AFTER persisting the vocab
    * — the job materializes the cache every downstream consumer reads,
    * the totals become Long LITERALS (no per-consumer scalar-subquery
    * job), and the broadcast decision uses the MEASURED row count the
    * planner's estimate lacks.
    */
  def vocabStats(uni: DataFrame): (Long, Long, String, Boolean) = {
    val r = uni.agg(sum(col("cnt")).as("t"), count(lit(1)).as("v")).head()
    val (t, v) = (if (r.isNullAt(0)) 0L else r.getLong(0), r.getLong(1))
    (t, v, s"${t + v}L", v <= BroadcastVocabMaxRows)
  }

  /** Stupid-backoff scoring: a token after a SEEN (prev, cur) bigram
    * pays the exact conditional surprisal log2(cnt(prev)/cnt(prev,cur));
    * an unseen continuation backs off to the add-one unigram plus the
    * fixed [[BackoffPenaltyQ]]; position 0 scores unigram-only.
    * `broadcastModel` pins the measured-small-vocab plan for the two
    * unigram joins (the [[BroadcastVocabMaxRows]] rationale); the
    * bigram join is left to the planner — that table is vocab²-bounded
    * and corpus-shaped, the regime sort-merge exists for.
    */
  def scoreBackoff(rows: DataFrame, uni: DataFrame, big: DataFrame,
      tvSql: String, broadcastModel: Boolean = false): DataFrame = {
    def hinted(df: DataFrame) = if (broadcastModel) broadcast(df) else df
    rows
      .join(hinted(uni.select(col("tok").as("cur"), col("cnt").as("cnt_cur"))),
        Seq("cur"), "left")
      .join(hinted(uni.select(col("tok").as("prev"), col("cnt").as("cnt_prev"))),
        Seq("prev"), "left")
      .join(big, Seq("prev", "cur"), "left")
      .withColumn("q_uni",
        expr(s"($tvSql) * 65536 div (coalesce(cnt_cur, 0L) + 1)"))
      .withColumn("s_q", expr(
        s"""CASE WHEN cnt_bi IS NOT NULL
              THEN ${sQSql("(cnt_prev * 65536 div cnt_bi)")}
              ELSE (CASE WHEN prev IS NULL THEN 0L ELSE ${BackoffPenaltyQ}L END) + ${sQSql("q_uni")}
            END"""))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("s_q")).as("nll_q"))
      .withColumn("ppl_bits_q", expr("nll_q div n_tokens"))
      .select("doc_id", "n_tokens", "nll_q", "ppl_bits_q")
  }

  // ------------------------------------------------------- frozen model

  /** A frozen LM snapshot: the trained tables plus the totals the
    * smoothed odds divide by, read back as Long literals.
    */
  final case class Snapshot(uni: DataFrame, big: DataFrame, t: Long, v: Long) {
    def tvSql: String = s"${t + v}L"
  }

  /** Freeze a trained model: vocab + bigram tables + the 1-row totals.
    * Immutable once written — at-ingest scoring must not drift with the
    * stream (same contract as [[Dsir.saveWeights]]).
    */
  def saveModel(uni: DataFrame, big: DataFrame, path: String): Unit = {
    uni.coalesce(1).write.mode("overwrite").parquet(s"$path/unigrams")
    big.coalesce(1).write.mode("overwrite").parquet(s"$path/bigrams")
    uni.agg(sum(col("cnt")).as("t"), count(lit(1)).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/totals")
  }

  def loadModel(spark: SparkSession, path: String): Snapshot = {
    val tot = spark.read.parquet(s"$path/totals").head()
    Snapshot(
      spark.read.parquet(s"$path/unigrams"),
      spark.read.parquet(s"$path/bigrams"),
      tot.getLong(0), tot.getLong(1))
  }

  /** Backoff-score docs against a frozen snapshot (the streaming batch
    * kernel): totals are literals, joins against the snapshot tables,
    * one per-doc combine — nothing global.
    */
  def scoreBackoffFrozen(docs: DataFrame, snap: Snapshot): DataFrame =
    scoreBackoff(tokenStream(docs), snap.uni, snap.big, snap.tvSql)

  /** Unigram-score docs against a frozen snapshot. */
  def scoreUnigramFrozen(docs: DataFrame, snap: Snapshot): DataFrame =
    scoreUnigram(tokenStream(docs), surprisalTable(snap.uni, snap.tvSql),
      snap.tvSql)

  /** Contrast-score docs against TWO frozen snapshots (the at-ingest
    * form of `doc_lm_contrast`'s CCNet discipline: general-model bits
    * minus target-model bits, positive ⇒ in-domain). Both scorings are
    * the [[scoreUnigramFrozen]] kernel verbatim — the per-doc outputs
    * join on doc_id, so the contrast of frozen scores equals frozen
    * contrast by construction. Unseen tokens pay each snapshot's own
    * add-one unseen surprisal, exactly as the batch query's live
    * unseen branch does against its in-query target model.
    */
  def scoreContrastFrozen(docs: DataFrame, general: Snapshot,
      target: Snapshot): DataFrame = {
    val g = scoreUnigramFrozen(docs, general)
      .select(col("doc_id"), col("n_tokens"), col("nll_q").as("nll_all_q"))
    val t = scoreUnigramFrozen(docs, target)
      .select(col("doc_id"), col("nll_q").as("nll_tgt_q"))
    g.join(t, "doc_id")
      .withColumn("contrast_bits_q",
        expr("nll_all_q div n_tokens - nll_tgt_q div n_tokens"))
      .select("doc_id", "n_tokens", "nll_all_q", "nll_tgt_q",
        "contrast_bits_q")
  }
}
