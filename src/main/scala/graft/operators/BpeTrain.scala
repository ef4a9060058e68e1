package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merges TRAINING — the other half of the tokenizer
  * pipeline next to [[graft.functions.Bpe]]'s encode: learn the top-K
  * merge rules from the corpus by iterative pair counting (Sennrich et
  * al. 2016, the GPT-2-style vocabulary build):
  *
  *   repeat K times:
  *     1. count adjacent symbol pairs across all words (weighted by
  *        word frequency),
  *     2. take the argmax — deterministic tiebreak (count DESC, then
  *        left ASC, right ASC),
  *     3. re-segment every word by that merge (greedy leftmost
  *        non-overlapping), and record the rule.
  *
  * Scale shape: the loop runs over the DISTINCT-WORD table, not the
  * corpus — the one corpus-sized shuffle is the word count up front
  * (map-side combined hash agg). At 100 TB the corpus may be ~10¹¹
  * words but the distinct-word state is orders smaller and bounded by
  * vocabulary, and each iteration is one map (re-segment) + one
  * hash-agg shuffle of (pair, count) rows + a single-row TakeOrdered
  * to the driver — K iterations move K driver rows, never data. The
  * re-segment fold runs in `mapPartitions` (tight per-row loop over
  * char arrays — the same kernel-shape call as the encode memo).
  *
  * The leftmost-greedy single-rule pass is a plain left fold: merge
  * when (last(acc), cur) == (l, r). The merged symbol `l+r` is strictly
  * longer than `l`, so it can never re-match as the left side within
  * the same pass — the fold IS the non-overlapping leftmost semantics
  * ("aaa" + (a,a) → ["aa","a"]).
  *
  * Consistency contract (asserted in BpeTrainSpec): greedily ENCODING a
  * training word against the learned ranked table reproduces the final
  * training segmentation — the property that makes the learned table a
  * drop-in for [[graft.functions.Bpe.encodeWith]].
  */
object BpeTrain {

  /** One learned rule: `merge_rank` is 1-based priority order. */
  final case class Merge(merge_rank: Long, lhs: String, rhs: String,
      pair_count: Long)

  private[graft] final case class Seg(syms: Seq[String], cnt: Long)

  /** One greedy leftmost non-overlapping pass of rule (l, r). */
  private[graft] def mergePass(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i + 1 < n && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn up to `k` merges from `words` (columns `w`: String,
    * `cnt`: Long — one row per distinct word). Stops early if the
    * corpus runs out of adjacent pairs. Returns (merge_rank, lhs, rhs,
    * pair_count) in rank order.
    */
  def train(spark: SparkSession, words: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    // single-symbol words can never pair again — drop them as they arise.
    // Eager localCheckpoint (not persist): persist cuts RDD recompute but
    // NOT logical-plan lineage, and at k ≳ 100 the nested plan tree grew
    // deep enough that merely formatting it for an AQE log line OOMed the
    // driver (measured, SCALE_r10) — checkpointing truncates the plan the
    // same way labelPropagation does.
    var seg: Dataset[Seg] = words.select(col("w"), col("cnt").cast("long"))
      .as[(String, Long)]
      .map { case (w, c) => Seg(w.map(_.toString), c) }
      .filter(_.syms.lengthCompare(1) > 0)
      .localCheckpoint(eager = true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    var rank = 1
    while (rank <= k && !exhausted) {
      val top = seg
        .flatMap(s => s.syms.iterator.sliding(2).withPartial(false)
          .map(p => (p.head, p(1), s.cnt)))
        .toDF("lhs", "rhs", "c")
        .groupBy("lhs", "rhs").agg(sum(col("c")).as("c"))
        .orderBy(col("c").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += Merge(rank.toLong, l, r, c)
        seg = seg.map(s => Seg(mergePass(s.syms, l, r), s.cnt))
          .filter(_.syms.lengthCompare(1) > 0)
          .localCheckpoint(eager = true)
        rank += 1
      }
    }
    learned.toSeq.toDS().toDF()
  }

  /** True iff `syms` contains (l, r) adjacent — i.e. [[mergePass]] would
    * change the word. Tight while-loop: runs per cached row per iteration.
    */
  private[graft] def hasPair(syms: Seq[String], l: String, r: String): Boolean = {
    var i = 0
    val n = syms.length
    while (i + 1 < n) {
      if (syms(i) == l && syms(i + 1) == r) return true
      i += 1
    }
    false
  }

  /** Delta-maintained variant of [[train]] — identical learned table
    * (asserted in BpeTrainSpec), different per-iteration cost shape.
    *
    * [[train]] re-counts EVERY adjacent pair of EVERY word each
    * iteration: k merges = k full shuffles of the distinct-word pair
    * table, even though merging (l, r) only changes pairs inside words
    * that contain (l, r) adjacent. Here the pair-count table is built
    * once and then MAINTAINED: per iteration, only words containing the
    * merged pair emit a delta (−their old pairs, +their re-segmented
    * pairs), and the counts table absorbs it with one
    * union → hash-agg → (c > 0) pass. The argmax tiebreak (count DESC,
    * lhs ASC, rhs ASC) reads the maintained table, so the chosen merge —
    * and therefore the learned table — is bit-identical to the full
    * recount's (the deltas are exact Long arithmetic on the same
    * integers). At a real 32k-merge vocabulary this is the standard
    * shape: the shuffled delta volume tracks the (shrinking) affected
    * word set instead of the whole vocabulary, 32k times.
    *
    * Both state tables are eagerly local-checkpointed per iteration —
    * the k=100 lineage would otherwise grow a 100-deep plan whose
    * re-analysis dominates wall time (the iterative-plan blowup class
    * labelPropagation guards against the same way).
    */
  def trainIncremental(spark: SparkSession, words: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    def pairsOf(syms: Seq[String]): Iterator[(String, String)] =
      syms.iterator.sliding(2).withPartial(false).map(p => (p.head, p(1)))
    var seg: Dataset[Seg] = words.select(col("w"), col("cnt").cast("long"))
      .as[(String, Long)]
      .map { case (w, c) => Seg(w.map(_.toString), c) }
      .filter(_.syms.lengthCompare(1) > 0)
      .localCheckpoint(eager = true)
    // the one full pair count — every later iteration only applies deltas
    var counts: DataFrame = seg
      .flatMap(s => pairsOf(s.syms).map(p => (p._1, p._2, s.cnt)))
      .toDF("lhs", "rhs", "c")
      .groupBy("lhs", "rhs").agg(sum(col("c")).as("c"))
      .localCheckpoint(eager = true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= k && !exhausted) {
      val top = counts.orderBy(col("c").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += Merge(rank.toLong, l, r, c)
        // only words containing (l, r) adjacent change — retract their
        // old pairs, assert their re-segmented ones; everything else's
        // counts are untouched by this merge
        val delta = seg.filter(s => hasPair(s.syms, l, r))
          .flatMap { s =>
            pairsOf(s.syms).map(p => (p._1, p._2, -s.cnt)) ++
              pairsOf(mergePass(s.syms, l, r)).map(p => (p._1, p._2, s.cnt))
          }
          .toDF("lhs", "rhs", "c")
        counts = counts.unionByName(delta)
          .groupBy("lhs", "rhs").agg(sum(col("c")).as("c"))
          .filter(col("c") > 0)
          .localCheckpoint(eager = true)
        seg = seg
          .map(s => if (hasPair(s.syms, l, r)) Seg(mergePass(s.syms, l, r), s.cnt) else s)
          .filter(_.syms.lengthCompare(1) > 0)
          .localCheckpoint(eager = true)
        rank += 1
      }
    }
    learned.toSeq.toDS().toDF()
  }

  /** The `doc_bpe_train` query body: tokenize `documents` into `[a-z]+`
    * words (the [[graft.functions.Bpe]] pretokenization), count them,
    * and learn `k` merges.
    */
  def trainOnDocuments(spark: SparkSession, docs: DataFrame, k: Int,
      incremental: Boolean = false): DataFrame = {
    val words = docs.select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    if (incremental) trainIncremental(spark, words, k)
    else train(spark, words, k)
  }

  /** Unrolled DuckDB replay of the SAME training loop for the oracle:
    * per step, a pairs CTE (unnest positions → weighted counts), a
    * single-row argmax CTE with the identical tiebreak, and a recursive
    * fold CTE applying the merge exactly as [[mergePass]] does. K is
    * unrolled because each step's argmax is a global aggregate, which a
    * single recursive CTE cannot express. Every step CTE is
    * MATERIALIZED: each is referenced twice by its successor (pairs +
    * fold), so DuckDB's default inlining would re-evaluate the whole
    * chain 2^K times.
    */
  def oracleSql(k: Int): String = {
    val steps = (1 to k).map { i =>
      s"""pairs$i AS MATERIALIZED (
            SELECT syms[i] AS lhs, syms[i + 1] AS rhs,
                   CAST(SUM(cnt) AS BIGINT) AS c
            FROM (SELECT unnest(range(1, len(syms))) AS i, syms, cnt
                  FROM step${i - 1} WHERE len(syms) > 1)
            GROUP BY 1, 2),
          best$i AS MATERIALIZED (
            SELECT lhs, rhs, c FROM pairs$i
            ORDER BY c DESC, lhs, rhs LIMIT 1),
          fold$i AS MATERIALIZED (
            SELECT syms, cnt, 1 AS i, CAST([] AS VARCHAR[]) AS acc
            FROM step${i - 1}
            UNION ALL
            SELECT f.syms, f.cnt, f.i + 1,
                   CASE WHEN len(f.acc) > 0 AND f.acc[-1] = b.lhs
                             AND f.syms[f.i] = b.rhs
                        THEN f.acc[1:len(f.acc) - 1] || [b.lhs || b.rhs]
                        ELSE f.acc || [f.syms[f.i]] END
            FROM fold$i f, best$i b
            WHERE f.i <= len(f.syms)),
          step$i AS MATERIALIZED (
            SELECT acc AS syms, cnt FROM fold$i
            WHERE i = len(syms) + 1 AND len(acc) > 1)"""
    }.mkString(",\n")
    val unionAll = (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS merge_rank, lhs, rhs, c AS pair_count FROM best$i")
      .mkString("\n UNION ALL ")
    s"""WITH RECURSIVE
        step0 AS MATERIALIZED (
          SELECT string_split(w, '') AS syms, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
                FROM documents)
          GROUP BY w
          HAVING length(w) > 1),
        $steps
        SELECT * FROM ($unionAll)"""
  }
}
