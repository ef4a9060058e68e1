package graft

import org.apache.spark.sql.execution.ExplainMode

/** Regression guard for the zero-cartesian invariant: every declared query
  * plan must be free of CartesianProduct and BroadcastNestedLoopJoin nodes.
  *
  * Until round 5 this was audited manually (graft.Explain runs recorded in
  * SCALE notes) — nothing stopped a future query from reintroducing an
  * all-pairs join, the one plan shape that cannot survive a 100 TB corpus
  * (it scales with |left|·|right| regardless of partitioning). This spec
  * freezes the invariant: plans are built in LAZY composition mode
  * (spark.graft.eagerRelease=false) so the inspected plan is the operator's
  * real pipeline, not a localCheckpoint scan of its materialized result.
  *
  * The check is on the formatted explain string — the same surface the
  * manual audits grepped, and the only one that sees inside
  * AdaptiveSparkPlanExec (a LeafExecNode, invisible to a TreeNode.collect
  * walk).
  */
class PlanHygieneSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private val Forbidden = Seq("CartesianProduct", "BroadcastNestedLoopJoin")

  /** Queries whose plan carries a BroadcastNestedLoopJoin ON PURPOSE: the
    * broadcast side is bounded BY CONSTRUCTION (not by data luck), so the
    * shape is corpus-LINEAR — one scan times a constant, not all-pairs:
    *   - gun_ttl_purge: broadcast side is a 1-row global-max aggregate
    *     (the scalar "now" the retention window subtracts from);
    *   - emb_knn: the exact-kNN BASELINE — broadcast side is the fixed
    *     ≤10-row query set (the scale path is emb_lsh_ann / emb_ivf_ann);
    *   - emb_decontaminate_exact: the full-recall final-pass tool —
    *     broadcast side is the eval suite, a bounded benchmark (the bulk
    *     pre-pass is the LSH-blocked emb_decontaminate);
    *   - doc_bm25_topk: broadcast side is the 1-row (N, total-tokens)
    *     global aggregate the scoring constants divide by;
    *   - doc_length_quantiles: the crossJoin of the two 1-row aggregate
    *     rows (binned estimates × exact order statistics) — 1×1 by
    *     construction, the sketch is bin-count-bounded regardless of
    *     corpus size;
    *   - doc_mix_weights: broadcast side is the 1-row Σ√tokens global
    *     aggregate the permille weights divide by;
    *   - emb_mrl_ann: the prefix-cosine candidate stage — broadcast
    *     side is the fixed ≤10-row query set, same contract as emb_knn
    *     (the corpus-dominant arithmetic is prefixDims/dim of brute
    *     force's; the full-dim pass touches nCand·|queries| rows);
    *   - emb_ann_recall: COMPOSES emb_knn (ground truth) and
    *     emb_mrl_ann (method under eval) — its BNLJs are exactly
    *     theirs, both bounded-query-set broadcasts; the eval adds only
    *     equi-joins on the |queries|·k result rows.
    * Anything NOT in this list with a BNLJ — or ANY CartesianProduct —
    * fails: both all-pairs shapes scale with |left|·|right| and cannot
    * survive a 100 TB corpus.
    */
  // doc_lm_surprisal / doc_lm_backoff / doc_dsir_weights left this list
  // in round 11: their 1-row totals now enter as SCALAR SUBQUERIES
  // (executed once, result inlined into the projection) instead of a
  // crossJoin(broadcast(1-row agg)), so their plans carry no BNLJ at
  // all (VERDICT_r10 #8).
  private val BoundedBroadcastNlj =
    Set("gun_ttl_purge", "emb_knn", "emb_decontaminate_exact",
      "doc_bm25_topk", "doc_length_quantiles", "doc_mix_weights",
      "emb_mrl_ann", "emb_ann_recall")

  test("est-only sketch variants execute NO exact pass") {
    // The declared sketch queries carry exact ride-along columns for bias
    // checking (full countDistinct shuffle, second corpus scan, semi-join
    // column); the *_est variants are the production plans a 100 TB user
    // copies, and must run none of that. The sketch operators do part of
    // their work in driver-side collects during query BUILD, so the
    // returned DataFrame's plan alone is not the whole story — capture
    // EVERY execution via a QueryExecutionListener and scan them all.
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        captured.add(qe.explainString(ExplainMode.fromString("formatted")))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      for (name <- Seq("doc_countmin_heavy_est", "doc_hll_distinct_est",
          "doc_bloom_probe_est", "doc_length_quantiles_est")) {
        SparkEntry.queries(name)(spark, sfDir).collect()
        spark.catalog.clearCache()
      }
      // listener delivery is async — wait until the capture stabilizes
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(200)
        val n = captured.size
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      import scala.jdk.CollectionConverters._
      assert(captured.size >= 4, s"captured only ${captured.size} executions")
      // exact-pass fingerprints: the ride-along aliases + a distinct agg
      val exactMarkers =
        Seq("true_count", "true_distinct", "n_true", "exact_n", "(distinct ")
      val offenders = captured.asScala.toSeq.flatMap(p =>
        exactMarkers.filter(p.contains))
      assert(offenders.isEmpty,
        s"est-only plans ran exact passes: ${offenders.distinct.mkString(", ")}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("no declared query plans a cartesian or unbounded nested-loop join") {
    val prev = spark.conf.getOption(operators.Caching.EagerReleaseKey)
    spark.conf.set(operators.Caching.EagerReleaseKey, "false")
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val plan = fn(spark, sfDir).queryExecution
            .explainString(ExplainMode.fromString("formatted"))
          // lazy mode leaves operator caches to the caller — release them
          // so 60+ built plans don't accumulate cached blocks in the suite
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          spark.catalog.clearCache()
          Forbidden.filter(plan.contains)
            .filterNot(_ == "BroadcastNestedLoopJoin" && BoundedBroadcastNlj(name))
            .map(bad => s"$name: $bad")
      }
      assert(offenders.isEmpty,
        s"forbidden join shapes in declared plans:\n  ${offenders.mkString("\n  ")}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(operators.Caching.EagerReleaseKey, v)
        case None    => spark.conf.unset(operators.Caching.EagerReleaseKey)
      }
    }
  }

  /** Per-group top-k queries that must plan a WindowGroupLimit: the
    * `row_number().over(partitionBy…orderBy…) <= k` shape is only
    * 100 TB-viable when Spark pushes the rank filter into a group-limit
    * operator (per-partition top-k heaps before/after the exchange —
    * usually a Partial/Final pair) instead of fully sorting every
    * partition's candidate set under a plain Window. For the ANN family
    * this is the difference between shuffling k rows per query and
    * shuffling the whole ~n²/buckets candidate pair set (emb_lsh_ann at
    * sf10 generates ~156M pairs for 1M kept rows). Verified present in
    * every plan below this round (graft.Explain probe); this test
    * freezes it — a refactor that breaks the pushdown (e.g. filtering a
    * derived column, or a non-rank-like function) fails here, not in a
    * scale run.
    */
  private val TopKQueries = Seq(
    "emb_lsh_ann", "emb_knn", "emb_ivf_ann", "emb_ivf_ann_stored",
    "emb_pq_ann", "emb_pq_ann_stored", "emb_mrl_ann", "emb_mrl_ann_stored",
    "q_topk_brand", "doc_sample_stratified", "doc_bm25_topk",
    "doc_top_terms")

  test("per-group top-k plans push the rank filter into WindowGroupLimit") {
    val prev = spark.conf.getOption(operators.Caching.EagerReleaseKey)
    spark.conf.set(operators.Caching.EagerReleaseKey, "false")
    try {
      val offenders = TopKQueries.flatMap { name =>
        val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
        if (plan.contains("WindowGroupLimit")) None
        else Some(name)
      }
      assert(offenders.isEmpty,
        s"top-k plans without WindowGroupLimit: ${offenders.mkString(", ")}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(operators.Caching.EagerReleaseKey, v)
        case None    => spark.conf.unset(operators.Caching.EagerReleaseKey)
      }
    }
  }
}
