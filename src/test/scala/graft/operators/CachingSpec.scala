package graft.operators

import graft.SparkSuite
import graft.queries.{MlQueries, TextQueries}
import org.apache.spark.sql.functions._

/** The leave-no-cache-behind invariant, end to end: pipeline queries run
  * back-to-back in ONE session with NO harness sweep between them, and the
  * block manager drains to empty after each — the only persisted blocks an
  * operator may leave are its checkpointed RESULT, owned by the handle the
  * caller holds and reclaimed by ContextCleaner once that handle is
  * garbage. (The round-2 GraphX leak was exactly this class: operator-
  * installed caches with no owner, accumulating across queries.)
  */
class CachingSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  /** Drop every persistent RDD whose owner is garbage: poke GC until
    * ContextCleaner has drained the block manager (bounded wait).
    */
  private def awaitNoPersistentRdds(context: String): Unit = {
    val sc = spark.sparkContext
    val deadline = System.currentTimeMillis + 30000
    while (sc.getPersistentRDDs.nonEmpty && System.currentTimeMillis < deadline) {
      System.gc()
      Thread.sleep(200)
    }
    assert(sc.getPersistentRDDs.isEmpty,
      s"$context leaked persistent RDDs: ids=${sc.getPersistentRDDs.keys.toSeq.sorted}")
  }

  /** Run a declared query in its own stack frame so its result handle is
    * unreachable (collectable) by the time the caller checks the block
    * manager.
    */
  private def runQuery(name: String): Long = {
    val all = MlQueries.queries ++ TextQueries.queries
    all(name)(spark, sfDir).count()
  }

  test("pipeline queries leave no cache behind without a harness sweep") {
    // clean slate — earlier suites share this session
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    // the heaviest persisting pipelines: shingle self-join, signature
    // reuse across three consumers, LSH buckets + unit vectors, tf/df
    // double-read of an exploded token table
    // (emb_semantic_dedup joins kmeans assignment + unit vectors — two
    // operator-persisted intermediates that must both be released)
    // (emb_kmeans now persists the quantized projection for the Lloyd
    // loop's lifetime — the release on return is part of the invariant)
    for (name <- Seq("doc_ngram_jaccard", "minhash_est", "emb_lsh_ann",
        "doc_top_terms", "emb_semantic_dedup", "emb_kmeans")) {
      assert(runQuery(name) > 0, s"$name returned no rows")
      awaitNoPersistentRdds(name)
    }
  }

  test("lazy mode: plans stay declarative, cache ownership moves to caller") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (1 to 60).map(i => (i.toLong, s"words for doc $i keep going $i more")).toDF("doc_id", "text")
    spark.conf.set(Caching.EagerReleaseKey, "false")
    try {
      val pairs = Dedup.minhashCandidates(
        Dedup.minhashSignatures(docs, "doc_id", "text"))
      // not a checkpoint scan: the full banding pipeline is in the plan
      val plan = pairs.queryExecution.optimizedPlan.toString
      assert(!plan.contains("LogicalRDD") && plan.contains("Aggregate"),
        s"expected a lazy declarative plan, got:\n$plan")
      pairs.count()
      // the operator left its band cache for the caller to manage
      assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    } finally {
      spark.conf.set(Caching.EagerReleaseKey, "true")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
  }

  test("ownPersist: a caller-installed cache survives the operator") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (1 to 50).map(i => (i.toLong, s"some words number $i repeated $i")).toDF("doc_id", "text")
    val sims = Dedup.simhash(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      Dedup.simhashPairsBanded(sims, maxHamming = 16).count()
      assert(sims.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
        "operator released a cache it did not install")
    } finally sims.unpersist(blocking = true)
  }
}
