package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The viral-band-key scenario the default-on hot-bucket guards exist for:
  * one boilerplate family covering 30% of the corpus shares every band /
  * segment, so the uncapped self-join is quadratic in the family size
  * (0.3n docs → ~0.045n² pairs from ONE bucket). With the guard, oversized
  * buckets switch to representative linking: each member pairs with the
  * bucket-min doc only — O(b) pairs, so the candidate join stays bounded
  * while the family remains DETECTED (a star through the representative
  * keeps it one connected component for downstream clustering; dropping
  * the bucket would have made the largest duplicate families — the primary
  * dedup target — invisible).
  */
class DedupSkewSpec extends SparkSuite {
  import spark.implicits._

  // 300 of 1000 docs are the same viral boilerplate; the rest are unique.
  private lazy val docs = (1 to 1000).map { i =>
    val text =
      if (i <= 300) "breaking news subscribe to our newsletter for daily updates and offers"
      else s"document number $i talks about topic $i in its own particular words $i"
    (i.toLong, text)
  }.toDF("doc_id", "text")

  test("minhash banding: viral bucket rep-linked, candidate join bounded") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val uncapped = Dedup.minhashCandidates(sigs, maxBucket = 0).count()
      val capped = Dedup.minhashCandidates(sigs, maxBucket = 64)
        .select("doc_a", "doc_b").as[(Long, Long)].collect()
      // quadratic blow-up exists without the guard: the viral family alone
      // contributes 300·299/2 pairs
      assert(uncapped >= 300L * 299 / 2)
      // with the guard the family collapses to a star through its min doc:
      // every intra-family pair goes through rep doc 1, and every member
      // is linked (the cluster stays fully detected)
      val family = capped.filter { case (a, b) => a <= 300 && b <= 300 }
      assert(family.forall(_._1 == 1L))
      assert(family.map(_._2).toSet == (2L to 300L).toSet)
      // and the surviving candidate space is bounded far below quadratic
      assert(capped.length < 2000)
    } finally sigs.unpersist(blocking = true)
  }

  test("simhash segment banding: viral bucket rep-linked, pairs bounded") {
    val sims = Dedup.simhash(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val uncapped = Dedup.simhashPairsBanded(sims, maxHamming = 3, maxBucket = 0).count()
      val capped = Dedup.simhashPairsBanded(sims, maxHamming = 3, maxBucket = 64)
        .select("doc_a", "doc_b").as[(Long, Long)].collect()
      assert(uncapped >= 300L * 299 / 2) // identical fingerprints pair up fully
      // star through the representative: identical fingerprints ⇒ hamming 0
      // ⇒ every member survives the verify, linked to min doc 1
      val family = capped.filter { case (a, b) => a <= 300 && b <= 300 }
      assert(family.forall(_._1 == 1L))
      assert(family.map(_._2).toSet == (2L to 300L).toSet)
      assert(capped.length < 2000)
    } finally sims.unpersist(blocking = true)
  }

  test("statsBounded gate: oversized segment configs fall back to the " +
      "size-driven join with unchanged answers (VERDICT_r19 #2)") {
    // segments=4 -> segBits=12 -> 4·2^12 rows: the closed-form bound holds
    // and the stats sides carry forced broadcast hints. segments=2 ->
    // segBits=24 -> 2^25 rows > 2^22: the bucket-stats table can grow with
    // the corpus, so the gate (Dedup.scala, ADVICE_r18) must WITHHOLD the
    // hint — forcing a broadcast there overrides Spark's size safety and
    // risks driver OOM at scale.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val sims = Dedup.simhash(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def hints(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.size
      // eager mode returns a checkpointed scan whose plan hides the hint
      // nodes — inspect the DECLARATIVE plan the way the Explain main
      // does, in lazy composition mode
      spark.conf.set(Caching.EagerReleaseKey, "false")
      val (boundedHints, fallbackHints) =
        try {
          (hints(Dedup.simhashPairsBanded(sims, maxHamming = 3,
             segments = 4, maxBucket = 64)),
           hints(Dedup.simhashPairsBanded(sims, maxHamming = 3,
             segments = 2, maxBucket = 64)))
        } finally {
          spark.conf.set(Caching.EagerReleaseKey, "true")
          spark.sharedState.cacheManager.clearCache()
        }
      assert(boundedHints > 0,
        "the default config's stats joins must keep their broadcast hints")
      assert(fallbackHints == 0,
        "segments=2 exceeds the closed-form bound: no forced broadcast")
      val fallback = Dedup.simhashPairsBanded(sims, maxHamming = 3,
        segments = 2, maxBucket = 64)
      // the fallback branch is a PLAN change only: with the same oversized
      // config, capped pairs must still rep-link the viral family (answers
      // unchanged vs the hinted shape's semantics)...
      val capped = fallback.select("doc_a", "doc_b").as[(Long, Long)].collect()
      val family = capped.filter { case (a, b) => a <= 300 && b <= 300 }
      assert(family.forall(_._1 == 1L))
      assert(family.map(_._2).toSet == (2L to 300L).toSet)
      // ...and on a hot-bucket-free corpus the capped fallback config
      // equals its own uncapped all-pairs semantics exactly
      val quiet = Dedup.simhash(
        docs.filter(col("doc_id") > 300), "doc_id", "text")
      val cappedQuiet = Dedup.simhashPairsBanded(quiet, maxHamming = 3,
        segments = 2, maxBucket = 64)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val uncappedQuiet = Dedup.simhashPairsBanded(quiet, maxHamming = 3,
        segments = 2, maxBucket = 0)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(cappedQuiet == uncappedQuiet,
        "no bucket over the cap -> capped fallback ≡ uncapped pairs")
    } finally sims.unpersist(blocking = true)
  }
}
