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
}
