package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The viral-band-key scenario the default-on hot-bucket guards exist for:
  * one boilerplate family covering 30% of the corpus shares every band /
  * segment, so the uncapped self-join is quadratic in the family size
  * (0.3n docs → ~0.045n² pairs from ONE bucket). With the cap, that
  * bucket is dropped before pair generation and the join stays bounded —
  * task input per bucket ≤ maxBucket rows, pair fan-out per bucket
  * ≤ maxBucket².
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

  test("minhash banding: viral bucket dropped, candidate join bounded") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val uncapped = Dedup.minhashCandidates(sigs, maxBucket = 0).count()
      val capped = Dedup.minhashCandidates(sigs, maxBucket = 64)
        .select("doc_a", "doc_b").as[(Long, Long)].collect()
      // quadratic blow-up exists without the guard: the viral family alone
      // contributes 300·299/2 pairs
      assert(uncapped >= 300L * 299 / 2)
      // the guard removes every pair generated through the viral buckets
      assert(!capped.exists { case (a, b) => a <= 300 && b <= 300 })
      // and the surviving candidate space is bounded far below quadratic
      assert(capped.length < 1000)
    } finally sigs.unpersist(blocking = true)
  }

  test("simhash segment banding: viral bucket dropped, pairs bounded") {
    val sims = Dedup.simhash(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val uncapped = Dedup.simhashPairsBanded(sims, maxHamming = 3, maxBucket = 0).count()
      val capped = Dedup.simhashPairsBanded(sims, maxHamming = 3, maxBucket = 64)
        .select("doc_a", "doc_b").as[(Long, Long)].collect()
      assert(uncapped >= 300L * 299 / 2) // identical fingerprints pair up fully
      assert(!capped.exists { case (a, b) => a <= 300 && b <= 300 })
      assert(capped.length < 1000)
    } finally sims.unpersist(blocking = true)
  }
}
