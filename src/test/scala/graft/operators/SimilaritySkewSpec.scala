package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The vector-flood scenario the default-on LSH/SemDeDup hot-bucket guards
  * exist for: one near-identical embedding family covering 30% of the
  * corpus lands in the SAME sign-bucket in every table (the sketch is a
  * deterministic function of the vector), so the uncapped candidate
  * self-join is quadratic in the family size — the sf10 spill-kill class
  * (SCALE_r11 §11: pinned bits=8 at 200k vectors flooded every bucket).
  * With the guard, oversized buckets/clusters switch to representative
  * linking: each member pairs with the bucket-min vec_id only — O(b)
  * pairs, the family remains fully DETECTED (identical vectors ⇒
  * cos(rep, member) = 1 survives any verify threshold, and the star keeps
  * it one connected component for downstream clustering).
  */
class SimilaritySkewSpec extends SparkSuite {
  import spark.implicits._

  // 300 of 1000 vectors are the same "viral" embedding; the rest are
  // pairwise-distinct pseudo-random vectors. The mix must AVALANCHE per
  // dimension — a value linear in d (e.g. (i·a + d·b) mod p) makes every
  // vector a monotone ramp, near-collinear with all the others, and the
  // whole corpus becomes one giant near-dup family.
  private def mix(i: Long, d: Long): Float = {
    var x = i * 2654435761L + d * 2246822519L + 1013904223L
    x ^= x >>> 13; x *= 3266489917L; x ^= x >>> 16
    (((x % 2039) + 2039) % 2039 - 1019).toFloat / 1019f
  }

  private lazy val vecs = (1 to 1000).map { i =>
    val emb =
      if (i <= 300) Array.tabulate(16)(d => (d + 1).toFloat / 16f)
      else Array.tabulate(16)(d => mix(i.toLong, d.toLong))
    (i.toLong, emb)
  }.toDF("vec_id", "embedding")

  test("LSH near-dup: viral bucket rep-linked, candidate join bounded") {
    val uncapped = Similarity
      .nearDupPairsLsh(vecs, threshold = 0.9, tables = 4, bits = 4, maxBucket = 0)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    val capped = Similarity
      .nearDupPairsLsh(vecs, threshold = 0.9, tables = 4, bits = 4, maxBucket = 64)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    // quadratic blow-up exists without the guard: the family alone
    // contributes 300·299/2 verified pairs (cos = 1 at any threshold)
    assert(uncapped.count { case (a, b) => a <= 300 && b <= 300 } == 300 * 299 / 2)
    // with the guard the family collapses to a star through its min id:
    // every member is linked (cluster fully detected), via rep 1 only
    val family = capped.filter { case (a, b) => a <= 300 && b <= 300 }
    assert(family.forall(_._1 == 1L))
    assert(family.map(_._2).toSet == (2L to 300L).toSet)
    // star links are a subset of the uncapped answer (nothing invented)
    assert(capped.toSet.subsetOf(uncapped.toSet))
    // and the surviving pair space is bounded far below quadratic
    assert(capped.length < 2000)
  }

  test("semanticDedup: viral cluster rep-linked, flags unchanged") {
    val uncapped = Similarity
      .semanticDedup(vecs, k = 4, iters = 1, threshold = 0.99, maxCluster = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val capped = Similarity
      .semanticDedup(vecs, k = 4, iters = 1, threshold = 0.99, maxCluster = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical family ⇒ cos(rep, member) = cos(any pair) = 1: the star
    // flags exactly what all-pairs flags — the guard changes the WORK
    // (n star links vs n²/2k pairs), not the answer, on a true flood
    assert(capped == uncapped)
    assert(capped.size == 1000)
    // the family keeps only its lowest id; every distinct vector survives
    assert((2L to 300L).forall(i => capped(i) == 1L))
    assert(capped(1L) == 0L)
    assert((301L to 1000L).forall(i => capped(i) == 0L))
  }

  test("semanticDedupHier: viral block rep-linked, flags unchanged") {
    // a 30% identical family makes BOTH k-means levels collapse (the
    // seeds are family members, so every centroid is the same point and
    // all mass lands on the lowest seed id): one giant block, the exact
    // shape the rep-link cap exists for
    val uncapped = Similarity
      .semanticDedupHier(vecs, threshold = 0.99, maxCluster = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val capped = Similarity
      .semanticDedupHier(vecs, threshold = 0.99, maxCluster = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == uncapped)
    assert(capped.size == 1000)
    assert((2L to 300L).forall(i => capped(i) == 1L))
    assert(capped(1L) == 0L)
    assert((301L to 1000L).forall(i => capped(i) == 0L))
  }
}
