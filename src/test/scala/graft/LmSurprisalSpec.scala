package graft

import java.nio.file.Files

/** Pins doc_lm_surprisal's integer-lattice contract: the per-token
  * surprisal is the linear-interpolated integer log2 of the add-one
  * unigram odds — computed here by an independent scalar reference —
  * and the score orders docs by rarity of their vocabulary (the
  * CCNet/Gopher filter signal).
  */
class LmSurprisalSpec extends SparkSuite {

  /** Reference scalar: s = 256·⌊log2 q⌋ + (256q >> ⌊log2 q⌋) − 4352,
    * q = (T+V)·65536 / (cnt+1) in integer division.
    */
  private def sQ(cnt: Long, t: Long, v: Long): Long = {
    val q = (t + v) * 65536L / (cnt + 1)
    val k = 63 - java.lang.Long.numberOfLeadingZeros(q)
    256L * k + ((q * 256L) >> k) - 4352L
  }

  test("doc scores equal the hand-computed lattice; rarer vocab scores higher") {
    import spark.implicits._
    val dir = Files.createTempDirectory("lmsur").toString
    // corpus: "common" appears 12x, "mid" 4x, "rare" 1x; doc 1 is all
    // common tokens, doc 2 mixes, doc 3 carries the rare token
    val docs = Seq(
      (1L, "common common common common common common", "en", "s0", 0L),
      (2L, "common common common common mid mid mid", "en", "s0", 0L),
      (3L, "common common mid rare", "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.repartition(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val res = graft.queries.TextQueries.queries("doc_lm_surprisal")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    val (t, v) = (17L, 3L) // 17 corpus tokens, 3 distinct
    val (sc, sm, sr) = (sQ(12, t, v), sQ(4, t, v), sQ(1, t, v))
    assert(res(1L) == ((6L, 6 * sc, sc)))
    assert(res(2L) == ((7L, 4 * sc + 3 * sm, (4 * sc + 3 * sm) / 7)))
    assert(res(3L) == ((4L, 2 * sc + sm + sr, (2 * sc + sm + sr) / 4)))
    // rarity ordering: all-common < mixed < carries-the-rare-token
    val bits = res.view.mapValues(_._3).toMap
    assert(bits(1L) < bits(2L) && bits(2L) < bits(3L))
  }

  /** Raw lattice on an already-2^16-scaled odds ratio. */
  private def refLat(q: Long): Long = {
    val k = 63 - java.lang.Long.numberOfLeadingZeros(q)
    256L * k + ((q * 256L) >> k) - 4352L
  }

  /** doc_split's salted md5 bucket (mirrors the query + oracle). */
  private def splitBucket(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"split:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 100L
  }

  test("stupid backoff: seen bigram pays conditional surprisal, unseen backs off") {
    import spark.implicits._
    val dir = Files.createTempDirectory("lmbo").toString
    // pick real train/held-out ids under the doc_split hash
    val trainIds = (1L to 300L).filter(splitBucket(_) < 90).take(2)
    val testId = (1L to 300L).find(splitBucket(_) >= 90).get
    // train corpus: two copies of "x y x y x" → unigrams x:6 y:4 (T=10,
    // V=2); bigrams (x,y):4 (y,x):4. Held-out doc "x y z": a seen
    // bigram, then an unseen continuation ending in an unseen token.
    val docs = (trainIds.map(id => (id, "x y x y x", "en", "s0", 0L)) :+
      ((testId, "x y z", "en", "s0", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.repartition(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val res = graft.queries.TextQueries.queries("doc_lm_backoff")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    val (t, v) = (10L, 2L)
    def sUni(cnt: Long) = refLat((t + v) * 65536L / (cnt + 1))
    // held-out "x y z": pos0 x → unigram(6); (x,y) seen → cond
    // cnt(x)=6 / cnt(x,y)=4; (y,z) unseen, z unseen → 338 + unigram(0)
    val expTest = sUni(6) + refLat(6 * 65536L / 4) + (338L + sUni(0))
    assert(res(testId) == ((3L, expTest, expTest / 3)),
      s"held-out doc: ${res(testId)} != ($expTest)")
    // train doc "x y x y x": all bigrams seen; (y,x) is y's ONLY
    // continuation (cnt(y) = cnt(y,x) = 4) so its conditional
    // surprisal is exactly zero bits
    val expTrain = sUni(6) + 2 * refLat(6 * 65536L / 4) + 2 * refLat(4 * 65536L / 4)
    trainIds.foreach(id => assert(res(id) == ((5L, expTrain, expTrain / 5))))
    // the unseen-continuation doc is the more surprising one per token
    assert(res(testId)._3 > res(trainIds.head)._3)
  }

  test("interpolated integer log2 is monotone and exact on powers of two") {
    // exact at q = 2^k: s(cnt) with q exactly a power of two has zero
    // fractional part; monotone decreasing in cnt everywhere
    val t = 1L << 20
    val v = 16L
    val scores = (0L until 4096L).map(c => sQ(c, t, v))
    assert(scores.sliding(2).forall(p => p(0) >= p(1)))
    // cnt+1 dividing (T+V)·2^16 exactly at a power-of-two ratio:
    // q = 2^k ⇒ s = 256k − 4096 (zero 8-bit fraction)
    val q0 = (t + v) * 65536L / (t + v) // cnt = t+v-1 ⇒ q = 65536
    assert(q0 == 65536L && sQ(t + v - 1, t, v) == 0L)
  }

  test("SQL lattice equals the scalar reference on 2000 random odds (generative)") {
    // the engine-side expression ([[Lm.sQSql]], shared by every LM
    // query and the frozen scorers) against this suite's independent
    // scalar, across the full odds range the models can produce —
    // q from 2 (a token holding half the smoothed mass) up past 2^40
    // (ultra-rare token in a trillion-token corpus)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val gen = Gen.chooseNum(1L, 1L << 40)
    val qs = (0 until 2000).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))).map(_ + 1L)
    val got = qs.toDF("q")
      .selectExpr("q", graft.operators.Lm.sQSql("q") + " AS s")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    qs.foreach { q =>
      val k = 63 - java.lang.Long.numberOfLeadingZeros(q)
      val ref = 256L * k + ((q * 256L) >> k) - 4352L
      assert(got(q) == ref, s"lattice mismatch at q=$q: ${got(q)} != $ref")
    }
  }
}
