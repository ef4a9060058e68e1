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
}
