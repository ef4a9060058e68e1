package graft

import graft.functions.Bpe
import org.scalatest.funsuite.AnyFunSuite

/** Greedy-BPE kernel semantics: lowest rank first, leftmost on repeats,
  * multi-level merges, and id assignment ('a'..'z' → 1..26, rank k →
  * 26 + k).
  */
class BpeSpec extends AnyFunSuite {

  test("single letters map to 1..26") {
    assert(Bpe.encode("a").toSeq == Seq(1L))
    assert(Bpe.encode("z").toSeq == Seq(26L))
  }

  test("word with no applicable merge stays character-split") {
    // "agg": pairs (a,g), (g,g) — neither in the table
    assert(Bpe.encode("agg").toSeq == Seq(1L, 7L, 7L))
  }

  test("multi-level merge: t+h then th+e") {
    // rank 1 = (t,h) → id 27; rank 2 = (th,e) → id 28
    assert(Bpe.encode("the").toSeq == Seq(28L))
  }

  test("lowest rank wins over textual order") {
    // "order": o,r,d,e,r — (e,r) rank 6 beats (o,r) rank 9 despite
    // appearing later; then (o,r) merges → [or, d, er]
    val or = 26L + 9L
    val er = 26L + 6L
    assert(Bpe.encode("order").toSeq == Seq(or, 4L, er))
  }

  test("leftmost occurrence of the lowest-rank pair merges first") {
    // "thth": (t,h) at positions 1 and 3, same rank — leftmost first;
    // result [th, th], no (h,t) rule in between
    val th = 27L
    assert(Bpe.encode("thth").toSeq == Seq(th, th))
  }

  test("chained ranks: query → qu + ery") {
    // e,r (rank 6) → q,u,er,y; q,u (rank 11) → qu,er,y;
    // er,y (rank 20) → qu,ery
    assert(Bpe.encode("query").toSeq == Seq(26L + 11L, 26L + 20L))
  }

  test("merge inside a longer word: window") {
    // w,i,n,d,o,w: (i,n) r3 → w,in,d,o,w; (in,d) r4 → w,ind,o,w;
    // (o,w) r8 → w,ind,ow
    assert(Bpe.encode("window").toSeq ==
      Seq(23L, 26L + 4L, 26L + 8L))
  }
}
