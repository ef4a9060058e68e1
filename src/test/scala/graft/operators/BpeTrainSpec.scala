package graft.operators

import graft.SparkSuite
import graft.functions.Bpe

/** Distributed BPE merges training ([[BpeTrain]]): iterative weighted
  * pair counting with the deterministic (count DESC, lhs, rhs) tiebreak,
  * greedy leftmost non-overlapping re-segmentation, and the consistency
  * contract that greedy ENCODE against the learned table reproduces the
  * training segmentation.
  */
class BpeTrainSpec extends SparkSuite {
  import spark.implicits._

  // the classic Sennrich et al. toy corpus (word, frequency)
  private val corpus = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  private def corpusDf =
    corpus.toDF("w", "cnt")

  test("mergePass is greedy leftmost non-overlapping") {
    assert(BpeTrain.mergePass(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(BpeTrain.mergePass(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(BpeTrain.mergePass(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(BpeTrain.mergePass(Seq("x", "a", "b", "y"), "a", "b") == Seq("x", "ab", "y"))
    assert(BpeTrain.mergePass(Seq("a", "b"), "b", "a") == Seq("a", "b"))
  }

  test("learns the classic merges in order with exact weighted counts") {
    val m = BpeTrain.train(spark, corpusDf, 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // hand-computed: (e,s) ties (s,t) at 9 → lex tiebreak; then (es,t);
    // (l,o) ties (o,w) at 7 → lex; then (lo,w); then (e,w)/(n,e)/(w,est)
    // tie at 6 → (e,w)
    assert(m == Seq(
      (1L, "e", "s", 9L),
      (2L, "es", "t", 9L),
      (3L, "l", "o", 7L),
      (4L, "lo", "w", 7L),
      (5L, "e", "w", 6L)), s"got ${m.toSeq}")
  }

  test("greedy encode against the learned table reproduces the training segmentation") {
    val k = 8
    val learned = BpeTrain.train(spark, corpusDf, k).collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2)))
    val table = learned.zipWithIndex
      .map { case (p, i) => p -> (i + 1) }.toMap
    corpus.foreach { case (w, _) =>
      // training-side segmentation: apply the learned passes in order
      val trained = learned.foldLeft(w.map(_.toString): Seq[String]) {
        case (syms, (l, r)) => BpeTrain.mergePass(syms, l, r)
      }
      assert(Bpe.encodeWith(w, table) == trained,
        s"encode/train divergence on '$w': " +
          s"${Bpe.encodeWith(w, table)} vs $trained")
    }
  }

  test("stops early when the corpus runs out of pairs") {
    val m = BpeTrain.train(spark, Seq(("ab", 3L)).toDF("w", "cnt"), 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1L, "a", "b", 3L)))
  }

  test("incremental delta maintenance learns the identical table (k >= 12)") {
    // a corpus rich enough to exercise ≥ 12 merges, including tie-breaks,
    // words dropping out (fully merged), and multi-occurrence pairs
    val rich = Seq(
      ("low", 5L), ("lower", 2L), ("lowest", 4L), ("newest", 6L),
      ("widest", 3L), ("newer", 4L), ("wider", 2L), ("banana", 7L),
      ("bandana", 2L), ("ananas", 1L), ("seeses", 3L), ("aaaa", 2L))
      .toDF("w", "cnt")
    val full = BpeTrain.train(spark, rich, 14).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val inc = BpeTrain.trainIncremental(spark, rich, 14).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(full.size >= 12, s"fixture too small: only ${full.size} merges")
    assert(inc == full, s"incremental diverged:\n  inc =$inc\n  full=$full")
  }

  test("incremental stops early when the corpus runs out of pairs") {
    val m = BpeTrain.trainIncremental(spark, Seq(("ab", 3L)).toDF("w", "cnt"), 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1L, "a", "b", 3L)))
  }
}
