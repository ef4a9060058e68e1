package graft.functions

/** Byte-pair encoding against a FIXED merges table — the real greedy
  * algorithm (lowest-rank adjacent pair first, leftmost occurrence on a
  * repeated pair, iterate to exhaustion), not pretokenizer counting.
  * This is the encode step a training pipeline runs on every document;
  * the reference engine has no tokenizer, so the table is a
  * deterministic 20-rule stand-in with the same mechanics as a learned
  * GPT-2-style vocabulary (multi-level merges included: `t+h → th`,
  * `th+e → the`; `e+r → er`, `er+y → ery`).
  *
  * Token ids: 'a'..'z' → 1..26; the merge with rank k → 26 + k. Merge
  * outputs are all distinct strings (checked at init), so the id of a
  * merged symbol is unambiguous.
  *
  * The table is compiled into the jar — on a cluster every executor has
  * it for free, no broadcast needed. `rankCaseSql`/`idCaseSql` emit the
  * SAME table as DuckDB CASE expressions so the oracle replays the
  * greedy loop independently (recursive CTE) over identical rules.
  */
object Bpe {
  /** (left, right) merge rules in priority order; rank = index + 1. */
  val Merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("in", "d"), ("a", "n"),
    ("e", "r"), ("s", "t"), ("o", "w"), ("o", "r"), ("a", "r"),
    ("q", "u"), ("h", "a"), ("s", "m"), ("g", "r"), ("b", "a"),
    ("d", "a"), ("t", "a"), ("k", "e"), ("v", "a"), ("er", "y"))

  /** Sentinel for "pair not in table" — shared with the SQL CASE ELSE. */
  val NoRank = 999

  private val ranks: Map[(String, String), Int] =
    Merges.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap

  private val mergedIds: Map[String, Long] = {
    val pairs = Merges.zipWithIndex
      .map { case ((l, r), i) => (l + r) -> (27 + i).toLong }
    require(pairs.map(_._1).distinct.size == pairs.size,
      "merge outputs must be distinct for unambiguous token ids")
    pairs.toMap
  }

  /** Greedy BPE segmentation of `w` against an arbitrary ranked merges
    * table (lower rank merges first; leftmost occurrence on a repeated
    * pair; iterate to exhaustion). The learned-table entry point: a
    * table produced by [[graft.operators.BpeTrain]] drops in here, and
    * for any word of the training corpus the result reproduces the
    * final training segmentation (asserted in BpeTrainSpec).
    */
  def encodeWith(w: String, table: Map[(String, String), Int]): Seq[String] = {
    val syms = scala.collection.mutable.ArrayBuffer.tabulate(w.length)(
      i => w.substring(i, i + 1))
    var merging = syms.length > 1
    while (merging) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        // strict < keeps the LEFTMOST occurrence of the lowest rank
        val r = table.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestI = i }
        i += 1
      }
      if (bestI < 0) merging = false
      else {
        syms(bestI) = syms(bestI) + syms(bestI + 1)
        syms.remove(bestI + 1)
      }
    }
    syms.toSeq
  }

  /** Greedy BPE encode of a lowercase `[a-z]+` word into token ids. */
  def encode(w: String): Array[Long] =
    encodeWith(w, ranks).iterator.map { sym =>
      if (sym.length == 1) (sym.charAt(0) - 'a' + 1).toLong
      else mergedIds(sym)
    }.toArray

  /** DuckDB CASE yielding the rank of the pair (`l`, `r`), else NoRank. */
  def rankCaseSql(l: String, r: String): String =
    Merges.zipWithIndex.map { case ((a, b), i) =>
      s"WHEN $l = '$a' AND $r = '$b' THEN ${i + 1}"
    }.mkString("CASE ", " ", s" ELSE $NoRank END")

  /** DuckDB CASE yielding the token id of symbol expression `s`. */
  def idCaseSql(s: String): String =
    (s"CASE WHEN length($s) = 1 THEN ascii($s) - 96" +:
      Merges.zipWithIndex.map { case ((a, b), i) =>
        s"WHEN $s = '${a + b}' THEN ${27 + i}"
      }).mkString(" ", " ", " END").trim
}
