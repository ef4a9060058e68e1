package graft

import java.nio.file.Files

/** Pins doc_substring_dup's guarantee: two docs sharing an exact
  * normalized run of ≥ 2k-1 chars (k = 24 ⇒ 47) are caught regardless of
  * where the run sits in either doc (tile alignment differs), and docs
  * with no shared 24-gram produce no pair (the join key is the gram
  * string itself — exact, no hash false positives).
  */
class SubstringDupSpec extends SparkSuite {

  test("shared >= 2k-1 char run is caught at any alignment; no false pairs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ssdup").toString
    // 60 normalized chars — above the 2k-1 = 47 guarantee threshold
    val run = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, s"prefix one $run suffix alpha", "en", "s0", 0L),
      (2L, s"completely different lead-in text here then $run trailing", "en", "s0", 0L),
      (3L, "no shared content at all in this one fully unique words written differently", "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.repartition(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val res = graft.queries.TextQueries.queries("doc_substring_dup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(res.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(res.head._3 >= 1L) // at least one matched tile
  }

  test("flooded gram switches to representative linking under the cap") {
    import spark.implicits._
    import graft.operators.Dedup
    // one 24-char run shared by all five docs, sitting at position 1 so it
    // is every doc's first TILE; each doc then diverges at the very next
    // char (no separator), so the hot run's gram is the ONLY cross-doc gram
    val hot = "aaaa bbbb cccc dddd eee0"
    assert(hot.length == 24)
    val docs = (1 to 5).map(i => (i.toLong, hot + (i.toString * 30)))
      .toDF("doc_id", "text")

    // uncapped: the hot gram joins all-pairs — C(5,2) = 10 pairs, each
    // exactly one matched tile
    val exact = Dedup.substringDupPairs(docs, "doc_id", "text", maxBucket = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact == (for { a <- 1 to 5; b <- (a + 1) to 5 }
      yield (a.toLong, b.toLong, 1L)).toSet)

    // a cap above the bucket size changes nothing
    val wide = Dedup.substringDupPairs(docs, "doc_id", "text", maxBucket = 1024)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(wide == exact)

    // cap = 2 < 5 docs: the flooded gram rep-links every member to the
    // bucket min (doc 1) instead of enumerating all pairs — the family
    // stays connected as a star at O(n) cost
    val capped = Dedup.substringDupPairs(docs, "doc_id", "text", maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == Set((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L), (1L, 5L, 1L)))

    // a flooded gram that is NO doc's tile must produce no pairs (same as
    // the exact join): shift the shared run off every tile boundary by
    // prefixing an odd-length unique lead-in shorter than k so the run
    // never aligns... a 1-char prefix suffices: tiles start at 1, 25, …
    // and the run sits at position 2 with total length < 48 ⇒ tile 1
    // differs per doc (first char unique) and there is no tile 2 overlap
    // with the run for docs short enough. Build docs of length 47:
    // unique char + hot(24) + 22 unique chars ⇒ only ONE tile (chars
    // 1..24), which includes the doc-unique first char.
    val letters = "bcdfg"
    val offDocs = (1 to 5).map { i =>
      val c = letters(i - 1).toString
      (i.toLong, c + hot + (i.toString * 22))
    }.toDF("doc_id", "text")
    val offRes = Dedup.substringDupPairs(offDocs, "doc_id", "text", maxBucket = 2)
    assert(offRes.count() == 0L)
  }
}
