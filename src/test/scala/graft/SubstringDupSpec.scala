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
}
