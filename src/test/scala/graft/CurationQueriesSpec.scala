package graft

import java.nio.file.Files

/** Behavioral pins for the round-11b curation queries (`doc_gopher_rules`,
  * `doc_line_dedup`, `doc_ccnet_bucket`, `doc_token_entropy`) — each
  * asserts the PROPERTY the operator exists for on crafted fixtures, so a
  * semantic regression is explained even when the driver's DuckDB hash
  * parity would merely flag it.
  */
class CurationQueriesSpec extends SparkSuite {

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("curq").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  // a 25-token doc that passes every rule: long-enough words, two distinct
  // stopwords, all tokens distinct
  private val healthy = ((1 to 23).map(i => s"word$i") ++ Seq("the", "of"))
    .mkString(" ")

  test("doc_gopher_rules: each rule fails independently; keep only when all pass") {
    val dir = writeDocs(Seq(
      (1L, healthy, "en", "s", 0L),
      // too short (5 tokens) — fails r_wc only... but also has few
      // stopwords; craft it to pass the others: 2 stopwords, mean len ok
      (2L, "the of wordone wordtwo wordthree", "en", "s", 0L),
      // mean word length < 4.5 — fails r_mwl (25 two-char tokens + stops)
      (3L, ((1 to 23).map(i => "ab") ++ Seq("the", "of")).mkString(" "), "en", "s", 0L),
      // no stopwords — fails r_stop
      (4L, (1 to 25).map(i => s"word$i").mkString(" "), "en", "s", 0L),
      // one token repeated 25 times — fails r_dup (dup frac 24/25) and
      // r_stop; still 25 tokens so r_wc passes
      (5L, Seq.fill(25)("wordzero").mkString(" "), "en", "s", 0L)))
    val res = graft.queries.TextQueries.queries("doc_gopher_rules")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(res(1L) == ((1L, 1L, 1L, 1L, 1L)), s"healthy doc must keep: $res")
    assert(res(2L) == ((0L, 1L, 1L, 1L, 0L)), s"short doc fails r_wc only: $res")
    assert(res(3L)._2 == 0L && res(3L)._5 == 0L, s"short words fail r_mwl: $res")
    assert(res(4L) == ((1L, 1L, 0L, 1L, 0L)), s"no stopwords fails r_stop: $res")
    assert(res(5L)._4 == 0L && res(5L)._5 == 0L, s"repeated token fails r_dup: $res")
  }

  test("doc_gopher_rules is pure map-side work: no exchange in the plan") {
    val plan = graft.queries.TextQueries.queries("doc_gopher_rules")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"rule battery must not shuffle:\n$plan")
  }

  test("doc_line_dedup: first occurrence (doc_id, seg_idx) wins; later copies removed") {
    val seg1 = (1 to 12).map(i => s"a$i").mkString(" ")
    val seg2 = (1 to 12).map(i => s"b$i").mkString(" ")
    val seg3 = (1 to 12).map(i => s"c$i").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, s"$seg1 $seg2", "en", "s", 0L),  // both segs first occurrence
      (2L, s"$seg3 $seg1", "en", "s", 0L),  // seg3 new, seg1 a later copy
      (3L, seg1, "en", "s", 0L),            // entirely duplicated
      (4L, "too short", "en", "s", 0L)))    // < 12 tokens: absent
    val res = graft.queries.TextQueries.queries("doc_line_dedup")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(res(1L) == ((2L, 2L, 0L)), s"doc 1 keeps both: $res")
    assert(res(2L) == ((2L, 1L, 1L)), s"doc 2 loses the seg1 copy: $res")
    assert(res(3L) == ((1L, 0L, 1L)), s"doc 3 fully removed: $res")
    assert(!res.contains(4L), "sub-segment docs carry no segments")
  }

  test("doc_ccnet_bucket: per-language terciles; every bucket populated per lang") {
    // two languages, each with a fluency gradient: docs made of common
    // tokens (low surprisal) vs docs of hapaxes (high surprisal)
    val rows = (1L to 30L).map { i =>
      val lang = if (i <= 15) "en" else "de"
      val text =
        if (i % 3 == 0) Seq.fill(10)("common").mkString(" ")       // head
        else if (i % 3 == 1) (Seq.fill(5)("common") ++
          (1 to 5).map(k => s"mid${i}x$k")).mkString(" ")          // middle
        else (1 to 10).map(k => s"rare${i}x$k").mkString(" ")      // tail
      (i, text, lang, "s", 0L)
    }
    val dir = writeDocs(rows)
    val res = graft.queries.TextQueries.queries("doc_ccnet_bucket")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(res.length == 30)
    for (lang <- Seq("en", "de")) {
      val byBucket = res.filter(_._2 == lang).groupBy(_._4)
      assert(byBucket.keySet == Set("head", "middle", "tail"),
        s"$lang must populate all buckets: ${byBucket.keySet}")
      // the bucket order must follow the score order
      val maxHead = byBucket("head").map(_._3).max
      val minMid = byBucket("middle").map(_._3).min
      val maxMid = byBucket("middle").map(_._3).max
      val minTail = byBucket("tail").map(_._3).min
      assert(maxHead < minMid && maxMid < minTail,
        s"$lang buckets out of score order")
      // all-common docs are the most predictable → head
      byBucket("head").foreach { case (id, _, _, _) =>
        assert(id % 3 == 0, s"doc $id in head is not an all-common doc") }
    }
  }

  test("doc_token_entropy: 0 for a one-token doc; exactly 256·log2 n for n distinct") {
    val dir = writeDocs(Seq(
      (1L, Seq.fill(16)("same").mkString(" "), "en", "s", 0L),
      (2L, (1 to 8).map(i => s"tok$i").mkString(" "), "en", "s", 0L),
      (3L, (1 to 32).map(i => s"tok$i").mkString(" "), "en", "s", 0L)))
    val res = graft.queries.TextQueries.queries("doc_token_entropy")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(res(1L) == ((16L, 1L, 0L)), s"repeated token ⇒ zero entropy: $res")
    // n distinct tokens, n a power of two: every tf=1, q = n·2^16 exactly
    // on the lattice ⇒ ent_q = 256·log2 n with no interpolation residue
    assert(res(2L) == ((8L, 8L, 768L)), s"8 distinct ⇒ 768/256 bits: $res")
    assert(res(3L) == ((32L, 32L, 1280L)), s"32 distinct ⇒ 1280/256 bits: $res")
  }
}
