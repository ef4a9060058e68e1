package graft

import java.nio.file.Files

import scala.util.Random

/** Generative cross-checks for the round-11b curation queries: each
  * operator's full output on a seeded RANDOM corpus vs an independent
  * scalar reference implemented here in plain Scala collections — the
  * LmSurprisalSpec discipline, extended from single expressions to
  * whole operators. The DuckDB oracle proves Spark and DuckDB agree on
  * one fixed SQL reading; these prove BOTH agree with the intended
  * semantics on inputs nobody hand-picked.
  */
class CurationGenerativeSpec extends SparkSuite {

  // vocabulary engineered so every rule branch fires somewhere in a
  // random corpus: stopwords (r_stop), 2-char tokens (r_mwl low),
  // long tokens (r_mwl high side of the mean), repeats (r_dup)
  private val vocab = Array(
    "the", "of", "a", "and",
    "ab", "cd", "xy",
    "alpha", "beta", "gamma", "delta", "segment", "window",
    "extraordinarily", "characteristic")

  private def genDocs(rnd: Random, n: Int): Seq[(Long, String)] =
    (1 to n).map { i =>
      val len = 5 + rnd.nextInt(56)
      // a third of docs are repeat-heavy: draw from a 3-word slice
      val pool =
        if (rnd.nextInt(3) == 0) { val st = rnd.nextInt(12); vocab.slice(st, st + 3) }
        else vocab
      (i.toLong, Seq.fill(len)(pool(rnd.nextInt(pool.length))).mkString(" "))
    }

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("curgen").toString
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3) // multi-partition input: the operators' shuffles are live
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** The shared interpolated integer log2 (2^16 odds scale). */
  private def sQ(q: Long): Long = {
    val k = 63 - java.lang.Long.numberOfLeadingZeros(q)
    ((q * 256) >> k) + 256L * k - 4352L
  }

  test("doc_line_dedup equals a scalar first-occurrence reference on a random corpus") {
    val rnd = new Random(411)
    val docs = genDocs(rnd, 300)
    val dir = writeDocs(docs)

    // scalar reference: segment on token STRINGS (collision-free ground
    // truth for the 60-bit hash), first occurrence by (doc_id, seg_idx)
    val segsByDoc = docs.map { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+")
      id -> (if (toks.length >= 12)
        toks.grouped(12).filter(_.length == 12).map(_.mkString(" ")).toVector
      else Vector.empty)
    }.toMap
    val firstOwner = collection.mutable.Map.empty[String, (Long, Int)]
    for ((id, segs) <- segsByDoc.toSeq.sortBy(_._1); (s, i) <- segs.zipWithIndex)
      if (!firstOwner.contains(s)) firstOwner(s) = (id, i)
    val expect = segsByDoc.collect { case (id, segs) if segs.nonEmpty =>
      val kept = segs.zipWithIndex.count { case (s, i) => firstOwner(s) == ((id, i)) }
      id -> ((segs.size.toLong, kept.toLong, (segs.size - kept).toLong))
    }

    val got = graft.queries.TextQueries.queries("doc_line_dedup")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expect,
      s"line-dedup/scalar divergence on ${
        (got.keySet ++ expect.keySet).filter(k => got.get(k) != expect.get(k)).take(5)}")
    // global invariant: kept across the corpus == distinct segments
    assert(got.values.map(_._2).sum == firstOwner.size.toLong)
  }

  test("doc_token_entropy equals a scalar lattice reference on a random corpus") {
    val rnd = new Random(412)
    val docs = genDocs(rnd, 300)
    val dir = writeDocs(docs)

    val expect = docs.map { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+")
      val n = toks.length.toLong
      val tf = toks.groupBy(identity).map { case (_, g) => g.length.toLong }
      val hsum = tf.map(f => f * sQ(n * 65536L / f)).sum
      id -> ((n, tf.size.toLong, hsum / n))
    }.toMap

    val got = graft.queries.TextQueries.queries("doc_token_entropy")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expect,
      s"entropy/scalar divergence on ${
        got.keySet.filter(k => got.get(k) != expect.get(k)).take(5).map(k =>
          (k, got(k), expect(k)))}")
  }

  test("doc_gopher_rules equals a scalar rule reference on a random corpus") {
    val rnd = new Random(413)
    val docs = genDocs(rnd, 300)
    val dir = writeDocs(docs)
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "on")

    val expect = docs.map { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+")
      val n = toks.length.toLong
      val u = toks.distinct.length.toLong
      val cns = text.replaceAll("\\s+", "").length.toLong
      val nStop = toks.filter(stop).distinct.length.toLong
      val rWc = if (n >= 20 && n <= 100000) 1L else 0L
      val rMwl = if (cns * 2 >= n * 9 && cns <= n * 10) 1L else 0L
      val rStop = if (nStop >= 2) 1L else 0L
      val rDup = if ((n - u) * 100 <= n * 65) 1L else 0L
      val keep = rWc * rMwl * rStop * rDup
      id -> ((rWc, rMwl, rStop, rDup, keep))
    }.toMap

    val got = graft.queries.TextQueries.queries("doc_gopher_rules")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got == expect,
      s"gopher/scalar divergence on ${
        got.keySet.filter(k => got.get(k) != expect.get(k)).take(5).map(k =>
          (k, got(k), expect(k)))}")
    // every rule must FIRE both ways somewhere in a 300-doc random corpus
    // (else the generative check degenerates to a constant column)
    for (i <- 0 until 4) {
      val vals = expect.values.map(_.productElement(i).asInstanceOf[Long]).toSet
      assert(vals == Set(0L, 1L), s"rule $i never exercised both branches")
    }
  }
}
