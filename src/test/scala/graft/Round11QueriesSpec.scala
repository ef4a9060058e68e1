package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Behavioral pins for the round-11 pipeline queries — each asserts the
  * PROPERTY the operator exists for, not just row shapes (the hash
  * parity with DuckDB is the driver's job; these catch semantic
  * regressions a hash alone can't explain).
  */
class Round11QueriesSpec extends SparkSuite {

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("r11q").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("doc_lm_contrast: in-domain docs score positive, out-of-domain negative") {
    // src0 (the DsirTarget) has its own vocabulary; src1 another. Under
    // the contrast rule, src0 docs must be MORE predictable to the
    // target model than to the general one (positive contrast) and src1
    // docs less (negative) — the CCNet keep-signal direction.
    val dir = writeDocs(Seq(
      (1L, "alpha beta gamma alpha beta", "en", "src0", 0L),
      (2L, "beta gamma alpha gamma", "en", "src0", 0L),
      (3L, "delta epsilon zeta delta epsilon", "en", "src1", 0L),
      (4L, "epsilon zeta delta zeta", "en", "src1", 0L)))
    val res = graft.queries.TextQueries.queries("doc_lm_contrast")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(res(1L) > 0 && res(2L) > 0, s"target docs must be positive: $res")
    assert(res(3L) < 0 && res(4L) < 0, s"non-target docs must be negative: $res")
  }

  test("doc_temperature_sample: tail sources get higher keep-rates; coin is the doc's hash") {
    // skewed sources: 100 / 25 / 4 docs. sqrt-temperature up-weights the
    // tail, so rate(small) > rate(mid) > rate(big).
    val rows =
      (1L to 100L).map(i => (i, s"doc $i", "en", "srcA", 0L)) ++
        (101L to 125L).map(i => (i, s"doc $i", "en", "srcB", 0L)) ++
        (126L to 129L).map(i => (i, s"doc $i", "en", "srcC", 0L))
    val dir = writeDocs(rows)
    val fn = graft.queries.TextQueries.queries("doc_temperature_sample")
    val out = fn(spark, dir).collect()
    val rates = out.map(r => r.getString(1) -> r.getLong(2)).toMap
    // every source that kept anything reports one rate; the tail ranks:
    assert(rates.getOrElse("srcC", 250L) > rates.getOrElse("srcB", 120L))
    assert(rates.getOrElse("srcB", 120L) > rates.getOrElse("srcA", 70L))
    // deterministic: a second run is row-identical (the md5 coin has no RNG)
    val again = fn(spark, dir).collect()
    assert(out.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("doc_shuffle_export: shards partition the corpus; per-shard positions are contiguous") {
    val dir = writeDocs((1L to 200L).map(i => (i, s"doc $i", "en", "s", 0L)))
    val out = graft.queries.TextQueries.queries("doc_shuffle_export")(spark, dir)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 200)
    assert(rows.map(_._3).distinct.length == 200, "every doc exactly once")
    assert(rows.forall { case (s, _, _) => s >= 0 && s < 64 })
    rows.groupBy(_._1).foreach { case (shard, grp) =>
      val ps = grp.map(_._2).sorted
      assert(ps.sameElements(1L to grp.length.toLong),
        s"shard $shard positions not contiguous: ${ps.toSeq}")
    }
  }

  test("doc_profile: per-source stats are exact") {
    val dir = writeDocs(Seq(
      (1L, "a bb ccc", "en", "s0", 0L),      // 8 chars, 3 toks
      (2L, "dddd ee", "de", "s0", 0L),       // 7 chars, 2 toks
      (3L, "f", "en", "s1", 0L)))            // 1 char, 1 tok
    val res = graft.queries.TextQueries.queries("doc_profile")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val s0 = res("s0")
    assert(s0.getLong(1) == 2 && s0.getLong(2) == 0 && s0.getLong(3) == 2)
    assert(s0.getLong(4) == 7 && s0.getLong(5) == 8) // len_min, len_max
    assert(s0.getLong(6) == 15 && s0.getLong(7) == 5) // chars_total, toks_total
    assert(s0.getLong(8) == 7 && s0.getLong(9) == 2)  // len_mean, toks_mean
    assert(res("s1").getLong(1) == 1)
  }

  test("doc_shuffle_export plans NO global sort; doc_temperature_sample broadcasts the rate table") {
    // the export's scale contract: shard = hash range, pos = a
    // PARTITION-LOCAL window — a rangepartitioning exchange (global
    // sort) would funnel the corpus through one ordered shuffle
    val dir = "/root/testdata/sf0.001"
    val exportPlan = graft.queries.TextQueries.queries("doc_shuffle_export")(
      spark, dir).queryExecution.executedPlan.toString
    assert(!exportPlan.contains("rangepartitioning"),
      s"global sort in the export plan:\n$exportPlan")
    // the sampling rate table is #sources rows — its corpus join must
    // be a broadcast, never a corpus-wide shuffle
    val tsampPlan = graft.queries.TextQueries.queries("doc_temperature_sample")(
      spark, dir).queryExecution.executedPlan.toString
    assert(tsampPlan.contains("BroadcastHashJoin"),
      s"rate-table join not broadcast:\n$tsampPlan")
  }

  test("emb_ann_recall: every query evaluated for every method; re-rank beats raw LSH") {
    val res = graft.queries.MlQueries.queries("emb_ann_recall")(
      spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val methods = res.map(_._1).distinct.sorted
    assert(methods.sameElements(Seq("ivf", "lsh", "mrl")))
    // no silently-dropped query: 10 rows per method, ground truth always 5
    assert(Seq("mrl", "lsh", "ivf").forall(m => res.count(_._1 == m) == 10))
    assert(res.forall(_._3 == 5L))
    val avg = res.groupBy(_._1).map { case (m, g) =>
      m -> g.map(_._4).sum.toDouble / g.length }
    assert(avg("mrl") > avg("lsh"),
      s"two-stage re-rank must out-recall single-table LSH: $avg")
  }
}
