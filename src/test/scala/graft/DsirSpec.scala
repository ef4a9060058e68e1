package graft

import java.nio.file.Files

/** Pins doc_dsir_weights' contract: docs drawn from the target domain's
  * bigram distribution get positive log importance weight, docs from a
  * disjoint distribution negative, and n_bigrams counts every adjacent
  * pair (the tf table reduces by hashed bucket but loses no mass).
  */
class DsirSpec extends SparkSuite {

  test("target-domain vocabulary scores positive, disjoint negative") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dsir").toString
    // src0 (the target slice) writes alpha/beta bigrams; src1 writes
    // gamma/delta. For an alpha-beta bucket p_tgt ≈ 2·p_raw ⇒ dw_q > 0;
    // for gamma-delta p_tgt is the smoothing floor ⇒ dw_q < 0.
    val docs = (
      (1 to 4).map(i => (i.toLong, "alpha beta alpha beta alpha", "en", "src0", 0L)) ++
      (5 to 8).map(i => (i.toLong, "gamma delta gamma delta gamma", "en", "src1", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.repartition(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val res = graft.queries.TextQueries.queries("doc_dsir_weights")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    assert(res.keySet == (1L to 8L).toSet)
    // every doc has 5 tokens ⇒ 4 bigrams, none lost to bucketing
    assert(res.values.forall(_._1 == 4L))
    (1L to 4L).foreach(d => assert(res(d)._2 > 0L,
      s"target-domain doc $d should carry positive log-weight: ${res(d)}"))
    (5L to 8L).foreach(d => assert(res(d)._2 < 0L,
      s"off-domain doc $d should carry negative log-weight: ${res(d)}"))
    // identical docs share identical weights (pure function of content)
    assert((1L to 4L).map(res).toSet.size == 1)
    assert((5L to 8L).map(res).toSet.size == 1)
  }
}
