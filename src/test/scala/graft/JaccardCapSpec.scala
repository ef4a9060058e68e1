package graft

import java.nio.file.Files

/** The doc_ngram_jaccard document-frequency cap: a shingle flooding
  * past [[JaccardDfCap]] docs in one source (boilerplate) is excluded
  * from intersection AND union — pairs that shared only the flooded
  * shingle vanish (no quadratic fan-out), pairs with real overlap keep
  * an exact Jaccard over the filtered shingle space.
  */
class JaccardCapSpec extends SparkSuite {

  test("flooded shingle is dropped from both sides; rare overlap stays exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jcap").toString
    val flood = (1L to 260L).map(i => (i, s"x y z u${i}a u${i}b"))
    val rows = flood ++ Seq(
      (301L, "p q r s t"), (302L, "p q r s t"),     // rare full dup
      (310L, "x y z p2 q2 r2"), (311L, "x y z p2 q2 r2")) // hot + rare mix
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    // "x y z" appears in 262 docs of source s — over the 256 cap
    val got = graft.queries.TextQueries.queries("doc_ngram_jaccard")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // the 260 flood docs share ONLY the hot shingle → zero pairs from
    // them (the uncapped form would emit ~33k pair rows here); the two
    // real dup pairs survive with the hot shingle excluded from BOTH
    // n_inter and n_union (310/311 would be 4/4 uncapped)
    assert(got == Set((301L, 302L, 3L, 3L), (310L, 311L, 3L, 3L)),
      s"capped jaccard wrong: $got")
  }
}
