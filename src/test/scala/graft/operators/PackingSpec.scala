package graft.operators

import graft.SparkSuite

/** Semantics of the two-pass distributed prefix-sum packing: exact
  * running offsets, chunk boundary math, invariance to the physical
  * partition count (the property that makes the single-window DuckDB
  * oracle valid), and the zero-weight degenerate row.
  */
class PackingSpec extends SparkSuite {
  import spark.implicits._

  private def pack(rows: Seq[(Long, Long)], budget: Long, nPart: Int = 0) = {
    val df0 = rows.toDF("id", "w")
    val df = if (nPart > 0) df0.repartition(nPart) else df0
    Packing.packChunks(df, "id", "w", budget)
      .select("id", "w", "start_off", "chunk_first", "chunk_last", "n_chunks")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
  }

  test("sequential offsets and chunk spans at budget 10") {
    // weights 4,7,9,10,3 → offsets 0,4,11,20,30
    val res = pack(Seq((1L, 4L), (2L, 7L), (3L, 9L), (4L, 10L), (5L, 3L)), 10L)
    assert(res === Seq(
      (1L, 4L, 0L, 0L, 0L, 1L),   // [0,4)   in chunk 0
      (2L, 7L, 4L, 0L, 1L, 2L),   // [4,11)  straddles 0→1
      (3L, 9L, 11L, 1L, 1L, 1L),  // [11,20) in chunk 1
      (4L, 10L, 20L, 2L, 2L, 1L), // [20,30) exactly chunk 2
      (5L, 3L, 30L, 3L, 3L, 1L))) // [30,33) in chunk 3
  }

  test("result is invariant to the input partition count") {
    val rows = (1L to 97L).map(i => i -> (i * 7 % 13 + 1))
    val expected = pack(rows, 17L, nPart = 1)
    for (n <- Seq(2, 5, 32)) assert(pack(rows, 17L, nPart = n) === expected)
  }

  test("zero-weight row occupies no span: n_chunks = 0") {
    // on a budget boundary (cum = 10 = B)...
    val res = pack(Seq((1L, 10L), (2L, 0L), (3L, 5L)), 10L)
    assert(res(1) === ((2L, 0L, 10L, 1L, 0L, 0L)))
    // and the following row is unaffected
    assert(res(2) === ((3L, 5L, 10L, 1L, 1L, 1L)))
    // ...AND mid-bucket (cum = 5): the general chunk_last formula would
    // report a spurious 1-chunk span here — the weight=0 special case
    // pins the empty interval (chunk_last = chunk_first - 1) regardless
    // of where the running total sits (ADVICE_r7 low)
    val mid = pack(Seq((1L, 5L), (2L, 0L), (3L, 5L)), 10L)
    assert(mid(1) === ((2L, 0L, 5L, 0L, -1L, 0L)))
    assert(mid(2) === ((3L, 5L, 5L, 0L, 0L, 1L)))
  }

  test("a document larger than the budget spans ceil(w/B) chunks") {
    val res = pack(Seq((1L, 25L)), 10L)
    assert(res.head === ((1L, 25L, 0L, 0L, 2L, 3L)))
  }
}
