package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Persistent append-only ANN index stores ([[IndexStore]]): a stored
  * IVF/PQ index reproduces the direct batch operators' output exactly,
  * a second call reuses the on-disk index (no rebuild), and appends
  * against the frozen geometry make new vectors visible.
  */
class IndexStoreSpec extends SparkSuite {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def newDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/idx"

  test("stored IVF knn == direct ivfKnn, and a second call reuses the index") {
    val path = newDir("ivf-store")
    IndexStore.buildIvf(emb, nLists = 16, path)
    val queries = emb.filter(col("vec_id") < 10)
    val direct = Similarity.ivfKnn(emb, queries, k = 5, nLists = 16, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def stored() = IndexStore.ivfKnnStored(queries, k = 5, nprobe = 2, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val first = stored()
    assert(first == direct, s"stored != direct: ${first.diff(direct)} / ${direct.diff(first)}")
    // the second call runs purely against the on-disk index
    assert(stored() == first)
    // the inverted lists ARE the directories: a probe reads only its lists
    val listDirs = new java.io.File(s"$path/lists").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(listDirs > 1, s"expected list-partitioned layout, got $listDirs dirs")
  }

  test("IVF append against the frozen centroids makes a new vector visible") {
    val path = newDir("ivf-append")
    IndexStore.buildIvf(emb, nLists = 16, path)
    // clone of vector 3 under a fresh id — its nearest neighbor by
    // construction, assigned to the same list by the frozen centroids
    val v3 = emb.filter(col("vec_id") === 3).select("embedding")
      .head().getSeq[Float](0).toArray
    IndexStore.appendIvf(
      Seq((90001L, v3)).toDF("vec_id", "embedding"), path, batchId = 1L)
    val res = IndexStore.ivfKnnStored(
      emb.filter(col("vec_id") === 3), k = 5, nprobe = 2, path)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(res.contains((90001L, 1L)),
      s"appended clone not rank-1 for its source: ${res.toSeq}")
  }

  test("stored PQ topK == direct pqTopK, second call identical, append visible") {
    val path = newDir("pq-store")
    IndexStore.buildPq(emb, m = 4, k = 8, path)
    val direct = Similarity.pqTopK(emb, m = 4, k = 8, probes = 5, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def stored() = IndexStore.pqTopKStored(spark, path, probes = 5, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val first = stored()
    assert(first == direct, s"stored != direct: ${first.diff(direct)} / ${direct.diff(first)}")
    assert(stored() == first)
    // append a clone of vector 2: PQ codes equal vector 2's codes, so its
    // symmetric distance to probe 2 is 0 → it enters probe 2's top list
    val v2 = emb.filter(col("vec_id") === 2).select("embedding")
      .head().getSeq[Float](0).toArray
    IndexStore.appendPq(Seq((90002L, v2)).toDF("vec_id", "embedding"),
      path, batchId = 1L)
    val after = IndexStore.pqTopKStored(spark, path, probes = 5, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(after.exists { case (p, v, d) => p == 2L && v == 90002L && d == 0L },
      s"appended clone not at distance 0 from its source probe")
  }

  test("layout guard rejects a mismatched IVF reopen") {
    val path = newDir("ivf-layout")
    IndexStore.buildIvf(emb, nLists = 16, path)
    val e = intercept[IllegalArgumentException] {
      IndexStore.appendIvf(
        Seq((90003L, Array.fill(8)(0.5f))).toDF("vec_id", "embedding"),
        path, batchId = 2L, nLists = 8)
    }
    assert(e.getMessage.contains("16:"))
  }
}
