package graft.streaming

import graft.SparkSuite
import graft.core.GunValue
import org.apache.spark.sql.functions.col

/** The viral-soul scenario for the bucketed store (the storage analogue of
  * DedupSkewSpec's viral band key): one soul carries 30% of the corpus as
  * distinct fields — an unbounded-fan-in hot node (a celebrity profile,
  * a global counter object). Under soul-only bucketing ALL of its cells
  * hash to one `bucket=N/` directory, so every batch touching the soul
  * rewrites O(soul size); bucketing by the full (soul, field) cell key
  * spreads the hot soul uniformly, bounding any bucket's rewrite at
  * ≈ store/numBuckets while point reads still prune to one bucket.
  */
class HotSoulSpec extends SparkSuite {
  import spark.implicits._
  import HamStream.Update

  private val NumBuckets = 16

  // 300 of 1000 cells live on ONE soul (distinct fields); the other 700
  // are one-field souls.
  private def corpus: Seq[Update] =
    (1 to 300).map(i =>
      Update("viral", s"field$i", GunValue.number(i.toLong), 1000)) ++
      (1 to 700).map(i =>
        Update(s"soul$i", "f", GunValue.number(i.toLong), 1000))

  test("viral soul spreads across buckets; per-bucket rewrite stays bounded") {
    val dir = java.nio.file.Files.createTempDirectory("hot_soul").toString + "/cells"
    HamStream.mergeBatchIntoStore(corpus.toDS(), 0L, dir, NumBuckets)

    // bucket comes back as int (partition-column type inference)
    val byBucket = spark.read.parquet(dir)
      .groupBy("bucket").count()
      .collect().map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    val avg = byBucket.values.sum.toDouble / NumBuckets
    // uniform-ish occupancy: no bucket concentrates the hot soul (under
    // soul-bucketing one bucket held 300+ rows ≈ 5x the 62.5 average)
    assert(byBucket.values.max < 2.5 * avg,
      s"hot bucket: max=${byBucket.values.max}, avg=$avg")
    // the viral soul's own cells span most of the bucket space
    val viralBuckets = spark.read.parquet(dir)
      .filter(col("soul") === "viral")
      .select("bucket").distinct().count()
    assert(viralBuckets >= NumBuckets / 2, s"viral soul in $viralBuckets buckets")

    // a later batch updating ONE field of the hot soul rewrites one
    // near-average bucket, not the whole soul's footprint
    HamStream.mergeBatchIntoStore(
      Seq(Update("viral", "field1", GunValue.number(9999L), 2000)).toDS(),
      1L, dir, NumBuckets)
    val touched = spark.range(1)
      .select(HamStream.bucketOf(
        org.apache.spark.sql.functions.lit("viral"),
        org.apache.spark.sql.functions.lit("field1"), NumBuckets))
      .head().getLong(0)
    val touchedRows = spark.read.parquet(dir)
      .filter(col("bucket") === touched).count()
    assert(touchedRows < 150, s"rewrite scope $touchedRows rows (soul size is 300)")

    // correctness: the point read still finds the updated cell in one bucket
    val hit = HamStream.fetchFromStore(spark, dir, "viral", "field1", NumBuckets)
    assert(hit.valueExists && hit.value.contains(GunValue.number(9999L)))
  }
}
