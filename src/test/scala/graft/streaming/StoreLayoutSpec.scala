package graft.streaming

import graft.SparkSuite
import graft.core.GunValue
import org.apache.hadoop.fs.Path

/** The store's `_layout` version marker (ADVICE round 5): the round-5
  * bucket-key change from xxhash64(soul) to xxhash64(soul, field) would
  * silently mis-read any store written before it — point reads prune to
  * the NEW bucket and report valueExists=false for cells that exist in an
  * old one. Every store entry point must therefore fail fast on a store
  * whose marker is absent-but-populated (pre-v2) or mismatched, and stamp
  * fresh stores on first write.
  */
class StoreLayoutSpec extends SparkSuite {
  import spark.implicits._
  import HamStream.Update

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/cells"

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("first write stamps the marker; reads round-trip") {
    val dir = freshDir("layout_fresh")
    HamStream.mergeBatchIntoStore(
      Seq(Update("s1", "f", GunValue.string("v"), 1000)).toDS(), 0L, dir, 8)
    val marker = new Path(dir, "_layout")
    assert(fs.exists(marker), "first write must stamp _layout")
    val in = fs.open(marker)
    val content =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
    assert(content == HamStream.LayoutVersion)
    // the marker is invisible to the parquet scan (underscore prefix)
    val hit = HamStream.fetchFromStore(spark, dir, "s1", "f", 8)
    assert(hit.valueExists && hit.value.contains(GunValue.string("v")))
  }

  test("pre-v2 store (buckets, no marker) fails fast on every entry point") {
    val dir = freshDir("layout_prev2")
    HamStream.mergeBatchIntoStore(
      Seq(Update("s1", "f", GunValue.string("v"), 1000)).toDS(), 0L, dir, 8)
    fs.delete(new Path(dir, "_layout"), false) // simulate a round-4 store
    val readErr = intercept[IllegalStateException] {
      HamStream.fetchFromStore(spark, dir, "s1", "f", 8)
    }
    assert(readErr.getMessage.contains("no _layout marker"))
    intercept[IllegalStateException] {
      HamStream.mergeBatchIntoStore(
        Seq(Update("s2", "f", GunValue.string("w"), 2000)).toDS(), 1L, dir, 8)
    }
    intercept[IllegalStateException] {
      HamStream.compactStore(spark, dir, nowMs = 3000)
    }
  }

  test("mismatched marker fails fast; empty marked dir is accepted") {
    val dir = freshDir("layout_mismatch")
    HamStream.mergeBatchIntoStore(
      Seq(Update("s1", "f", GunValue.string("v"), 1000)).toDS(), 0L, dir, 8)
    val out = fs.create(new Path(dir, "_layout"), true)
    try out.write("v1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val err = intercept[IllegalStateException] {
      HamStream.fetchFromStore(spark, dir, "s1", "f", 8)
    }
    assert(err.getMessage.contains("'v1'"))

    // a directory that exists but has no bucket data yet is stamped, not
    // rejected (mkdirs-then-write race of a first batch)
    val empty = freshDir("layout_empty")
    fs.mkdirs(new Path(empty))
    HamStream.mergeBatchIntoStore(
      Seq(Update("s1", "f", GunValue.string("v"), 1000)).toDS(), 0L, empty, 8)
    assert(fs.exists(new Path(empty, "_layout")))
    assert(HamStream.fetchFromStore(spark, empty, "s1", "f", 8).valueExists)
  }
}
