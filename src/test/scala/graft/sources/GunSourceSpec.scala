package graft.sources

import graft.SparkSuite
import graft.core.GunCell
import graft.streaming.HamStream

/** End-to-end A22: wire frames (including double-encoded batches and DAM
  * control messages) → DSv2 `gun` source → GunWire codec → HamStream
  * updates → sink. The peer side is an in-memory conn — the transport the
  * reference's PeerConn interface makes pluggable (gun/peer.go:162-174).
  */
class GunSourceSpec extends SparkSuite {

  test("gun source: frames → cells → HAM update stream; DAM answered, not emitted") {
    val spark2 = spark
    import spark2.implicits._
    val (ours, theirs) = InMemoryPeerConn.pair()
    InMemoryPeerConn.register("e2e-src", ours)
    val frames = spark.readStream.format("gun")
      .option("conn", "e2e-src").option("pid", "spark-engine")
      .load()
    val cells = GunWire.framesToCells(frames, "frame").as[GunCell]
    val q = HamStream.updates(cells, timers = false).writeStream
      .format("memory").queryName("gun_src_updates").outputMode("append").start()
    try {
      // batch frame: DAM request + two puts (one stale for the same key)
      theirs.send(WireCodec.joinFrame(Seq(
        WireCodec.damRequest,
        """{"#":"m1","put":{"s1":{"_":{"#":"s1",">":{"f":1000}},"f":"v1"}}}""",
        """{"#":"m2","put":{"s1":{"_":{"#":"s1",">":{"f":500}},"f":"stale"}}}""")))
      q.processAllAvailable()
      // DAM answered with our pid, consumed from the data stream
      assert(theirs.receive(2000).contains("""{"dam":"?","pid":"spark-engine"}"""))
      // single-message frame: newer write arrives later
      theirs.send("""{"#":"m3","put":{"s1":{"_":{"#":"s1",">":{"f":2000}},"f":"v2"}}}""")
      q.processAllAvailable()
      val rows = spark.sql("SELECT soul, field, value.str, state FROM gun_src_updates")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
        .toSet
      assert(rows == Set(
        ("s1", "f", "v1", 1000.0), // stale write merged away, never emitted
        ("s1", "f", "v2", 2000.0)))
    } finally {
      q.stop()
      InMemoryPeerConn.unregister("e2e-src")
      theirs.close()
    }
  }
}
