package graft

import graft.core.{GunCell, GunValue}
import graft.graph.Graft
import org.apache.spark.sql.SparkSession

/** Usage example / smoke entry: drives the public Graft API end-to-end.
  * Run: sbt "runMain graft.Demo"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Controllable clock so the HAM deferral path is demonstrable.
    var now = 1700000000000.0
    val g = new Graft(spark, clock = () => now)

    g.scoped("esgopeta-test", "TestGunGetSimple", "some-field")
      .put(GunValue.string("some-value"))
    val r1 = g.scoped("esgopeta-test", "TestGunGetSimple", "some-field").fetchOne()
    println(s"[demo] read back: $r1")

    // Conflicting write with OLDER state → discarded by HAM.
    val soul = g.scoped("esgopeta-test", "TestGunGetSimple").soul().get
    g.putCells(Seq(GunCell(soul, "some-field", GunValue.string("stale"), now - 5000)))
    val r2 = g.scoped("esgopeta-test", "TestGunGetSimple", "some-field").fetchOne()
    println(s"[demo] after stale write (must still be some-value): $r2")

    // Conflicting FUTURE write → deferred, then applied when clock advances.
    g.putCells(Seq(GunCell(soul, "some-field", GunValue.string("from-the-future"), now + 60000)))
    println(s"[demo] deferred count: ${g.deferred.count()}")
    now += 120000
    g.applyDeferred()
    val r3 = g.scoped("esgopeta-test", "TestGunGetSimple", "some-field").fetchOne()
    println(s"[demo] after clock advance (must be from-the-future): $r3")

    println("[demo] store contents:")
    g.store.show(20, truncate = false)

    // Wire ingest: a double-encoded websocket batch frame → cells → merge.
    import spark.implicits._
    val frame =
      """["{\"#\":\"m1\",\"put\":{\"W1\":{\"_\":{\"#\":\"W1\",\">\":{\"f\":1000}},\"f\":\"old\"}}}","{\"#\":\"m2\",\"put\":{\"W1\":{\"_\":{\"#\":\"W1\",\">\":{\"f\":2000}},\"f\":\"new\"}}}"]"""
    val wireCells = graft.sources.GunWire.framesToCells(Seq(frame).toDF("frame"), "frame")
    println("[demo] wire-ingested cells after HAM merge:")
    graft.operators.HamMerge.mergeSnapshot(wireCells).show(5, truncate = false)

    // SQL surface: the native canonical-JSON expression via extensions.
    graft.plans.GraftExtensions.register(spark)
    graft.operators.HamMerge.mergeSnapshot(wireCells).createOrReplaceTempView("wire_cells")
    println("[demo] gun_canonical_json over the merged wire cells:")
    spark.sql("SELECT soul, field, gun_canonical_json(value) AS cj FROM wire_cells")
      .show(5, truncate = false)

    // Live peer round trip: dial our own RFC 6455 server, handshake DAM,
    // fetch a value that only the "remote" peer has (local-then-remote
    // once), then read it again with the peer gone — served locally.
    {
      import graft.sources._
      val peers = new java.util.concurrent.LinkedBlockingQueue[PeerConn]()
      val server = new GunWebSocketServer(0, peers.put(_), sendDamOnConnect = false)
      val conn = WebSocketPeerConn.dial(s"ws://127.0.0.1:${server.boundPort}/gun")
      val client = new GunClient(conn)
      val serverSide = peers.poll(5, java.util.concurrent.TimeUnit.SECONDS)
      val answerer = new Thread(() => {
        serverSide.receive(5000).foreach { f =>
          val env = WireCodec.decodeEnvelope(f)
          serverSide.send("{\"@\":" + "\"" + env.msgId.get + "\"" +
            ",\"put\":{\"remote-soul\":{\"_\":{\"#\":\"remote-soul\",\">\":{\"greeting\":3000}},\"greeting\":\"hello-over-websocket\"}}}")
        }
      })
      answerer.setDaemon(true); answerer.start()
      val remote = g.fetchOnce("remote-soul", "greeting", client)
      println(s"[demo] fetched over live websocket: $remote")

      // Put-ack surface (gun/scoped_put.go result channel): the local
      // merge is the immediate local ack; the remote peer rejects this
      // write, and the caller observes the err through the handle.
      val rejecter = new Thread(() => {
        serverSide.receive(5000).foreach { f =>
          val env = WireCodec.decodeEnvelope(f)
          env.msgId.filter(_ => env.putJson.isDefined).foreach { id =>
            serverSide.send("{\"@\":" + graft.core.CanonicalJson.quote(id) +
              ",\"err\":\"demo peer says no\"}")
          }
        }
      })
      rejecter.setDaemon(true); rejecter.start()
      val gAck = new graph.Graft(spark, Nil, () => 1.7e12,
        () => graft.core.SoulGen(), peerClient = Some(client))
      val ack = gAck.scoped("demo", "acked", "field")
        .putWithAck(graft.core.GunValue.string("v"))
      println(s"[demo] remote put ack: ${ack.await(5000).flatMap(_.err)} " +
        s"(local store has it: ${gAck.scoped("demo", "acked", "field").fetchOne().valueExists})")
      ack.close()

      server.close(); client.close()
      val local = g.fetchOnce("remote-soul", "greeting", client, timeoutMs = 100)
      println(s"[demo] re-read with peer gone (served locally): $local")
    }

    val entryRows = SparkEntry.entry(spark).count()
    println(s"[demo] SparkEntry.entry rows: $entryRows")
    spark.stop()
  }
}
