package graft.graph

import graft.SparkSuite
import graft.core.{GunValue, ValueKind}

/** The SURVEY §7 minimum slice: the exact query of the reference's
  * TestGunGetSimple (gun/tests/gun_test.go:31-33) — put at
  * esgopeta-test/TestGunGetSimple/some-field, read it back — plus lazy path
  * materialization, exists-vs-nil, and ErrNotObject semantics.
  */
class GraftSpec extends SparkSuite {

  private def newGraft(now: Double = 1700000000000.0): Graft = {
    var seq = 0L
    new Graft(spark, Nil, () => now,
      () => { seq += 1; s"S$seq" })
  }

  test("putWithAck surfaces a remote peer's rejection through the scoped API") {
    // gun/scoped_put.go:153-173 — the put result channel carries per-peer
    // acks/errors after the immediate local store. The remote peer here
    // rejects the write; the caller must observe the err (round-2 gap:
    // the publisher hook discarded the ack path entirely).
    import graft.sources.{GunClient, InMemoryPeerConn, WireCodec}
    val (ours, theirs) = InMemoryPeerConn.pair()
    val client = new GunClient(ours, "local-pid")
    try {
      // remote peer: answer every put with an err ack correlated by msg id
      val peer = new Thread(() => {
        var done = false
        while (!done) {
          theirs.receive(100).foreach { frame =>
            WireCodec.splitFrame(frame).foreach { m =>
              val env = WireCodec.decodeEnvelope(m)
              env.msgId.filter(_ => env.putJson.isDefined).foreach { id =>
                theirs.send("{\"@\":" + graft.core.CanonicalJson.quote(id) +
                  ",\"err\":\"storage full\"}")
                done = true
              }
            }
          }
        }
      })
      peer.setDaemon(true); peer.start()
      var seq = 0L
      val g = new Graft(spark, Nil, () => 1700000000000.0,
        () => { seq += 1; s"A$seq" }, peerClient = Some(client))
      val ack = g.scoped("top", "node", "f").putWithAck(GunValue.string("v"))
      try {
        assert(ack.hasRemote)
        // local ack is implicit: the merge completed before putWithAck returned
        assert(g.scoped("top", "node", "f").fetchOne().valueExists)
        // and the remote rejection is observable
        val env = ack.await(5000)
        assert(env.exists(_.err.contains("storage full")))
      } finally ack.close()
      // a local-only write has no remote side to await
      val localAck = g.scoped("top", "node", "g")
        .putWithAck(GunValue.string("w"), storeLocalOnly = true)
      assert(!localAck.hasRemote && localAck.await(10).isEmpty)
    } finally { client.close(); ours.close(); theirs.close() }
  }

  test("put + fetchOne round-trip on the reference's smoke path") {
    val g = newGraft()
    val sc = g.scoped("esgopeta-test", "TestGunGetSimple", "some-field")
    sc.put(GunValue.string("some-value"))
    val r = g.scoped("esgopeta-test", "TestGunGetSimple", "some-field").fetchOne()
    assert(r.valueExists && r.value.contains(GunValue.string("some-value")))
    assert(r.state.contains(1700000000000.0))
  }

  test("lazy path materialization creates intermediate relation cells") {
    val g = newGraft()
    g.scoped("top", "a", "b", "leaf").put(GunValue.number(42L))
    // top.a must now be a relation to a generated soul; two intermediate
    // nodes (a, b) plus the leaf = 3 cells.
    assert(g.store.count() == 3)
    val rel = g.scoped("top", "a").fetchOne()
    assert(rel.value.exists(_.kind == ValueKind.Rel))
    val leaf = g.scoped("top", "a", "b", "leaf").fetchOne()
    assert(leaf.value.contains(GunValue.number(42L)))
  }

  test("absent path reads as not-exists, not an error") {
    val g = newGraft()
    val r = g.scoped("nope", "missing").fetchOne()
    assert(!r.valueExists && r.value.isEmpty)
  }

  test("exists-vs-nil: a written null is exists=true with kind null") {
    val g = newGraft()
    g.scoped("top", "node", "f").put(GunValue.nullValue)
    val r = g.scoped("top", "node", "f").fetchOne()
    assert(r.valueExists && r.value.contains(GunValue.nullValue))
  }

  test("ErrNotObject when traversing through a scalar") {
    val g = newGraft()
    g.scoped("top", "node", "scalar").put(GunValue.string("x"))
    intercept[Graft.ErrNotObject] {
      g.scoped("top", "node", "scalar", "deeper").fetchOne()
    }
  }

  test("failWithoutParent refuses lazy creation") {
    val g = newGraft()
    intercept[Graft.ErrParentMissing] {
      g.scoped("top", "ghost", "leaf").put(GunValue.string("x"), failWithoutParent = true)
    }
  }

  test("storeLocalOnly suppresses the publish step; default put publishes") {
    // PutOptionStoreLocalOnly (gun/scoped_put.go:31-48, applied :135-137):
    // local store always happens; broadcast is skipped for local-only.
    val published = scala.collection.mutable.Buffer[graft.core.GunCell]()
    var seq = 0L
    val g = new Graft(spark, Nil, () => 1700000000000.0,
      () => { seq += 1; s"S$seq" }, cells => published ++= cells)
    g.scoped("top", "a", "local").put(GunValue.string("quiet"), storeLocalOnly = true)
    assert(published.isEmpty)
    assert(g.scoped("top", "a", "local").fetchOne().valueExists) // stored anyway
    g.scoped("top", "a", "loud").put(GunValue.string("broadcast"))
    assert(published.exists(c => c.field == "loud" &&
      c.value == GunValue.string("broadcast")))
  }

  test("fetchOnce: local miss → remote answer → later reads hit locally") {
    // the reference's TestGunGetSimple flow (gun/tests/gun_test.go:10-40):
    // value lives on the peer; first read goes remote and persists; the
    // peer then disappears and the second read still answers from the
    // local store.
    import graft.sources.{GunClient, InMemoryPeerConn, WireCodec}
    val (ours, theirs) = InMemoryPeerConn.pair()
    val client = new GunClient(ours)
    // fake remote peer: answers gets for (RS1, f) once
    val peer = new Thread(() => {
      Option(theirs.receive(5000)).flatten.foreach { frame =>
        val env = WireCodec.decodeEnvelope(frame)
        theirs.send("""{"@":"""" + env.msgId.get +
          """","put":{"RS1":{"_":{"#":"RS1",">":{"f":1234}},"f":"remote-val"}}}""")
      }
    })
    peer.setDaemon(true); peer.start()
    val g = newGraft()
    try {
      val first = g.fetchOnce("RS1", "f", client)
      assert(first.valueExists && first.value.contains(GunValue.string("remote-val")))
      assert(first.state.contains(1234.0))
      // peer gone — the answer must have been stored locally
      theirs.close(); ours.close()
      val second = g.fetchOnce("RS1", "f", client, timeoutMs = 100)
      assert(second.valueExists && second.value.contains(GunValue.string("remote-val")))
      // and a genuinely absent cell stays exists=false, not an error
      assert(!g.fetchOnce("RS1", "nope", client, timeoutMs = 100).valueExists)
    } finally client.close()
  }

  test("second write at same path wins by newer state (HAM)") {
    var now = 1700000000000.0
    var seq = 0L
    val g = new Graft(spark, Nil, () => now, () => { seq += 1; s"S$seq" })
    g.scoped("top", "n", "f").put(GunValue.string("v1"))
    now += 1000
    g.scoped("top", "n", "f").put(GunValue.string("v2"))
    val r = g.scoped("top", "n", "f").fetchOne()
    assert(r.value.contains(GunValue.string("v2")) && r.state.contains(now))
  }

  test("future conflicting write is deferred then applied") {
    var now = 1700000000000.0
    var seq = 0L
    val g = new Graft(spark, Nil, () => now, () => { seq += 1; s"S$seq" })
    g.scoped("top", "n", "f").put(GunValue.string("v1"))
    // Conflicting write stamped in the future via putCells directly.
    val soul = g.scoped("top", "n").soul().get
    g.putCells(Seq(graft.core.GunCell(soul, "f", GunValue.string("future"), now + 60000)))
    assert(g.scoped("top", "n", "f").fetchOne().value.contains(GunValue.string("v1")))
    assert(g.deferred.count() == 1)
    now += 120000
    g.applyDeferred()
    assert(g.scoped("top", "n", "f").fetchOne().value.contains(GunValue.string("future")))
    assert(g.deferred.count() == 0)
  }
}
