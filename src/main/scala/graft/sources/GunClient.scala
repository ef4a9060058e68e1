package graft.sources

import graft.core.{CanonicalJson, GunCell, GunValue, SoulGen, ValueKind}
import java.util.concurrent.{ConcurrentHashMap, LinkedBlockingQueue, TimeUnit}
import scala.jdk.CollectionConverters._

/** Decoded wire envelope — the plain-Scala mirror of the reference's
  * `Message` struct (gun/message.go:6-18), for control-plane use outside
  * Catalyst (the column-level form lives in [[GunWire.parseEnvelope]]).
  */
final case class WireEnvelope(
    ackId: Option[String] = None,   // "@"
    msgId: Option[String] = None,   // "#"
    getSoul: Option[String] = None, // get.#
    getField: Option[String] = None, // get..
    dam: Option[String] = None,
    pid: Option[String] = None,
    ok: Option[Int] = None,
    err: Option[String] = None,
    putJson: Option[String] = None)

object WireCodec {
  import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
  private val factory = new JsonFactory()

  /** Split a wire frame into message JSON strings: a frame starting with
    * `[` is a JSON array OF JSON-ENCODED STRINGS (double-encoded batch,
    * gun/websocket.go:141-159); anything else is a single message.
    */
  def splitFrame(frame: String): Seq[String] = {
    val t = frame.dropWhile(_.isWhitespace)
    if (!t.startsWith("[")) Seq(frame)
    else {
      val out = Seq.newBuilder[String]
      val p = factory.createParser(frame)
      try {
        if (p.nextToken() == JsonToken.START_ARRAY) {
          while (p.nextToken() == JsonToken.VALUE_STRING) out += p.getText
        }
      } finally p.close()
      out.result()
    }
  }

  /** Encode messages into one frame: single message as-is; several as the
    * double-encoded batch array (gun/websocket.go:92-108).
    */
  def joinFrame(messages: Seq[String]): String =
    if (messages.sizeIs == 1) messages.head
    else messages.map(CanonicalJson.quote).mkString("[", ",", "]")

  /** Streaming-parse one message's envelope keys; the `put` fragment is
    * kept as raw JSON for [[GunWire.decodePutFragment]].
    */
  def decodeEnvelope(json: String): WireEnvelope = {
    var env = WireEnvelope()
    val p = factory.createParser(json)
    try {
      if (p.nextToken() == JsonToken.START_OBJECT) {
        while (p.nextToken() == JsonToken.FIELD_NAME) {
          val key = p.currentName()
          val tok = p.nextToken()
          key match {
            case "@"   => env = env.copy(ackId = Option(p.getValueAsString))
            case "#"   => env = env.copy(msgId = Option(p.getValueAsString))
            case "dam" => env = env.copy(dam = Option(p.getValueAsString))
            case "pid" => env = env.copy(pid = Option(p.getValueAsString))
            case "ok"  => env = env.copy(ok = Some(p.getValueAsInt))
            case "err" => env = env.copy(err = Option(p.getValueAsString))
            case "get" if tok == JsonToken.START_OBJECT =>
              while (p.nextToken() == JsonToken.FIELD_NAME) {
                val gk = p.currentName(); p.nextToken()
                if (gk == "#") env = env.copy(getSoul = Option(p.getValueAsString))
                else if (gk == ".") env = env.copy(getField = Option(p.getValueAsString))
              }
            case "put" if tok == JsonToken.START_OBJECT =>
              // capture the raw put-fragment text via token offsets
              val start = p.currentTokenLocation().getCharOffset.toInt
              p.skipChildren()
              val end = p.currentLocation().getCharOffset.toInt
              env = env.copy(putJson = Some(json.substring(start, end)))
            case _ if tok == JsonToken.START_OBJECT || tok == JsonToken.START_ARRAY =>
              p.skipChildren()
            case _ => ()
          }
        }
      }
    } finally p.close()
    env
  }

  /** Wire JSON of a value (protocol-correct: numbers raw). */
  def valueJson(v: GunValue): String = v.kind match {
    case ValueKind.Null => "null"
    case ValueKind.Str  => CanonicalJson.quote(v.str.getOrElse(""))
    case ValueKind.Num  => v.num.getOrElse("0")
    case ValueKind.Bool => if (v.bool.contains(true)) "true" else "false"
    case ValueKind.Rel  => "{\"#\":" + CanonicalJson.quote(v.rel.getOrElse("")) + "}"
    case other          => throw new IllegalArgumentException(s"unknown kind: $other")
  }

  /** A put message for one batch of cells (gun/scoped_put.go:139-151 wire
    * shape; node JSON layout gun/node.go:33-41). State numbers format like
    * Go float64 marshaling (integral → no decimal point).
    */
  def putMessage(msgId: String, cells: Seq[GunCell]): String = {
    def stateJson(s: Double): String =
      if (s == s.floor && math.abs(s) < 1e15) s.toLong.toString else s.toString
    val bySoul = cells.groupBy(_.soul).toSeq.sortBy(_._1)
    val nodes = bySoul.map { case (soul, cs) =>
      val states = cs.map(c => CanonicalJson.quote(c.field) + ":" + stateJson(c.state))
      val values = cs.map(c => CanonicalJson.quote(c.field) + ":" + valueJson(c.value))
      CanonicalJson.quote(soul) + ":{\"_\":{\"#\":" + CanonicalJson.quote(soul) +
        ",\">\":{" + states.mkString(",") + "}}," + values.mkString(",") + "}"
    }
    "{\"#\":" + CanonicalJson.quote(msgId) + ",\"put\":{" + nodes.mkString(",") + "}}"
  }

  def getMessage(msgId: String, soul: String, field: String): String =
    "{\"#\":" + CanonicalJson.quote(msgId) + ",\"get\":{\"#\":" +
      CanonicalJson.quote(soul) + ",\".\":" + CanonicalJson.quote(field) + "}}"

  def ackMessage(ackId: String, ok: Int): String =
    "{\"@\":" + CanonicalJson.quote(ackId) + ",\"ok\":" + ok + "}"

  def damRequest: String = "{\"dam\":\"?\"}"
  def damReply(pid: String): String =
    "{\"dam\":\"?\",\"pid\":" + CanonicalJson.quote(pid) + "}"
}

/** Driver-side gun peer client: the control-plane loop of the reference's
  * `Gun` struct over a set of [[PeerConn]]s —
  *   - one receive loop per peer dispatching each message
  *     (gun/gun.go:236-259),
  *   - DAM handshake: a `dam:"?"` without pid is a request → reply with our
  *     peer id on that peer's conn; with pid records the peer's id
  *     (gun/gun.go:309-325),
  *   - ack correlation: a message whose `@` matches a registered request id
  *     is routed to that request's queue and consumed (gun/gun.go:288-297,
  *     registries :337-347),
  *   - soul-interest routing: put fragments touching a registered soul are
  *     fanned out, non-consuming (gun/gun.go:299-307, :349-359),
  *   - GOSSIP: any message not consumed by an ack listener and not a DAM
  *     control message is rebroadcast to every peer except its origin
  *     (gun/gun.go:327-329 → the concurrent fan-out of :206-234, per-peer
  *     failures isolated).
  *
  * Data-plane ingest (frames → cells → HAM merge) belongs to the Spark
  * side ([[GunSourceProvider]] → [[GunWire.framesToCells]] →
  * HamStream.updates); this class is the per-request surface (put acks,
  * one-shot gets) the reference exposes to applications.
  */
final class GunClient(conns: Seq[PeerConn], val myPid: String) extends AutoCloseable {

  /** Single-peer client (the common case). */
  def this(conn: PeerConn, myPid: String = SoulGen()) = this(Seq(conn), myPid)

  private val ackListeners = new ConcurrentHashMap[String, LinkedBlockingQueue[WireEnvelope]]()
  private val soulListeners = new ConcurrentHashMap[String, LinkedBlockingQueue[Seq[GunCell]]]()
  private val peerPids = new ConcurrentHashMap[Integer, String]()
  @volatile private var running = true

  /** The recorded pid of peer `i` (from its DAM reply). */
  def peerPidOf(i: Int): Option[String] = Option(peerPids.get(Int.box(i)))
  def peerPid: Option[String] = peerPidOf(0)

  private val loops = conns.zipWithIndex.map { case (conn, idx) =>
    val t = new Thread(() => {
      while (running) {
        conn.receive(50).foreach { frame =>
          // One malformed message or a failed reply-send (e.g. the DAM
          // reply to a peer that died mid-handshake) must not kill this
          // peer's receive loop — the reference's loop likewise treats a
          // per-message error as that message's problem, not the conn's
          // (gun/gun.go:236-259).
          try WireCodec.splitFrame(frame).foreach(m =>
            onMessage(m, WireCodec.decodeEnvelope(m), idx))
          catch { case e: Exception =>
            System.err.println(s"[gun-client] peer $idx message dropped: $e")
          }
        }
      }
    }, s"gun-client-receive-$idx")
    t.setDaemon(true)
    t.start()
    t
  }

  /** Concurrent fan-out send with per-peer failure isolation
    * (gun/gun.go:206-234): returns the indexes that failed.
    */
  private def fanOut(frame: String, ignorePeer: Int = -1): Seq[Int] =
    conns.zipWithIndex
      .filter(_._2 != ignorePeer)
      .flatMap { case (c, i) =>
        try { c.send(frame); None }
        catch { case _: Exception => Some(i) }
      }

  private def onMessage(raw: String, env: WireEnvelope, sourceIdx: Int): Unit = {
    // ack-id listeners consume the message (gun/gun.go:288-297)
    val consumed = env.ackId.flatMap(id => Option(ackListeners.get(id))) match {
      case Some(q) => q.put(env); true
      case None    => false
    }
    if (!consumed) {
      // soul listeners: non-consuming fan-out (gun/gun.go:299-307)
      env.putJson.foreach { put =>
        val cells = GunWire.decodePutFragment(put)
        cells.groupBy(_.soul).foreach { case (soul, cs) =>
          Option(soulListeners.get(soul)).foreach(_.put(cs))
        }
      }
      // DAM request/record (gun/gun.go:309-325) — consumed, never gossiped
      env.dam match {
        case Some(_) =>
          env.pid match {
            case None      => conns(sourceIdx).send(WireCodec.damReply(myPid))
            case Some(pid) => peerPids.put(Int.box(sourceIdx), pid)
          }
        case None =>
          // unhandled ⇒ gossip rebroadcast to everyone but the origin
          // (gun/gun.go:327-329)
          if (conns.length > 1) fanOut(raw, ignorePeer = sourceIdx)
      }
    }
  }

  /** Send a put for the cells to every peer; returns the message id to
    * await acks on (first ack wins, like the reference's result channel).
    */
  def put(cells: Seq[GunCell]): String = {
    val id = SoulGen()
    ackListeners.put(id, new LinkedBlockingQueue[WireEnvelope]())
    fanOut(WireCodec.putMessage(id, cells))
    id
  }

  /** Send a one-shot get to every peer (gun/scoped_fetch.go:138-151). */
  def get(soul: String, field: String): String = {
    val id = SoulGen()
    ackListeners.put(id, new LinkedBlockingQueue[WireEnvelope]())
    fanOut(WireCodec.getMessage(id, soul, field))
    id
  }

  /** Await the next response correlated to `msgId` (remote ack for a put,
    * first answer for a get — "first response wins",
    * gun/scoped_fetch.go:80-87).
    */
  def awaitAck(msgId: String, timeoutMs: Long): Option[WireEnvelope] =
    Option(ackListeners.get(msgId))
      .flatMap(q => Option(q.poll(timeoutMs, TimeUnit.MILLISECONDS)))

  def doneWith(msgId: String): Unit = ackListeners.remove(msgId)

  /** Register interest in a soul; returns the queue updates arrive on. */
  def subscribeSoul(soul: String): LinkedBlockingQueue[Seq[GunCell]] = {
    val q = new LinkedBlockingQueue[Seq[GunCell]]()
    soulListeners.put(soul, q)
    q
  }

  def unsubscribeSoul(soul: String): Unit = soulListeners.remove(soul)

  /** Initiate the DAM handshake (server side sends dam:"?" on connect,
    * gun/server.go:55; a client may also ask).
    */
  def sendDamRequest(): Unit = fanOut(WireCodec.damRequest)

  override def close(): Unit = {
    running = false
    loops.foreach(_.join(500))
    ackListeners.clear()
    soulListeners.asScala.keys.foreach(soulListeners.remove)
  }
}
