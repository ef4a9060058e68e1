package graft.sources

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.util.concurrent.{ConcurrentHashMap, LinkedBlockingQueue, TimeUnit}

/** A single peer connection carrying raw wire frames (a frame = one JSON
  * message or a double-encoded batch array — [[GunWire]] is the codec).
  * Mirror of the reference's `PeerConn` interface (gun/peer.go:162-174),
  * reduced to frame transport: message-level encode/decode lives in the
  * engine, not the socket.
  */
trait PeerConn extends AutoCloseable {
  /** Send one wire frame. */
  def send(frame: String): Unit

  /** Next received frame, or None after `timeoutMs`. */
  def receive(timeoutMs: Long): Option[String]

  /** Transport liveness — lets [[ReconnectingPeerConn]] distinguish a
    * quiet peer (receive timeout) from a dead connection.
    */
  def isOpen: Boolean = true

  /** All frames currently buffered (non-blocking drain). */
  def drain(): Seq[String] = {
    val out = Seq.newBuilder[String]
    var next = receive(0)
    while (next.isDefined) { out += next.get; next = receive(0) }
    out.result()
  }
}

/** In-process transport: a pair of queues. The production analogue is the
  * websocket conn; this one backs tests and single-JVM wiring, exactly the
  * role the reference's `PeerConn` interface abstraction enables
  * (gun/peer.go:162-174 — transport is pluggable by design).
  */
final class InMemoryPeerConn private (
    in: LinkedBlockingQueue[String],
    out: LinkedBlockingQueue[String]) extends PeerConn {
  @volatile private var closed = false
  override def send(frame: String): Unit =
    if (!closed) out.put(frame)
  override def receive(timeoutMs: Long): Option[String] =
    if (closed) None else Option(in.poll(timeoutMs, TimeUnit.MILLISECONDS))
  override def isOpen: Boolean = !closed
  override def close(): Unit = closed = true
}

object InMemoryPeerConn {
  /** Two connected endpoints: what A sends, B receives, and vice versa. */
  def pair(): (InMemoryPeerConn, InMemoryPeerConn) = {
    val ab = new LinkedBlockingQueue[String]()
    val ba = new LinkedBlockingQueue[String]()
    (new InMemoryPeerConn(ba, ab), new InMemoryPeerConn(ab, ba))
  }

  /** Named registry so a Spark DSv2 source (instantiated by class name on
    * the driver) can find a conn created by the host application. Takes
    * ANY transport — in-memory pairs, dialed websockets, or server-
    * accepted connections all feed the same source.
    */
  private val registry = new ConcurrentHashMap[String, PeerConn]()
  def register(name: String, conn: PeerConn): Unit = registry.put(name, conn)
  def lookup(name: String): Option[PeerConn] = Option(registry.get(name))
  def unregister(name: String): Unit = registry.remove(name)
}

/** Self-healing transport wrapper — the reference's receive-loop
  * reconnect policy (gun/gun.go:236-259: on a failed receive, sleep and
  * retry if the peer supports reconnection; peer state machine
  * gun/peer.go:65-106; default sleep 30 s, gun/gun.go:80-82). When the
  * underlying conn reports dead, the next send/receive sleeps
  * `sleepOnErrorMs` and re-dials. Spark task retry covers executor-side
  * failures; this covers the driver-held control-plane socket.
  */
final class ReconnectingPeerConn(
    dial: () => PeerConn,
    sleepOnErrorMs: Long = 30000L) extends PeerConn {
  @volatile private var current: PeerConn = dial()
  @volatile private var closed = false

  /** Number of (re)connections made — observable for tests/metrics. */
  @volatile private var connects = 1
  def connectCount: Int = connects

  private def ensure(): PeerConn = this.synchronized {
    if (!closed && !current.isOpen) {
      Thread.sleep(sleepOnErrorMs) // sleep-then-reconnect, like the reference
      current = dial()
      connects += 1
    }
    current
  }

  override def send(frame: String): Unit = ensure().send(frame)
  override def receive(timeoutMs: Long): Option[String] = ensure().receive(timeoutMs)
  override def isOpen: Boolean = !closed
  override def close(): Unit = { closed = true; current.close() }
}

/** Websocket transport over the JDK's built-in client (java.net.http) —
  * the reference's `PeerConnWebSocket` (gun/websocket.go:14-87). Scheme
  * handling mirrors gun/peer.go:176-213: `http`/`https` URLs rewrite to
  * `ws`/`wss`. Text frames only (the gun protocol is JSON text,
  * gun/websocket.go:92-161).
  */
final class WebSocketPeerConn private (
    ws: WebSocket,
    inbox: LinkedBlockingQueue[String]) extends PeerConn {

  /** JDK WebSocket forbids overlapping text sends (IllegalStateException);
    * GunClient sends concurrently from user threads (put/get fan-out) AND
    * receive-loop threads (DAM replies, gossip), so sends serialize here.
    * The lock spans the join(): one frame is fully handed to the socket
    * before the next starts, which is also the reference's per-conn write
    * ordering (a single websocket writer, gun/websocket.go:55-66).
    */
  private val sendLock = new Object
  override def send(frame: String): Unit = sendLock.synchronized {
    ws.sendText(frame, true).join()
  }

  override def receive(timeoutMs: Long): Option[String] =
    Option(inbox.poll(timeoutMs, TimeUnit.MILLISECONDS))

  override def isOpen: Boolean = !ws.isInputClosed

  override def close(): Unit =
    try ws.sendClose(WebSocket.NORMAL_CLOSURE, "bye").join()
    catch { case _: Exception => ws.abort() } // peer already gone
}

object WebSocketPeerConn {
  /** Rewrite http(s) schemes to ws(s) like the reference's PeerURLSchemes
    * map (gun/peer.go:176-213); unknown schemes are an error there too.
    */
  def wsUri(peerUrl: String): URI = {
    val u = URI.create(peerUrl)
    u.getScheme match {
      case "ws" | "wss" => u
      case "http"  => URI.create("ws" + peerUrl.stripPrefix("http"))
      case "https" => URI.create("wss" + peerUrl.stripPrefix("https"))
      case other   => throw new IllegalArgumentException(s"Unknown peer URL scheme $other")
    }
  }

  /** Dial a peer (gun/websocket.go:14-29 DialPeerConnWebSocket). */
  def dial(peerUrl: String): WebSocketPeerConn = {
    val inbox = new LinkedBlockingQueue[String]()
    val listener = new WebSocket.Listener {
      private val sb = new StringBuilder
      override def onText(ws: WebSocket, data: CharSequence, last: Boolean)
          : java.util.concurrent.CompletionStage[_] = {
        sb.append(data)
        if (last) { inbox.put(sb.toString); sb.clear() }
        ws.request(1)
        null
      }
    }
    val ws = HttpClient.newHttpClient().newWebSocketBuilder()
      .buildAsync(wsUri(peerUrl), listener).join()
    new WebSocketPeerConn(ws, inbox)
  }
}
