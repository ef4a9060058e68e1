package graft.sources

import java.io.{InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64
import java.util.concurrent.LinkedBlockingQueue

/** Minimal RFC 6455 websocket SERVER accept path for gun peers — the half
  * the reference left unfinished (`gun/server.go:59` is `panic("TODO")`;
  * the accept scaffold is gun/server.go:8-60). Text frames only (the gun
  * protocol is JSON text, gun/websocket.go:92-161); handles client
  * masking, 16/64-bit extended lengths, fragmentation, ping/pong, and
  * close. Built on the JDK only (ServerSocket + SHA-1 + Base64).
  *
  * Each accepted connection surfaces as a [[PeerConn]], so the same
  * `GunClient` / DSv2-source machinery drives server-side sessions —
  * mirroring the reference's design where a server peer runs the same
  * `onPeerMessage` loop as a dialed one (gun/gun.go:236-259). Like the
  * reference's server (gun/server.go:55), a `dam:"?"` identification
  * request is sent to every new peer on connect.
  */
final class GunWebSocketServer(
    port: Int,
    onPeer: PeerConn => Unit,
    sendDamOnConnect: Boolean = true) extends AutoCloseable {

  private val server = new ServerSocket(port)
  @volatile private var running = true

  /** Bound port (useful with port 0 = ephemeral). */
  def boundPort: Int = server.getLocalPort

  private val acceptLoop = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), "gun-ws-server-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception if !running => () case _: Exception => () }
    }
  }, "gun-ws-server-accept")
  acceptLoop.setDaemon(true)
  acceptLoop.start()

  private def handle(sock: Socket): Unit = {
    val in = sock.getInputStream
    val out = sock.getOutputStream
    if (!handshake(in, out)) { sock.close(); return }
    val conn = new ServerSideConn(sock, in, out)
    if (sendDamOnConnect) conn.send(WireCodec.damRequest)
    onPeer(conn)
    conn.readLoop() // runs on this connection thread until close
  }

  /** HTTP Upgrade handshake: read headers, answer 101 with the accept key
    * (SHA-1 of key + RFC 6455 GUID, base64). Headers are read byte-by-byte
    * off the raw stream — a buffered reader could over-read into websocket
    * frames a fast peer pipelines right after its request, and those bytes
    * would be lost to the frame loop.
    */
  private def handshake(in: InputStream, out: OutputStream): Boolean = {
    def readLine(): String = {
      val sb = new StringBuilder
      var b = in.read()
      while (b >= 0 && b != '\n') {
        if (b != '\r') sb.append(b.toChar)
        b = in.read()
      }
      if (b < 0 && sb.isEmpty) null else sb.toString
    }
    var key: String = null
    var line = readLine()
    if (line == null || !line.startsWith("GET ")) return false
    line = readLine()
    while (line != null && line.nonEmpty) {
      val i = line.indexOf(':')
      if (i > 0 && line.substring(0, i).equalsIgnoreCase("Sec-WebSocket-Key"))
        key = line.substring(i + 1).trim
      line = readLine()
    }
    if (key == null) return false
    val accept = Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1").digest(
        (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11")
          .getBytes(StandardCharsets.US_ASCII)))
    out.write(
      ("HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(StandardCharsets.US_ASCII))
    out.flush()
    true
  }

  /** One accepted connection as a frame-level PeerConn. */
  private final class ServerSideConn(sock: Socket, in: InputStream, out: OutputStream)
      extends PeerConn {
    private val inbox = new LinkedBlockingQueue[String]()
    @volatile private var open = true

    override def send(frame: String): Unit = out.synchronized {
      if (open) { writeFrame(0x1, frame.getBytes(StandardCharsets.UTF_8)); out.flush() }
    }

    override def receive(timeoutMs: Long): Option[String] =
      Option(inbox.poll(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))

    override def isOpen: Boolean = open

    override def close(): Unit = {
      open = false
      try sock.close() catch { case _: Exception => () }
    }

    private def writeFrame(opcode: Int, payload: Array[Byte]): Unit = {
      out.write(0x80 | opcode) // FIN + opcode; server frames are unmasked
      val n = payload.length
      if (n < 126) out.write(n)
      else if (n < 65536) { out.write(126); out.write(n >> 8); out.write(n & 0xff) }
      else {
        out.write(127)
        var i = 7
        while (i >= 0) { out.write(((n.toLong >> (8 * i)) & 0xff).toInt); i -= 1 }
      }
      out.write(payload)
    }

    private def readExactly(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) throw new java.io.EOFException()
        off += r
      }
      buf
    }

    /** Frame loop: unmask client frames, reassemble fragments, answer
      * pings, deliver text messages to the inbox.
      */
    private[GunWebSocketServer] def readLoop(): Unit = {
      val message = new java.io.ByteArrayOutputStream()
      try {
        while (open) {
          val b0 = in.read()
          if (b0 < 0) throw new java.io.EOFException()
          val fin = (b0 & 0x80) != 0
          val opcode = b0 & 0x0f
          val b1 = in.read()
          val masked = (b1 & 0x80) != 0
          var len: Long = b1 & 0x7f
          if (len == 126) {
            val ext = readExactly(2)
            len = ((ext(0) & 0xff) << 8) | (ext(1) & 0xff)
          } else if (len == 127) {
            val ext = readExactly(8)
            len = ext.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xff))
          }
          val maskKey = if (masked) readExactly(4) else null
          val payload = readExactly(len.toInt)
          if (masked) {
            var i = 0
            while (i < payload.length) {
              payload(i) = (payload(i) ^ maskKey(i % 4)).toByte; i += 1
            }
          }
          opcode match {
            case 0x1 | 0x0 => // text / continuation
              message.write(payload)
              if (fin) {
                inbox.put(new String(message.toByteArray, StandardCharsets.UTF_8))
                message.reset()
              }
            case 0x9 => out.synchronized { writeFrame(0xA, payload); out.flush() } // ping→pong
            case 0x8 => open = false // close
            case _   => () // binary/pong ignored (gun is text-only)
          }
        }
      } catch { case _: Exception => open = false }
    }
  }

  override def close(): Unit = {
    running = false
    try server.close() catch { case _: Exception => () }
  }
}
