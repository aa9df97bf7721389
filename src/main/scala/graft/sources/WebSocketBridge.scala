package graft.sources

import java.io.{DataInputStream, IOException, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.security.{MessageDigest, SecureRandom}
import java.util.Base64

/** RFC 6455 WebSocket CLIENT feeding a [[GraftFeed]] — the reference's
  * adapter protocol spoken for real (examples/csp/03_using_adapters/
  * websocket/e1_websocket_client.py:10-18 wraps `websockets.connect` and
  * yields `(asp.now(), msg)` per TEXT message; websocket_server.py:5-9 is
  * the serving side). [[SocketBridge]] demonstrated the bridge shape over
  * raw line-oriented TCP; this speaks the actual wire protocol:
  *
  *  - HTTP/1.1 Upgrade handshake (§4.1): random `Sec-WebSocket-Key`,
  *    the 101 response's `Sec-WebSocket-Accept` verified against
  *    base64(SHA1(key ++ RFC-GUID)) — a failed check aborts loudly
  *    instead of pumping a non-WS byte stream into the feed.
  *  - Frame decode (§5.2): FIN/opcode, 7/16/64-bit payload lengths,
  *    fragmented TEXT messages reassembled across CONTINUATION frames;
  *    each complete message is pushed with its ARRIVAL time — the same
  *    `(now, msg)` contract as [[SocketBridge]], so everything downstream
  *    (sharding, retention, [[graft.streaming.Crossover]] handover) is
  *    unchanged.
  *  - Control frames (§5.5): PING answered with a masked PONG carrying
  *    the same payload; CLOSE echoed then the connection drops. Client
  *    frames are masked as the RFC requires; server frames are expected
  *    unmasked (BINARY messages are skipped — the reference adapter is
  *    text-only).
  *
  * One bridge = one connection = one feed; scale-out is N bridges onto N
  * feed shards consumed as one table via `option("shards", ...)` — the
  * adapter layer stays single-threaded and dumb, the ENGINE provides the
  * parallelism (the opposite of the reference's in-process event loop).
  */
object WebSocketBridge {

  private val WsGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  /** Close() drops the connection and joins the consumer thread. */
  final class Handle(socket: Socket, thread: Thread) extends AutoCloseable {
    override def close(): Unit = { socket.close(); thread.join(5000) }
    /** Blocks until the frame pump exits (peer drop, close, error). */
    private[sources] def awaitClosed(): Unit = thread.join()
  }

  private[sources] def acceptKeyFor(key: String): String =
    Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1")
        .digest((key + WsGuid).getBytes(StandardCharsets.US_ASCII)))

  /** Client frames MUST be masked (§5.3): 4 random mask bytes, payload
    * XORed byte-wise. `fin` is always set — we never fragment sends. */
  private def writeFrame(out: OutputStream, opcode: Int, payload: Array[Byte],
                         rnd: SecureRandom): Unit = {
    val header = new java.io.ByteArrayOutputStream()
    header.write(0x80 | opcode)
    val n = payload.length
    if (n < 126) header.write(0x80 | n)
    else if (n < 65536) {
      header.write(0x80 | 126); header.write(n >>> 8); header.write(n & 0xff)
    } else {
      header.write(0x80 | 127)
      (7 to 0 by -1).foreach(i => header.write(((n.toLong >>> (8 * i)) & 0xff).toInt))
    }
    val mask = new Array[Byte](4)
    rnd.nextBytes(mask)
    header.write(mask)
    val masked = payload.zipWithIndex.map { case (b, i) => (b ^ mask(i % 4)).toByte }
    header.write(masked)
    out.write(header.toByteArray)
    out.flush()
  }

  /** Hard cap on a single frame's payload: a hostile length prefix must
    * not drive a multi-GB allocation before any payload byte arrives. */
  val MaxFrameBytes: Long = 64L * 1024 * 1024
  val MaxHandshakeBytes: Int = 16 * 1024
  val MaxHandshakeHeaders: Int = 100

  /** Supervised reconnecting client — the resilience the reference's
    * live loop lacks (its `websockets.connect` adapter dies with the
    * connection and takes the whole event loop down). A supervisor
    * thread runs [[connect]], blocks until the frame pump exits (server
    * drop, network error, clean close), and reconnects with a fixed
    * backoff — the CONSUMING query never restarts: it keeps reading the
    * same [[GraftFeed]] across any number of adapter reconnects, state
    * and checkpoint intact.
    *
    * Delivery guarantees across an adapter failure (also in README):
    *  - feed → query → sink is exactly-once regardless (checkpointed
    *    offsets; rows already pushed are never lost or re-read);
    *  - the wire → feed hop is AT-LEAST-ONCE given a server that
    *    resends messages whose delivery was in doubt (the bridge cannot
    *    know what was in flight when the TCP stream died — no WS-level
    *    ack exists to prove receipt to the server);
    *  - end-to-end exactly-once therefore composes the reconnecting
    *    bridge with first-seen dedup on a message identity
    *    (`dropDuplicates` / W1) downstream — gated in
    *    WebSocketBridgeSpec ("server drop mid-stream").
    *
    * `onConnect(attempt)` fires after each successful handshake
    * (attempt 1 = the initial connection) — a test/ops hook. */
  def connectResilient(host: String, port: Int, path: String, feed: String,
                       nowUs: () => Long = () => System.currentTimeMillis() * 1000L,
                       backoffMs: Long = 500,
                       onConnect: Int => Unit = _ => ()): AutoCloseable = {
    @volatile var closed = false
    @volatile var current: Handle = null
    @volatile var inFlight: java.net.Socket = null // mid-handshake socket
    val lock = new Object
    val supervisor = new Thread(() => {
      var attempt = 0
      try while (!closed) {
        val h =
          try {
            val conn = connect(host, port, path, feed, nowUs,
              onSocket = s => lock.synchronized {
                if (closed) s.close() // racing close(): abort immediately
                else inFlight = s
              })
            attempt += 1
            lock.synchronized {
              inFlight = null
              if (closed) { conn.close(); null }
              else { current = conn; conn }
            }
          } catch {
            case _: InterruptedException | _: java.nio.channels.ClosedByInterruptException =>
              throw new InterruptedException // close(): stop retrying
            case _: Exception => // refused/half-open: retry
              // locked like every other write to the field — close()'s
              // locked read must never race an unlocked reset
              lock.synchronized { inFlight = null }; null
          }
        if (h != null) {
          // a throwing ops hook must not kill the supervisor (the
          // resilience contract) — log and keep the bridge alive
          try onConnect(attempt)
          catch { case e: Exception =>
            System.err.println(s"[graft-ws] onConnect hook failed: $e") }
          h.awaitClosed()
        }
        if (!closed) Thread.sleep(backoffMs)
      } catch { case _: InterruptedException => () } // close() interrupts
    }, s"graft-ws-supervisor-$feed")
    supervisor.setDaemon(true)
    supervisor.start()
    () => {
      lock.synchronized {
        closed = true
        // closing the raw socket is the only way to unblock a thread
        // inside the handshake's socket reads (interrupt() is a no-op
        // on blocking socket I/O)
        val s = inFlight
        if (s != null) { try s.close() catch { case _: Exception => () } }
      }
      supervisor.interrupt()
      val c = current
      if (c != null) c.close()
      supervisor.join(5000)
    }
  }

  /** Connect, perform the Upgrade handshake, then pump TEXT messages into
    * `feed` until the peer closes (or [[Handle.close]]). `nowUs` is
    * injectable for deterministic tests. */
  def connect(host: String, port: Int, path: String, feed: String,
              nowUs: () => Long = () => System.currentTimeMillis() * 1000L,
              handshakeTimeoutMs: Int = 30000,
              onSocket: Socket => Unit = _ => ()): Handle = {
    // bounded TCP connect too: a SYN-blackholed peer would otherwise
    // hold `new Socket(host, port)` for the OS default (minutes).
    // `onSocket` hands the raw socket to the caller BEFORE any blocking
    // I/O, so a supervisor's close() can abort an in-flight handshake
    // (interrupt() does not unblock socket reads).
    val sock = new Socket()
    onSocket(sock)
    sock.connect(new java.net.InetSocketAddress(host, port), handshakeTimeoutMs)
    // bounded handshake: a half-open connection must not block the
    // caller forever (no Handle exists yet, so close() is unreachable).
    // ANY handshake failure — timeout, refusal, bad accept — must close
    // the socket: a reconnect loop would otherwise leak one fd per try.
    try {
      sock.setSoTimeout(handshakeTimeoutMs)
      val rnd = new SecureRandom()
      val out = sock.getOutputStream
      // buffered: the pump reads 2-10 header bytes per frame; raw
      // socket reads would cost a syscall per byte on the hot path
      val in = new DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))

      // -- handshake (§4.1) --
      val keyBytes = new Array[Byte](16)
      rnd.nextBytes(keyBytes)
      val key = Base64.getEncoder.encodeToString(keyBytes)
      out.write(
        (s"GET $path HTTP/1.1\r\n" +
          s"Host: $host:$port\r\n" +
          "Upgrade: websocket\r\n" +
          "Connection: Upgrade\r\n" +
          s"Sec-WebSocket-Key: $key\r\n" +
          "Sec-WebSocket-Version: 13\r\n\r\n").getBytes(StandardCharsets.US_ASCII))
      out.flush()
      // Handshake is byte- and line-capped: a hostile server streaming
      // endless header bytes (each read landing inside soTimeout) must not
      // hold connect() forever or grow an unbounded line buffer. Same
      // loud-abort discipline as the bad-accept path below.
      var handshakeBytes = 0
      def readLine(): String = {
        val sb = new StringBuilder
        var c = in.read()
        while (c != -1 && c != '\n') {
          handshakeBytes += 1
          if (handshakeBytes > MaxHandshakeBytes)
            throw new IOException(
              s"websocket handshake exceeds $MaxHandshakeBytes bytes — aborting")
          if (c != '\r') sb.append(c.toChar)
          c = in.read()
        }
        sb.toString
      }
      val status = readLine()
      if (!status.contains(" 101 "))
        throw new IOException(s"websocket handshake refused: $status")
      var accept: Option[String] = None
      var headers = 0
      var line = readLine()
      while (line.nonEmpty) {
        headers += 1
        if (headers > MaxHandshakeHeaders)
          throw new IOException(
            s"websocket handshake exceeds $MaxHandshakeHeaders headers — aborting")
        val i = line.indexOf(':')
        if (i > 0 && line.substring(0, i).trim.equalsIgnoreCase("sec-websocket-accept"))
          accept = Some(line.substring(i + 1).trim)
        line = readLine()
      }
      if (!accept.contains(acceptKeyFor(key)))
        throw new IOException(
          s"websocket handshake: bad Sec-WebSocket-Accept ${accept.getOrElse("<missing>")}")
      sock.setSoTimeout(0) // the pump blocks on frames indefinitely by design
      startPump(sock, in, out, feed, nowUs, rnd)
    } catch {
      case e: Throwable =>
        try sock.close() catch { case _: IOException => () }
        throw e
    }
  }

  private def startPump(sock: Socket, in: DataInputStream, out: OutputStream,
                        feed: String, nowUs: () => Long,
                        rnd: SecureRandom): Handle = {

    // -- frame pump (§5.2) --
    val t = new Thread(() => {
      try {
        val text = new java.io.ByteArrayOutputStream() // fragment reassembly
        var inText = false
        var open = true
        while (open) {
          val b0 = in.readUnsignedByte()
          val b1 = in.readUnsignedByte()
          val fin = (b0 & 0x80) != 0
          val opcode = b0 & 0x0f
          val maskedByServer = (b1 & 0x80) != 0
          val len: Long = (b1 & 0x7f) match {
            case 126 => in.readUnsignedShort().toLong
            case 127 => in.readLong()
            case n => n.toLong
          }
          // negative = a 64-bit length with bit 63 set (hostile/corrupt)
          if (len < 0 || len > MaxFrameBytes) throw new IOException(s"bad frame length: $len")
          // RFC 6455 §5.5: control frames (opcode high bit) are ≤125
          // bytes and unfragmented — a 64 MB PING is hostile, not legal
          if ((opcode & 0x8) != 0 && (len > 125 || !fin))
            throw new IOException(s"bad control frame: opcode=$opcode len=$len fin=$fin")
          // per-MESSAGE cap: the per-frame check alone would let an
          // endless fin=0 CONTINUATION stream grow the reassembly
          // buffer without bound — the exact allocation MaxFrameBytes
          // exists to prevent
          if (opcode == 0x0 && inText && text.size().toLong + len > MaxFrameBytes)
            throw new IOException(s"fragmented message exceeds $MaxFrameBytes bytes")
          val maskKey = if (maskedByServer) {
            val m = new Array[Byte](4); in.readFully(m); m
          } else null
          val payload = new Array[Byte](len.toInt)
          in.readFully(payload)
          if (maskKey != null)
            payload.indices.foreach(i => payload(i) = (payload(i) ^ maskKey(i % 4)).toByte)
          opcode match {
            case 0x1 => // TEXT (possibly fragmented)
              text.reset(); text.write(payload); inText = true
              if (fin) {
                GraftFeed.push(feed, nowUs(), text.toString(StandardCharsets.UTF_8))
                inText = false
              }
            case 0x0 => // CONTINUATION
              if (inText) {
                text.write(payload)
                if (fin) {
                  GraftFeed.push(feed, nowUs(), text.toString(StandardCharsets.UTF_8))
                  inText = false
                }
              }
            case 0x9 => writeFrame(out, 0xA, payload, rnd) // PING -> PONG, same payload
            case 0x8 => // CLOSE: echo and drop
              try writeFrame(out, 0x8, payload, rnd) catch { case _: IOException => () }
              open = false
            case _ => () // BINARY / PONG / reserved: skipped (text-only adapter)
          }
        }
      } catch {
        case _: IOException => () // connection closed (EOFException included)
      } finally {
        try sock.close() catch { case _: IOException => () }
      }
    }, s"graft-ws-$feed")
    t.setDaemon(true)
    t.start()
    new Handle(sock, t)
  }
}
