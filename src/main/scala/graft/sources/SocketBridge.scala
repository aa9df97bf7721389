package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.net.Socket
import java.nio.charset.StandardCharsets

/** The reference's live network adapter (examples/csp/03_using_adapters/
  * websocket/e1_websocket_client.py:10-18: an async generator wrapping
  * `websockets.connect`, yielding `(asp.now(), msg)` per message)
  * re-expressed against the DSv2 feed: a consumer thread connects to an
  * external line-oriented socket server and pushes each message into a
  * named [[GraftFeed]] stamped with its ARRIVAL time — the `now, msg`
  * contract — which Spark then consumes as a streaming table (replayable
  * backlog + live arrivals, [[graft.streaming.Crossover]]-compatible).
  *
  * One bridge = one consumer connection = one feed; N connections fan out
  * as shards via `option("shards", ...)`. The bridge is intentionally
  * dumb — framing is newline-delimited text, parsing belongs in the query
  * (the reference's client prints raw messages too).
  */
object SocketBridge {

  /** Close() drops the connection and joins the consumer thread. */
  final class Handle(socket: Socket, thread: Thread) extends AutoCloseable {
    override def close(): Unit = { socket.close(); thread.join(5000) }
  }

  /** Connect and pump lines into `feed` until the peer closes (or
    * [[Handle.close]]). `nowUs` is injectable for deterministic tests. */
  def connect(host: String, port: Int, feed: String,
              nowUs: () => Long = () => System.currentTimeMillis() * 1000L,
              connectTimeoutMs: Int = 30000): Handle = {
    // bounded connect: a SYN-blackholed peer must not hold the caller
    // for the OS default (minutes) — same discipline as WebSocketBridge
    val sock = new Socket()
    sock.connect(new java.net.InetSocketAddress(host, port), connectTimeoutMs)
    val t = new Thread(() => {
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      try {
        var line = in.readLine()
        while (line != null) {
          GraftFeed.push(feed, nowUs(), line)
          line = in.readLine()
        }
      } catch { case _: java.io.IOException => () } // connection closed
    }, s"graft-socket-$feed")
    t.setDaemon(true)
    t.start()
    new Handle(sock, t)
  }
}
