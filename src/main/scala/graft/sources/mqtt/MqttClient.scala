package graft.sources.mqtt

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicInteger

import MqttCodec._

/** Minimal MQTT 3.1.1 client (QoS 0/1) over a plain socket — the
  * production transport for S1/K6, replacing the reference's paho
  * dependency (`/root/reference/mqtt.go:69-126`) with JDK-only code. The
  * reference passes its configured QoS to subscribe and publish
  * (`mqtt.go:97-103,131`); QoS 1 here means a publish blocks until the
  * broker's PUBACK (one DUP retransmit on timeout — at-least-once), and
  * inbound QoS-1 deliveries are PUBACK'd after the callback returns.
  *
  * `onMessage` runs on the reader thread, mirroring paho's callback
  * delivery (`mqtt.go:117-126` onMessageReceived); the subscriber side
  * should hand off to its own buffer — see
  * [[graft.sources.MqttBridge]].
  */
class MqttClient(host: String, port: Int, clientId: String,
                 onMessage: (String, Array[Byte]) => Unit = (_, _) => (),
                 username: String = "", password: String = "",
                 cleanSession: Boolean = true, keepAliveSecs: Int = 60,
                 pingTimeoutSecs: Int = 10,
                 scheme: String = "tcp",
                 sslTrustStore: Option[(String, String)] = None) {
  require(keepAliveSecs >= 2 && keepAliveSecs <= 0xffff,
    s"keepalive $keepAliveSecs out of [2, 65535]")
  require(pingTimeoutSecs >= 1 && pingTimeoutSecs <= 255,
    s"pingtimeout $pingTimeoutSecs out of [1, 255] (reference uint8)")

  // scheme parity with the reference's free-form broker-URL scheme
  // (`conf.go:26-27`): tcp = plain socket, ssl = JSSE TLS — the MQTT
  // protocol layer below is transport-agnostic byte streams either way
  private val socket = MqttTransport.connect(scheme, host, port, sslTrustStore)
  private val out = new DataOutputStream(socket.getOutputStream)
  private val in = new DataInputStream(socket.getInputStream)
  private val packetIds = new AtomicInteger(1)
  private val connected = new CountDownLatch(1)
  @volatile private var connackRc: Int = -1
  @volatile private var subAcked = new CountDownLatch(0)
  private val pendingAcks =
    new java.util.concurrent.ConcurrentHashMap[Int, CountDownLatch]()

  private val reader = new Thread(() => {
    try {
      while (!socket.isClosed) {
        val pkt = readPacket(in)
        pkt.packetType match {
          case PacketType.CONNACK =>
            // record the return code and release the connect latch either
            // way — the constructor turns a refusal into a loud failure
            // instead of a 10 s timeout
            connackRc = pkt.payload(1) & 0xff
            connected.countDown()
          case PacketType.SUBACK => subAcked.countDown()
          case PacketType.PUBLISH =>
            val (topic, pid, body) = parsePublish(pkt.flags, pkt.payload)
            onMessage(topic, body)
            // ack AFTER delivery: a crash between receipt and callback is
            // redelivered by the broker (at-least-once)
            pid.foreach(id => writePacket(out, PacketType.PUBACK, 0, pubackPacket(id)))
          case PacketType.PUBACK =>
            val id = ((pkt.payload(0) & 0xff) << 8) | (pkt.payload(1) & 0xff)
            Option(pendingAcks.remove(id)).foreach(_.countDown())
          case PacketType.PINGRESP =>
            lastPingResp.set(System.nanoTime())
          case _ => ()
        }
      }
    } catch { case _: Throwable => /* closed or broken */ }
    // the reader exits ONLY on a closed/broken link — close the socket
    // so a REMOTE close (broker died: EOF/reset, socket.isClosed still
    // false) becomes as loud as a local one; [[isClosed]] is what a
    // reconnect supervisor polls
    finally { try socket.close() catch { case _: Throwable => } }
  }, s"mqtt-client-$clientId")
  reader.setDaemon(true)
  reader.start()

  // a failed handshake must not leak the socket (and with it the reader
  // thread, parked in readPacket forever) — a reconnect loop retrying
  // this constructor would otherwise leak one of each per attempt
  try {
    writePacket(out, PacketType.CONNECT,
      0, connectPacket(clientId, username, password, cleanSession,
        keepAliveSecs))
    require(connected.await(10, java.util.concurrent.TimeUnit.SECONDS), "CONNACK timeout")
    require(connackRc == 0, s"CONNECT refused: CONNACK rc=$connackRc")
  } catch {
    case e: Throwable =>
      try socket.close() catch { case _: Throwable => }
      throw e
  }

  // keepalive: CONNECT advertises `keepAliveSecs`, and a spec-compliant
  // broker drops a client silent for 1.5x that — an idle subscriber (no
  // inbound traffic to ack, QoS 0) would be disconnected without this
  // loop. pingtimeout mirrors paho's SetPingTimeout (`mqtt.go:43`): a
  // broker that does not answer a PINGREQ inside the window means a
  // dead link, and closing the socket makes that LOUD (the caller's
  // reconnect policy takes over) instead of hanging a silent
  // half-open connection forever.
  // 0 = no PINGRESP ever seen, so an unanswered FIRST ping also closes
  private val lastPingResp =
    new java.util.concurrent.atomic.AtomicLong(0L)
  // the dead-link wait is CAPPED at keepalive/2 so the worst-case ping
  // interval (keepalive/2 + wait <= keepalive) stays inside the
  // broker's 1.5x-keepalive cutoff — an uncapped pingtimeout of 10 s
  // against keepalive=5 would space pings 12.5 s apart and get the
  // idle client dropped by the very mechanism this loop exists to feed
  private val pingWaitMs =
    math.min(pingTimeoutSecs * 1000L, keepAliveSecs * 1000L / 2)
  private val pinger = new Thread(() => {
    try {
      while (!socket.isClosed) {
        Thread.sleep(keepAliveSecs * 1000L / 2)
        if (!socket.isClosed) {
          val sentAt = System.nanoTime()
          ping()
          Thread.sleep(pingWaitMs)
          if (!socket.isClosed && lastPingResp.get() < sentAt)
            socket.close() // dead link: no PINGRESP inside the window
        }
      }
    }
    // a PINGREQ write onto a reset connection throws — close instead of
    // exiting silently with the socket half-open (the reader-thread
    // rationale)
    catch { case _: Throwable => () }
    finally { try socket.close() catch { case _: Throwable => } }
  }, s"mqtt-ping-$clientId")
  pinger.setDaemon(true)
  pinger.start()

  /** True once the link is down — locally closed, ping-timed-out, or
    * remotely dropped (the reader/pinger close the socket on exit).
    * The signal a reconnect policy acts on, mirroring what paho's
    * SetAutoReconnect consumes internally (the reference enables it,
    * `/root/reference/mqtt.go:41`).
    */
  def isClosed: Boolean = socket.isClosed

  def subscribe(topics: Seq[String], qos: Int = 0): Unit = {
    subAcked = new CountDownLatch(1)
    writePacket(out, PacketType.SUBSCRIBE, 0x2,
      subscribePacket(packetIds.getAndIncrement() & 0xffff, topics, qos))
    require(subAcked.await(10, java.util.concurrent.TimeUnit.SECONDS), "SUBACK timeout")
  }

  def publish(topic: String, payload: Array[Byte], qos: Int = 0): Unit =
    if (qos == 0)
      writePacket(out, PacketType.PUBLISH, 0, publishPacket(topic, payload))
    else {
      // QoS 1: block until PUBACK; one DUP retransmit, then fail loudly
      val id = { // avoid 0 — a zero packet id is a protocol error
        var n = packetIds.getAndIncrement() & 0xffff
        if (n == 0) n = packetIds.getAndIncrement() & 0xffff
        n
      }
      val acked = new CountDownLatch(1)
      pendingAcks.put(id, acked)
      // always clear the pending entry: a leaked one both accumulates on
      // a broken broker and — after the 16-bit id wraps — lets a stale
      // late PUBACK for the OLD publish falsely complete a NEW one
      try {
        val body = publishPacket(topic, payload, Some(id))
        writePacket(out, PacketType.PUBLISH, 0x2, body) // QoS-1 flags
        if (!acked.await(5, java.util.concurrent.TimeUnit.SECONDS)) {
          writePacket(out, PacketType.PUBLISH, 0x2 | 0x8, body) // DUP set
          require(acked.await(5, java.util.concurrent.TimeUnit.SECONDS),
            s"PUBACK timeout for packet $id after retransmit")
        }
      } finally pendingAcks.remove(id)
    }

  def ping(): Unit = writePacket(out, PacketType.PINGREQ, 0, Array.emptyByteArray)

  def close(): Unit = {
    try writePacket(out, PacketType.DISCONNECT, 0, Array.emptyByteArray)
    catch { case _: Throwable => }
    socket.close()
  }
}
