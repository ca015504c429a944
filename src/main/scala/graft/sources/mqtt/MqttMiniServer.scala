package graft.sources.mqtt

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import scala.jdk.CollectionConverters._

import MqttCodec._

/** In-process MQTT 3.1.1 broker — the test stand-in for EMQX/mosquitto
  * (the reference's docker compose ships EMQX). QoS 0 and 1: CONNECT
  * (with optional username/password auth like the reference's broker
  * config, `conf.go`/`mqtt.go:46-52`), SUBSCRIBE (with +/# wildcards and
  * per-subscription granted QoS), PUBLISH fan-out at
  * min(publish, granted) QoS with PUBACK both directions, PING,
  * DISCONNECT. One thread per connection; enough to exercise the real
  * socket path end-to-end in tests.
  *
  * @param auth when set, CONNECTs must carry exactly these
  *   (username, password) credentials; mismatches are refused with
  *   CONNACK rc=4 (bad user name or password) and the connection closed.
  */
class MqttMiniServer(port0: Int = 0, auth: Option[(String, String)] = None,
                     serverSocketFactory: Option[javax.net.ServerSocketFactory] = None) {

  // an injected factory turns the listener into a TLS endpoint (the
  // ssl:// test path: an SSLServerSocketFactory over a test keystore);
  // the MQTT session logic below is transport-agnostic either way
  private val server = serverSocketFactory
    .map(_.createServerSocket(port0)).getOrElse(new ServerSocket(port0))
  private val running = new AtomicBoolean(true)
  private val sessions = new ConcurrentHashMap[Socket, Session]()

  def port: Int = server.getLocalPort

  private class Session(val socket: Socket) {
    val out = new DataOutputStream(socket.getOutputStream)
    @volatile var subscriptions: List[(String, Int)] = Nil // (filter, granted QoS)
    // auth is enforced, not advisory: a session that skipped CONNECT (or
    // was refused) gets no service and receives no routed traffic
    @volatile var authenticated: Boolean = auth.isEmpty
    val packetIds = new java.util.concurrent.atomic.AtomicInteger(1)
  }

  private val acceptThread = new Thread(() => {
    while (running.get()) {
      try {
        val sock = server.accept()
        val sess = new Session(sock)
        sessions.put(sock, sess)
        new Thread(() => handle(sess), s"mqtt-conn-${sock.getPort}").start()
      } catch { case _: Throwable if !running.get() => /* shutting down */ }
    }
  }, "mqtt-accept")
  acceptThread.setDaemon(true)
  acceptThread.start()

  private def handle(sess: Session): Unit = {
    val in = new DataInputStream(sess.socket.getInputStream)
    try {
      while (running.get()) {
        val pkt = readPacket(in)
        pkt.packetType match {
          case PacketType.CONNECT =>
            // variable header: protocol name, level, connect flags,
            // keepalive; payload: clientId [will topic/msg] [user] [pass]
            val (_, protoUsed) = readUtf8(pkt.payload, 0)
            val flags = pkt.payload(protoUsed + 1) & 0xff
            var off = protoUsed + 4
            val (_, cidUsed) = readUtf8(pkt.payload, off); off += cidUsed
            if ((flags & 0x04) != 0) { // will flag: skip will topic + message
              val (_, wt) = readUtf8(pkt.payload, off); off += wt
              val (_, wm) = readUtf8(pkt.payload, off); off += wm
            }
            val user = if ((flags & 0x80) != 0) {
              val (u, used) = readUtf8(pkt.payload, off); off += used; Some(u)
            } else None
            val pass = if ((flags & 0x40) != 0) {
              val (p, used) = readUtf8(pkt.payload, off); off += used; Some(p)
            } else None
            val rc: Byte = auth match {
              case Some((eu, ep)) if !(user.contains(eu) && pass.contains(ep)) =>
                4 // bad user name or password (mqtt-v3.1.1-os table 3.1)
              case _ => 0
            }
            writePacket(sess.out, PacketType.CONNACK, 0, Array(0, rc))
            if (rc != 0) { sess.socket.close(); return }
            sess.authenticated = true
          case PacketType.SUBSCRIBE if !sess.authenticated =>
            sess.socket.close(); return // no service before a valid CONNECT
          case PacketType.PUBLISH if !sess.authenticated =>
            sess.socket.close(); return
          case PacketType.SUBSCRIBE =>
            var off = 2 // packet id
            val pid = ((pkt.payload(0) & 0xff) << 8) | (pkt.payload(1) & 0xff)
            var granted = List.empty[Byte]
            while (off < pkt.payload.length) {
              val (filter, used) = readUtf8(pkt.payload, off)
              val requested = pkt.payload(off + used) & 0x3
              off += used + 1
              val qos = math.min(requested, 1) // QoS 2 not supported: cap at 1
              sess.subscriptions ::= (filter, qos)
              granted ::= qos.toByte
            }
            writePacket(sess.out, PacketType.SUBACK, 0,
              Array(((pid >> 8) & 0xff).toByte, (pid & 0xff).toByte) ++ granted.reverse)
          case PacketType.PUBLISH =>
            val (topic, pid, body) = parsePublish(pkt.flags, pkt.payload)
            // QoS 1 inbound: ack the publisher (a DUP retransmit routes
            // again — at-least-once is the broker's contract too)
            pid.foreach(id =>
              writePacket(sess.out, PacketType.PUBACK, 0, pubackPacket(id)))
            route(topic, body, (pkt.flags >> 1) & 0x3)
          case PacketType.PINGREQ =>
            writePacket(sess.out, PacketType.PINGRESP, 0, Array.emptyByteArray)
          case PacketType.DISCONNECT =>
            sess.socket.close(); return
          case _ => // ignore (QoS>0 machinery not needed)
        }
      }
    } catch {
      case _: Throwable => // connection closed
    } finally sessions.remove(sess.socket)
  }

  /** Fan out to matching subscribers at min(publish QoS, granted QoS)
    * (spec §3.8.4). QoS-1 deliveries carry a fresh per-session packet id;
    * subscriber PUBACKs are accepted (ignored — no retransmission state,
    * the test broker holds no session queue).
    */
  private def route(topic: String, payload: Array[Byte], pubQos: Int = 0): Unit = {
    sessions.values().asScala.filter(_.authenticated).foreach { s =>
      val granted = s.subscriptions.collect {
        case (f, q) if topicMatches(f, topic) => q
      }
      if (granted.nonEmpty) {
        val qos = math.min(pubQos, granted.max)
        try {
          if (qos == 0)
            writePacket(s.out, PacketType.PUBLISH, 0, publishPacket(topic, payload))
          else
            writePacket(s.out, PacketType.PUBLISH, 0x2,
              publishPacket(topic, payload,
                Some(s.packetIds.getAndIncrement() & 0xffff)))
        } catch { case _: Throwable => }
      }
    }
  }

  def close(): Unit = {
    running.set(false)
    sessions.keys().asScala.foreach(s => try s.close() catch { case _: Throwable => })
    server.close()
  }
}
