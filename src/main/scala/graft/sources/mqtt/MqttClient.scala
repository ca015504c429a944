package graft.sources.mqtt

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicInteger

import MqttCodec._

/** Minimal MQTT 3.1.1 client (QoS 0) over a plain socket — the production
  * transport for S1/K6, replacing the reference's paho dependency
  * (`/root/reference/mqtt.go:69-126`) with ~100 lines of JDK-only code.
  *
  * `onMessage` runs on the reader thread, mirroring paho's callback
  * delivery (`mqtt.go:117-126` onMessageReceived); the subscriber side
  * should hand off to its own buffer — see
  * [[graft.sources.MqttBridge]].
  */
class MqttClient(host: String, port: Int, clientId: String,
                 onMessage: (String, Array[Byte]) => Unit = (_, _) => (),
                 username: String = "", password: String = "") {

  private val socket = new Socket(host, port)
  private val out = new DataOutputStream(socket.getOutputStream)
  private val in = new DataInputStream(socket.getInputStream)
  private val packetIds = new AtomicInteger(1)
  private val connected = new CountDownLatch(1)
  @volatile private var connackRc: Int = -1
  @volatile private var subAcked = new CountDownLatch(0)

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
            val (topic, used) = readUtf8(pkt.payload, 0)
            onMessage(topic,
              java.util.Arrays.copyOfRange(pkt.payload, used, pkt.payload.length))
          case PacketType.PINGRESP => ()
          case _ => ()
        }
      }
    } catch { case _: Throwable => /* closed */ }
  }, s"mqtt-client-$clientId")
  reader.setDaemon(true)
  reader.start()

  writePacket(out, PacketType.CONNECT, 0, connectPacket(clientId, username, password))
  require(connected.await(10, java.util.concurrent.TimeUnit.SECONDS), "CONNACK timeout")
  require(connackRc == 0, s"CONNECT refused: CONNACK rc=$connackRc")

  // keepalive: CONNECT advertises 60 s, and a spec-compliant broker drops
  // a client silent for 1.5x that — an idle subscriber (no inbound
  // traffic to ack, QoS 0) would be disconnected without this. The
  // reference gets the same loop from paho's SetKeepAlive/SetPingTimeout
  // options (`mqtt.go:53-56`).
  private val pinger = new Thread(() => {
    try {
      while (!socket.isClosed) {
        Thread.sleep(30000)
        if (!socket.isClosed) ping()
      }
    } catch { case _: Throwable => /* closed */ }
  }, s"mqtt-ping-$clientId")
  pinger.setDaemon(true)
  pinger.start()

  def subscribe(topics: Seq[String]): Unit = {
    subAcked = new CountDownLatch(1)
    writePacket(out, PacketType.SUBSCRIBE, 0x2,
      subscribePacket(packetIds.getAndIncrement() & 0xffff, topics))
    require(subAcked.await(10, java.util.concurrent.TimeUnit.SECONDS), "SUBACK timeout")
  }

  def publish(topic: String, payload: Array[Byte]): Unit =
    writePacket(out, PacketType.PUBLISH, 0, publishPacket(topic, payload))

  def ping(): Unit = writePacket(out, PacketType.PINGREQ, 0, Array.emptyByteArray)

  def close(): Unit = {
    try writePacket(out, PacketType.DISCONNECT, 0, Array.emptyByteArray)
    catch { case _: Throwable => }
    socket.close()
  }
}
