package graft.sources.mqtt

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

/** Minimal MQTT 3.1.1 wire codec (public spec: mqtt-v3.1.1-os) — only the
  * packets the pump needs: CONNECT/CONNACK, SUBSCRIBE/SUBACK, PUBLISH
  * (QoS 0, matching the reference's shipped config `source-mqtt.qos = 0`),
  * PINGREQ/PINGRESP, DISCONNECT. Written against the JDK only — the
  * environment has no MQTT library, and the pump needs just this subset
  * (`/root/reference/mqtt.go` uses paho the same way).
  */
object MqttCodec {

  object PacketType {
    val CONNECT = 1; val CONNACK = 2; val PUBLISH = 3; val PUBACK = 4
    val SUBSCRIBE = 8; val SUBACK = 9
    val PINGREQ = 12; val PINGRESP = 13; val DISCONNECT = 14
  }

  final case class Packet(packetType: Int, flags: Int, payload: Array[Byte])

  def writeRemainingLength(out: DataOutputStream, n0: Int): Unit = {
    var n = n0
    do {
      var d = n % 128
      n /= 128
      if (n > 0) d |= 0x80
      out.writeByte(d)
    } while (n > 0)
  }

  def readRemainingLength(in: DataInputStream): Int = {
    var mult = 1; var value = 0; var d = 0
    do {
      d = in.readUnsignedByte()
      value += (d & 0x7f) * mult
      mult *= 128
      require(mult <= 128 * 128 * 128 * 128, "malformed remaining length")
    } while ((d & 0x80) != 0)
    value
  }

  def writePacket(out: DataOutputStream, packetType: Int, flags: Int,
                  payload: Array[Byte]): Unit = out.synchronized {
    out.writeByte((packetType << 4) | flags)
    writeRemainingLength(out, payload.length)
    out.write(payload)
    out.flush()
  }

  def readPacket(in: DataInputStream): Packet = {
    val h = in.readUnsignedByte()
    val len = readRemainingLength(in)
    val body = new Array[Byte](len)
    in.readFully(body)
    Packet(h >> 4, h & 0x0f, body)
  }

  def utf8(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](b.length + 2)
    out(0) = ((b.length >> 8) & 0xff).toByte
    out(1) = (b.length & 0xff).toByte
    System.arraycopy(b, 0, out, 2, b.length)
    out
  }

  /** (string, bytesConsumed) at offset. */
  def readUtf8(b: Array[Byte], off: Int): (String, Int) = {
    val len = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    (new String(b, off + 2, len, StandardCharsets.UTF_8), len + 2)
  }

  /** CONNECT with optional credentials — the reference sets username and
    * password on its client options when configured (`mqtt.go:46-52`);
    * per the 3.1.1 spec the password flag is only valid with the username
    * flag, so a password without a username is ignored (matching the
    * reference's `if username != ""` gate).
    */
  def connectPacket(clientId: String, username: String = "",
                    password: String = "", cleanSession: Boolean = true,
                    keepAliveSecs: Int = 60): Array[Byte] = {
    require(keepAliveSecs >= 0 && keepAliveSecs <= 0xffff,
      s"keepalive $keepAliveSecs out of [0, 65535]")
    val b = new java.io.ByteArrayOutputStream()
    b.write(utf8("MQTT"))
    b.write(4)            // protocol level 3.1.1
    // clean-session bit mirrors the reference's SetCleanSession
    // (mqtt.go:42); false = the broker resumes this clientId's session
    var flags = if (cleanSession) 0x02 else 0x00
    if (username.nonEmpty) {
      flags |= 0x80
      if (password.nonEmpty) flags |= 0x40
    }
    b.write(flags)
    b.write((keepAliveSecs >> 8) & 0xff); b.write(keepAliveSecs & 0xff)
    b.write(utf8(clientId))
    if (username.nonEmpty) {
      b.write(utf8(username))
      if (password.nonEmpty) b.write(utf8(password))
    }
    b.toByteArray
  }

  def subscribePacket(packetId: Int, topics: Seq[String], qos: Int = 0): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    b.write((packetId >> 8) & 0xff); b.write(packetId & 0xff)
    topics.foreach { t => b.write(utf8(t)); b.write(qos) }
    b.toByteArray
  }

  /** PUBLISH body; `packetId` present iff QoS > 0 (spec §3.3.2.2). */
  def publishPacket(topic: String, payload: Array[Byte],
                    packetId: Option[Int] = None): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    b.write(utf8(topic))
    packetId.foreach { id => b.write((id >> 8) & 0xff); b.write(id & 0xff) }
    b.write(payload)
    b.toByteArray
  }

  /** Decode a PUBLISH: (topic, packetId iff QoS>0, body). QoS comes from
    * the fixed-header flags bits 1-2.
    */
  def parsePublish(flags: Int, payload: Array[Byte]): (String, Option[Int], Array[Byte]) = {
    val qos = (flags >> 1) & 0x3
    val (topic, used) = readUtf8(payload, 0)
    val (pid, off) =
      if (qos > 0)
        (Some(((payload(used) & 0xff) << 8) | (payload(used + 1) & 0xff)), used + 2)
      else (None, used)
    (topic, pid, java.util.Arrays.copyOfRange(payload, off, payload.length))
  }

  def pubackPacket(packetId: Int): Array[Byte] =
    Array(((packetId >> 8) & 0xff).toByte, (packetId & 0xff).toByte)

  /** MQTT topic filter match: exact levels, `+` single-level, `#` tail. */
  def topicMatches(filter: String, topic: String): Boolean = {
    val f = filter.split("/", -1)
    val t = topic.split("/", -1)
    var i = 0
    while (i < f.length) {
      if (f(i) == "#") return true
      if (i >= t.length) return false
      if (f(i) != "+" && f(i) != t(i)) return false
      i += 1
    }
    f.length == t.length
  }
}
