package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import graft.sources.mqtt.MqttCodec
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Wire-codec invariants: varint remaining-length and utf8 round-trips,
  * packet framing, topic-filter matching laws.
  */
object MqttCodecPropertySpec extends Properties("MqttCodec") {

  property("remaining-length varint round-trips (0..256MB-1)") =
    forAll(Gen.choose(0, 268435455)) { n =>
      val bos = new ByteArrayOutputStream()
      MqttCodec.writeRemainingLength(new DataOutputStream(bos), n)
      MqttCodec.readRemainingLength(
        new DataInputStream(new ByteArrayInputStream(bos.toByteArray))) == n
    }

  property("utf8 string round-trips") =
    forAll(Gen.asciiPrintableStr.suchThat(_.length < 1000)) { s =>
      val b = MqttCodec.utf8(s)
      val (back, used) = MqttCodec.readUtf8(b, 0)
      back == s && used == b.length
    }

  property("packet framing round-trips arbitrary payloads") =
    forAll(Gen.choose(1, 14), Gen.listOf(Gen.choose(-128, 127).map(_.toByte))) {
      (ptype, bytes) =>
        val payload = bytes.toArray
        val bos = new ByteArrayOutputStream()
        MqttCodec.writePacket(new DataOutputStream(bos), ptype, 0, payload)
        val pkt = MqttCodec.readPacket(
          new DataInputStream(new ByteArrayInputStream(bos.toByteArray)))
        pkt.packetType == ptype && java.util.Arrays.equals(pkt.payload, payload)
    }

  property("TopicOffsets JSON round-trips, including quoted/backslashed topic names") =
    forAll(Gen.mapOf(Gen.zip(
      Gen.oneOf(Gen.alphaNumStr.suchThat(_.nonEmpty),
        Gen.const("""weird"topic"""), Gen.const("pump/data/0"),
        Gen.const("""back\slash"""), Gen.const("""trailing\"""),
        Gen.const("""mix\"both\\""")),
      Gen.choose(0L, Long.MaxValue)))) { m =>
      TopicOffsets.fromJson(TopicOffsets(m).json()).counts == m
    }

  private val levelGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(5))
  private val topicGen = Gen.nonEmptyListOf(levelGen).map(_.take(4).mkString("/"))

  property("exact filter matches only itself") =
    forAll(topicGen, topicGen) { (a, b) =>
      MqttCodec.topicMatches(a, a) && (MqttCodec.topicMatches(a, b) == (a == b))
    }

  property("# tail filter matches any extension") =
    forAll(topicGen, topicGen) { (root, ext) =>
      MqttCodec.topicMatches(s"$root/#", s"$root/$ext")
    }
}
