package graft.sources

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** S1's transport seam. The reference subscribes to an MQTT broker
  * (`/root/reference/mqtt.go:69-89`); the Spark source below reads through
  * this trait so the same `MicroBatchStream` serves (a) the in-process
  * [[MemoryBroker]] used by tests/local mode and (b) a real network MQTT
  * client in production (paho or a raw-TCP MQTT 3.1.1 client — a network
  * dependency deliberately kept out of the oracle path, SURVEY §4.3).
  *
  * Contract: per topic, an append-only log with monotonically increasing
  * sequence numbers — that is what makes the Spark source *replayable*
  * (checkpointed offsets + re-read = at-least-once delivery; combined
  * with the pump's per-batchId idempotent sink writes it is effectively
  * exactly-once end to end — a documented improvement over the
  * reference's QoS-0 at-most-once, SURVEY §4.2).
  */
trait MessageBroker {
  /** Current end offset (count of messages ever published) for a topic. */
  def endOffset(topic: String): Long
  /** Read messages [from, until) for a topic. */
  def read(topic: String, from: Long, until: Long): Seq[BrokerMessage]
}

final case class BrokerMessage(topic: String, payload: Array[Byte], receivedTimeMicros: Long)

/** In-process append-only topic log, keyed by a broker id so multiple
  * concurrent tests don't share state. Stands in for the MQTT broker the
  * way `MemoryStream` stands in for a socket.
  */
class MemoryBroker {
  private val logs = new ConcurrentHashMap[String, ArrayBuffer[BrokerMessage]]()

  def publish(topic: String, payload: Array[Byte],
              receivedTimeMicros: Long = System.currentTimeMillis() * 1000L): Unit = {
    val log = logs.computeIfAbsent(topic, _ => ArrayBuffer.empty)
    log.synchronized { log += BrokerMessage(topic, payload, receivedTimeMicros) }
  }

  def endOffset(topic: String): Long = {
    val log = logs.get(topic)
    if (log == null) 0L else log.synchronized(log.length.toLong)
  }

  def read(topic: String, from: Long, until: Long): Seq[BrokerMessage] = {
    val log = logs.get(topic)
    if (log == null) Seq.empty
    else log.synchronized(log.slice(from.toInt, until.toInt).toSeq)
  }

  def topics: Seq[String] = logs.keys().asScala.toSeq

  /** Resolve a subscription filter to concrete topic logs: MQTT wildcard
    * filters (`+` single-level, `#` tail — the reference's non-grouped
    * `root/prefix/#` mode, `mqtt.go:73-77`) match against the current
    * topic set via the same matcher the network broker path uses
    * ([[graft.sources.mqtt.MqttCodec.topicMatches]]); a literal filter is
    * itself. Sorted for deterministic partition planning.
    */
  def expand(filter: String): Seq[String] =
    if (filter.contains('#') || filter.contains('+'))
      topics.filter(t => graft.sources.mqtt.MqttCodec.topicMatches(filter, t)).sorted
    else Seq(filter)
}

/** Named-broker registry so executors (same JVM in local mode) and the
  * driver resolve the same instance via a string option.
  */
object MemoryBroker extends MessageBroker {
  private val brokers = new ConcurrentHashMap[String, MemoryBroker]()
  def get(name: String): MemoryBroker =
    brokers.computeIfAbsent(name, _ => new MemoryBroker)

  // MessageBroker over the default instance (single-broker convenience)
  override def endOffset(topic: String): Long = get("default").endOffset(topic)
  override def read(topic: String, from: Long, until: Long): Seq[BrokerMessage] =
    get("default").read(topic, from, until)
}
