package graft.streaming

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import graft.sources.MemoryBroker
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream interval join (X18 streaming form): native watermarked
  * join with a time-range condition; every in-band pair emits exactly
  * once, out-of-band pairs never do.
  */
class IntervalJoinStreamSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1704067200000L // 2024-01-01 00:00:00 UTC, ms

  private def publish(broker: String, topic: String, body: String, atMs: Long): Unit =
    MemoryBroker.get(broker).publish(topic, body.getBytes(StandardCharsets.UTF_8),
      receivedTimeMicros = atMs * 1000L)

  test("in-band pairs join exactly once across micro-batch runs; out-of-band never") {
    val broker = "ij-stream"
    val out = tmpDir("ij-stream")
    // left 'views' on v/<user>, right 'purchases' on p/<user>; the payload
    // is the event id. Band: 600 s.
    publish(broker, "v/u1", "v1", T0)
    publish(broker, "v/u1", "v2", T0 + 300000) // 5 min
    publish(broker, "p/u1", "p1", T0 + 240000) // 4 min: in band of v1 only
    publish(broker, "p/u1", "p2", T0 + 700000) // in band of v2; 11:40 after v1 (out)
    publish(broker, "p/u2", "p3", T0 + 60000)  // other user: never joins
    publish(broker, "v/u3", "v3", T0)
    publish(broker, "p/u3", "p4", T0 + 600000) // exactly at the band edge

    def run(): Unit = {
      def src(prefix: String) = spark.readStream.format("pump-mqtt")
        .option("broker", broker).option("topics", s"$prefix/u1,$prefix/u2,$prefix/u3")
        .load()
        .select(substring_index(col("topic"), "/", -1).as("user"),
          col("payload").cast("string").as("id"),
          col("received_time").as("ts"))
      val j = IntervalJoinStream.joined(
        src("v"), "id", src("p"), "id", "user", "ts",
        windowSecs = 600, delaySecs = 0)
      val q = j.writeStream.format("parquet")
        .option("path", s"$out/data").option("checkpointLocation", s"$out/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run()
    // second run with watermark-advancing traffic on both sides flushes
    // anything the first run held back, and must not re-emit pairs
    publish(broker, "v/u2", "vx", T0 + 7200000)
    publish(broker, "p/u2", "px", T0 + 7201000)
    run()

    val got = spark.read.parquet(s"$out/data")
      .select($"l_id", $"r_id", $"lag_us").as[(String, String, Long)]
      .collect().sorted.toSeq
    val expected = Seq(
      ("v1", "p1", 240000000L),
      ("v2", "p2", 400000000L),
      ("v3", "p4", 600000000L), // inclusive band edge
      ("vx", "px", 1000000L)    // the flush traffic joins too (in band)
    ).sorted
    assert(got === expected)
  }
}
