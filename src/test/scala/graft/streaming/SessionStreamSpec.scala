package graft.streaming

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import graft.sources.MemoryBroker
import org.apache.spark.sql.streaming.Trigger

/** Streaming sessionization: custom state via flatMapGroupsWithState
  * (X5 streaming form). Sessions close by event-time timeout, so a second
  * run with watermark-advancing traffic flushes the first run's sessions.
  */
class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1704067200000L // 2024-01-01 00:00:00 UTC, ms

  private def publish(broker: String, topic: String, atMs: Long): Unit =
    MemoryBroker.get(broker).publish(topic, "x".getBytes(StandardCharsets.UTF_8),
      receivedTimeMicros = atMs * 1000L)

  private def run(broker: String, out: String): Unit = {
    val df = spark.readStream.format("pump-mqtt")
      .option("broker", broker).option("topics", "s/a,s/b").load()
    val q = SessionStream.sessions(df, "topic", "received_time", gapSecs = 60)
      .writeStream.format("parquet")
      .option("path", s"$out/data").option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
  }

  test("gap sessions close on watermark timeout with exact bounds") {
    val broker = "session-stream"
    val out = tmpDir("session-stream")
    // topic s/a: two sessions (gap 5 min between), s/b: one session
    publish(broker, "s/a", T0)
    publish(broker, "s/a", T0 + 30000) // same session (30s gap)
    publish(broker, "s/a", T0 + 330000) // 5 min later -> new session
    publish(broker, "s/b", T0 + 10000)
    run(broker, out)
    // second run: traffic far in the future advances the watermark past
    // every open session's timeout, flushing them
    publish(broker, "s/a", T0 + 7200000)
    publish(broker, "s/b", T0 + 7200000)
    run(broker, out)

    val got = spark.read.parquet(s"$out/data")
      .select("key", "start_ts", "end_ts", "n_events", "duration_ms")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp, Long, Long)]
      .collect().sortBy(r => (r._1, r._2.getTime))
    // the first three sessions are closed; the two flush events' sessions
    // are still open (no further watermark advance), so exactly 3 rows
    assert(got.length === 3, got.mkString(";"))
    assert(got(0) === (("s/a", new java.sql.Timestamp(T0),
      new java.sql.Timestamp(T0 + 30000), 2L, 30000L)))
    assert(got(1) === (("s/a", new java.sql.Timestamp(T0 + 330000),
      new java.sql.Timestamp(T0 + 330000), 1L, 0L)))
    assert(got(2) === (("s/b", new java.sql.Timestamp(T0 + 10000),
      new java.sql.Timestamp(T0 + 10000), 1L, 0L)))
  }
}
