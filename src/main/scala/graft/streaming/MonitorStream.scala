package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.engine.{Monitor, PumpConfig}
import graft.sources.MemoryBroker

/** The monitor as a second streaming query — SURVEY §2.5 G1-G6 + K6.
  *
  * The reference's monitor goroutine counts stage events and publishes a
  * nested JSON metrics document to `monitor_topicroot/<sanitized topic>`
  * every `publishinterval` seconds (`/root/reference/monitor.go:108-189`,
  * `mqtt.go:91-103`). Here the instrumentation events are the source
  * stream itself: a tumbling event-time window aggregates per-topic
  * count/bytes, rates are normalized by the window length, and the
  * assembled document is published back through the broker seam inside
  * `foreachBatch` (K6 — a plain client call, no Spark extension needed,
  * SURVEY §4.3).
  *
  * `withWatermark` bounds the aggregation state — a documented improvement
  * over the reference's unbounded wall-clock ticker (SURVEY §2.7): without
  * it a long-running stream at scale would accumulate window state
  * forever.
  */
object MonitorStream {

  /** The windowed metrics aggregate (shared batch/streaming shape).
    * In append mode a window only emits once the watermark passes its end;
    * the delay bounds how long late instrumentation events are admitted.
    */
  def metricsAgg(source: DataFrame, windowSecs: Int,
                 watermarkDelay: String = "30 seconds"): DataFrame =
    source
      .withWatermark("received_time", watermarkDelay)
      .groupBy(window(col("received_time"), s"$windowSecs seconds"), col("topic"))
      .agg(
        count(lit(1)).as("events"),
        sum(length(col("payload")) + length(col("topic")) + lit(4)).as("bytes"))
      .select(
        col("window.start").as("window_start"),
        col("topic"),
        col("events"),
        col("bytes"),
        round(col("events").cast("double") / windowSecs, 6).as("events_per_sec"),
        round(col("bytes").cast("double") / windowSecs, 6).as("bytes_per_sec"))

  /** G6 document + K6 publish to `monitorRoot/<topic with / -> _>`. */
  def start(spark: SparkSession, cfg: PumpConfig, brokerName: String,
            checkpoint: String, trigger: Trigger = null,
            watermarkDelay: String = "30 seconds"): StreamingQuery = {
    val source = spark.readStream
      .format("pump-mqtt")
      .option("broker", brokerName)
      .option("topics", cfg.sourceTopics.mkString(","))
      .load()
    val agg = metricsAgg(source, cfg.monitor.publishIntervalSecs, watermarkDelay)
    val doc = agg.withColumn("doc", to_json(struct(
      struct(col("topic"), col("window_start")).as("Info"),
      struct(col("events"), col("bytes"), col("events_per_sec"),
        col("bytes_per_sec")).as("DataInfo"))))
    val t = if (trigger != null) trigger
            else Trigger.ProcessingTime(s"${cfg.monitor.publishIntervalSecs} seconds")
    // Update mode mirrors the reference's ticker: each trigger publishes the
    // windows touched this interval (partial counts included), rather than
    // waiting for the watermark to close them — `monitor.go:178-189`
    // publishes-then-resets every tick. The watermark still bounds state.
    doc.writeStream
      .queryName("graft-monitor")
      .outputMode("update")
      .trigger(t)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val broker = MemoryBroker.get(brokerName)
        // K6: per-row publish via the broker client (driver-side per batch;
        // use foreachPartition for a network client at scale)
        batch.select(col("topic"), col("doc")).collect().foreach { r =>
          broker.publish(cfg.monitorTopic(r.getString(0)),
            r.getString(1).getBytes(StandardCharsets.UTF_8))
        }
      }
      .start()
  }
}
