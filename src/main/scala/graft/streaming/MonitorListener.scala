package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

import graft.engine.PumpConfig
import graft.sources.MemoryBroker

/** The monitor's *pipeline-throughput* face — the closest analog of the
  * reference's per-stage counters (SubMsgPerSec, DpMsgPerSec,
  * DbsRDOCommitPerSec..., `/root/reference/monitor.go:138-176`), fed from
  * Spark's own query progress rather than a parallel event stream.
  *
  * Per micro-batch (= per reference "tick") it publishes one JSON document
  * to `monitor_topicroot/<sanitized query name>` with: rows ingested,
  * input/processed rows-per-second (the PerSec family), batch duration
  * (the commit-latency analog), and cumulative totals + average rate since
  * start (G2/G3). Runs driver-side with zero cost on the data path —
  * instrumentation the executors never see.
  */
class MonitorListener(cfg: PumpConfig, brokerName: String)
    extends StreamingQueryListener {

  private val broker = MemoryBroker.get(brokerName)
  private val startedAt = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, Long]()
  private val totals = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, Long]()

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    startedAt.put(event.id, System.currentTimeMillis())

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val total = totals.merge(p.id, p.numInputRows, (a, b) => a + b)
    val started = Option(startedAt.get(p.id)).getOrElse(System.currentTimeMillis())
    val runtimeSecs = math.max((System.currentTimeMillis() - started) / 1000.0, 0.001)
    val doc =
      s"""{"Info":{"query":"${p.name}","batchId":${p.batchId},"timestamp":"${p.timestamp}"},
         |"PerformanceMetrics":{"batchDurationMs":${p.batchDuration},
         |"inputRowsPerSecond":${safe(p.inputRowsPerSecond)},
         |"processedRowsPerSecond":${safe(p.processedRowsPerSecond)}},
         |"DataInfo":{"numInputRows":${p.numInputRows},
         |"totalRows":$total,
         |"avgRowsPerSecondSinceStart":${fmt(total / runtimeSecs)}}}"""
        .stripMargin.replaceAll("\n", "")
    val topic = cfg.monitorTopic(Option(p.name).getOrElse(p.id.toString))
    broker.publish(topic, doc.getBytes(StandardCharsets.UTF_8))
  }

  // Locale.ROOT: default-locale formatting would emit "0,375" on
  // comma-decimal locales — invalid JSON.
  private def fmt(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

  private def safe(d: Double): String =
    if (d.isNaN || d.isInfinite) "0.0" else fmt(d)

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
    startedAt.remove(event.id); totals.remove(event.id)
  }

  override def onQueryIdle(event: QueryIdleEvent): Unit = ()
}
