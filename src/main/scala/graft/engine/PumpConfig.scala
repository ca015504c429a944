package graft.engine

/** S3 — the engine's "catalog": a typed config object standing in for the
  * reference's gcfg INI file (`/root/reference/conf.go:7-95`,
  * `config.go:24-43`, example `docker/2020.01.28/conf/
  * pump-plus-emqx-example.ini`). Field names and defaults mirror the
  * reference sections; buffer-size clamps follow the per-stage [min,max]
  * ranges (`pump_pipe.go:3-4`, `data_processor.go:9-10`,
  * `data_adapter.go:13-14`, `data_dbstore.go:16-17`, `monitor.go:9-10`).
  */
final case class SourceMqtt(
    server: String = "tcp://127.0.0.1:1883",
    username: String = "",
    password: String = "",
    qos: Int = 0,
    /** CONNECT clean-session flag (`conf.go:29`, `mqtt.go:42`) */
    cleanSession: Boolean = true,
    /** PINGRESP wait before declaring the link dead (`conf.go:31`) */
    pingTimeoutSecs: Int = 10,
    /** CONNECT keepalive interval (`conf.go:32`) */
    keepAliveSecs: Int = 60,
    topicRoot: String = "pump",
    topicPrefix: String = "data",
    enableGroupNum: Boolean = true,
    beginGroupNum: Int = 0,
    endGroupNum: Int = 4)

final case class MonitorMqtt(
    server: String = "tcp://127.0.0.1:1883",
    username: String = "",
    password: String = "",
    qos: Int = 0,
    cleanSession: Boolean = true,
    pingTimeoutSecs: Int = 10,
    keepAliveSecs: Int = 60,
    topicRoot: String = "pump_monitor",
    publishIntervalSecs: Int = 5,
    bufferSize: Int = 32)

final case class DbStore(
    database: String = "pump",
    rawTable: String = "raw_message",
    adapterTable: String = "json_message",
    compress: Boolean = true,
    commitIntervalSecs: Int = 5, // DBCommitInterval (data_dbstore.go:19)
    commitItems: Int = 64,       // DBObjectItemsSize (data_dbstore.go:18)
    bufferSize: Int = 8,
    // the reference's full ClickHouseConf (conf.go:46-55). hostname ""
    // (no [clickhouse] endpoint in the INI) = parquet sinks only — the
    // live writer engages from Main.run only when one is named. Scheme
    // picks the protocol: `tcp` = the native wire protocol on port 9000
    // (the reference DSN's own scheme, data_dbstore.go:85 — the shipped
    // INIs work verbatim), `http`/`https` = the HTTP interface on 8123.
    scheme: String = "http",
    hostname: String = "",
    port: Int = 8123,
    username: String = "",
    password: String = "",
    debug: Boolean = false)

final case class PumpConfig(
    source: SourceMqtt = SourceMqtt(),
    monitor: MonitorMqtt = MonitorMqtt(),
    db: DbStore = DbStore(),
    /** the JSON sample driving A6 schema inference (`conf.go:89`) */
    jsonSample: String = PumpConfig.GoldenSample,
    midLength: Int = 8,
    pipeBufferSize: Int = 8,
    processorBufferSize: Int = 16,
    adapterBufferSize: Int = 16) {

  def clamp(v: Int, lo: Int, hi: Int): Int = math.max(lo, math.min(hi, v))

  /** Topic set: `root/prefix/<n>` per group when group numbering is on,
    * else the wildcard `root/prefix/#` (`mqtt.go:69-89`, `main.go:110-121`).
    */
  def sourceTopics: Seq[String] =
    if (source.enableGroupNum)
      (source.beginGroupNum to source.endGroupNum)
        .map(n => s"${source.topicRoot}/${source.topicPrefix}/$n")
    else Seq(s"${source.topicRoot}/${source.topicPrefix}/#")

  /** Monitor publish topic: slashes in the source topic sanitized to
    * underscores (`mqtt.go:91-103`).
    */
  def monitorTopic(sourceTopic: String): String =
    s"${monitor.topicRoot}/${sourceTopic.replace("/", "_")}"
}

object PumpConfig {
  /** The canonical 2-record sample shipped in every reference config
    * (`docker/2020.01.28/conf/pump-plus-emqx-example.ini:66`).
    */
  val GoldenSample: String =
    """{"1": {"command": "property.publish", "params": {"thingKey": "545420B443E8455335363335520C6E6B", "ts": "2020-01-05T20:31:00Z", "key": "ut", "value": 564}}, "2": {"command": "property.publish", "params": {"thingKey": "545420B443E8455335363335520C7777", "ts": "2020-01-06T21:31:00Z", "key": "ut", "value": 128}}}"""
}
