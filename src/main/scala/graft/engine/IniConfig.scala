package graft.engine

import scala.io.Source

/** S3 — gcfg-style INI loading into [[PumpConfig]], mirroring the
  * reference's config surface (`/root/reference/conf.go:7-95`, example
  * `docker/2020.01.28/conf/pump-plus-emqx-example.ini`): sections
  * `[source-mqtt]`, `[pipe-topic]`, `[clickhouse]`, `[monitor-mqtt]`,
  * `[monitor-info]`, `[pipe-info]`, `[processor-info]`, `[adapter-info]`,
  * `[dbstore-info]`. Unknown keys are ignored (gcfg tolerance); values
  * may be quoted; `#` starts a comment; jsonsample carries escaped quotes.
  */
object IniConfig {

  /** section -> key -> value (comments stripped, quotes/escapes unwrapped). */
  def parse(text: String): Map[String, Map[String, String]] = {
    var section = ""
    val out = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Map[String, String]]
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim.toLowerCase
          out.getOrElseUpdate(section, scala.collection.mutable.Map.empty)
        } else line.indexOf('=') match {
          case -1 => // bare line, ignore
          case i =>
            val key = line.substring(0, i).trim.toLowerCase
            var v = line.substring(i + 1).trim
            // strip trailing comment (outside quotes)
            if (!v.startsWith("\"")) {
              val h = v.indexOf('#')
              if (h >= 0) v = v.substring(0, h).trim
            } else {
              // quoted value: find the closing unescaped quote
              var j = 1; var done = -1
              while (done < 0 && j < v.length) {
                if (v(j) == '"' && v(j - 1) != '\\') done = j
                j += 1
              }
              if (done > 0) v = v.substring(0, done + 1)
            }
            if (v.startsWith("\"") && v.endsWith("\"") && v.length >= 2)
              v = v.substring(1, v.length - 1).replace("\\\"", "\"")
            out.getOrElseUpdate(section, scala.collection.mutable.Map.empty)
              .update(key, v)
        }
      }
    }
    out.map { case (k, m) => k -> m.toMap }.toMap
  }

  def fromFile(path: String): PumpConfig = {
    // byte-preserving charset: shipped reference configs carry non-UTF8
    // comment bytes (GBK quotes); keys/values of interest are ASCII
    val src = Source.fromFile(path, "ISO-8859-1")
    try fromString(src.mkString) finally src.close()
  }

  def fromString(text: String): PumpConfig = {
    val ini = parse(text)
    def sec(name: String) = ini.getOrElse(name, Map.empty)
    def get(section: String, key: String, default: String): String =
      sec(section).getOrElse(key, default)
    def getInt(section: String, key: String, default: Int): Int =
      sec(section).get(key).map(_.toInt).getOrElse(default)
    def getBool(section: String, key: String, default: Boolean): Boolean =
      sec(section).get(key).map(_.toBoolean).getOrElse(default)

    def server(section: String): String =
      s"${get(section, "scheme", "tcp")}://${get(section, "hostname", "127.0.0.1")}:${get(section, "port", "1883")}"

    val d = PumpConfig()
    PumpConfig(
      source = SourceMqtt(
        server = server("source-mqtt"),
        username = get("source-mqtt", "username", ""),
        password = get("source-mqtt", "password", ""),
        qos = getInt("source-mqtt", "qos", d.source.qos),
        cleanSession = getBool("source-mqtt", "cleansession",
          d.source.cleanSession),
        pingTimeoutSecs = getInt("source-mqtt", "pingtimeout",
          d.source.pingTimeoutSecs),
        keepAliveSecs = getInt("source-mqtt", "keepalive",
          d.source.keepAliveSecs),
        topicRoot = get("source-mqtt", "topicroot", d.source.topicRoot),
        topicPrefix = {
          // reference: full topic = topicroot + topicprefix (+ "/<n>");
          // prefix begins with '/' in the INI — strip for our join rule
          val p = get("pipe-topic", "topicprefix", "/" + d.source.topicPrefix)
          if (p.startsWith("/")) p.substring(1) else p
        },
        enableGroupNum = getBool("pipe-topic", "enablegroupnum", d.source.enableGroupNum),
        beginGroupNum = getInt("pipe-topic", "begingroupnum", d.source.beginGroupNum),
        endGroupNum = getInt("pipe-topic", "endgroupnum", d.source.endGroupNum)),
      monitor = MonitorMqtt(
        server = server("monitor-mqtt"),
        username = get("monitor-mqtt", "username", ""),
        password = get("monitor-mqtt", "password", ""),
        qos = getInt("monitor-mqtt", "qos", d.monitor.qos),
        cleanSession = getBool("monitor-mqtt", "cleansession",
          d.monitor.cleanSession),
        pingTimeoutSecs = getInt("monitor-mqtt", "pingtimeout",
          d.monitor.pingTimeoutSecs),
        keepAliveSecs = getInt("monitor-mqtt", "keepalive",
          d.monitor.keepAliveSecs),
        topicRoot = get("monitor-mqtt", "topicroot", d.monitor.topicRoot),
        publishIntervalSecs = getInt("monitor-info", "publishinterval", d.monitor.publishIntervalSecs),
        bufferSize = getInt("monitor-info", "buffersize", d.monitor.bufferSize)),
      db = DbStore(
        database = get("clickhouse", "database", d.db.database),
        rawTable = get("adapter-info", "rawtablename", d.db.rawTable),
        adapterTable = get("adapter-info", "adaptertablename", d.db.adapterTable),
        compress = getBool("clickhouse", "compress", d.db.compress),
        commitIntervalSecs = d.db.commitIntervalSecs,
        commitItems = d.db.commitItems,
        bufferSize = getInt("dbstore-info", "buffersize", d.db.bufferSize),
        scheme = get("clickhouse", "scheme", d.db.scheme),
        hostname = get("clickhouse", "hostname", d.db.hostname),
        port = getInt("clickhouse", "port", d.db.port),
        username = get("clickhouse", "username", d.db.username),
        password = get("clickhouse", "password", d.db.password),
        debug = getBool("clickhouse", "debug", d.db.debug)),
      jsonSample = get("adapter-info", "jsonsample", d.jsonSample),
      midLength = getInt("processor-info", "messageidlength", d.midLength),
      pipeBufferSize = getInt("pipe-info", "buffersize", d.pipeBufferSize),
      processorBufferSize = getInt("processor-info", "buffersize", d.processorBufferSize),
      adapterBufferSize = getInt("adapter-info", "buffersize", d.adapterBufferSize))
  }
}
