package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** S3 — INI loading against the reference's shipped example config
  * (`/root/reference/docker/2020.01.28/conf/pump-plus-emqx-example.ini`).
  */
class IniConfigSpec extends AnyFunSuite {

  private val examplePath =
    "/root/reference/docker/2020.01.28/conf/pump-plus-emqx-example.ini"

  test("parses the shipped example INI into the full config") {
    val cfg = IniConfig.fromFile(examplePath)
    assert(cfg.source.server === "tcp://127.0.0.1:1883")
    assert(cfg.source.qos === 0)
    assert(cfg.source.topicRoot === "JSON_Simulator/SimTest")
    assert(cfg.source.topicPrefix === "NZ/TestZone/TT")
    assert(cfg.source.enableGroupNum)
    assert(cfg.source.beginGroupNum === 0 && cfg.source.endGroupNum === 4)
    // 5 pipes over groups 0..4 (main.go:110-121)
    assert(cfg.sourceTopics === (0 to 4).map(n =>
      s"JSON_Simulator/SimTest/NZ/TestZone/TT/$n"))
    assert(cfg.monitor.server === "tcp://127.0.0.1:1883")
    assert(cfg.monitor.topicRoot === "Monitor/Json_Pump")
    assert(cfg.monitor.publishIntervalSecs === 5)
    assert(cfg.monitor.bufferSize === 32)
    assert(cfg.db.database === "SimTest")
    assert(cfg.db.rawTable === "raw_message")
    assert(cfg.db.adapterTable === "json_message")
    assert(cfg.db.compress)
    assert(cfg.db.bufferSize === 8)
    // the full ClickHouseConf surface (conf.go:46-55) carries through
    assert(cfg.db.scheme === "tcp" && cfg.db.hostname === "127.0.0.1"
      && cfg.db.port === 19000 && cfg.db.username === ""
      && cfg.db.password === "" && !cfg.db.debug)
    assert(cfg.midLength === 8)
    assert(cfg.pipeBufferSize === 8)
    assert(cfg.processorBufferSize === 16)
    assert(cfg.adapterBufferSize === 16)
    // session options (conf.go:29-32; example ini lines 9-11 / 38-40):
    // source cleansession=true keepalive=300, monitor cleansession=false
    assert(cfg.source.cleanSession && cfg.source.keepAliveSecs === 300
      && cfg.source.pingTimeoutSecs === 1)
    assert(!cfg.monitor.cleanSession && cfg.monitor.keepAliveSecs === 60
      && cfg.monitor.pingTimeoutSecs === 1)
  }

  test("the INI's jsonsample round-trips through schema inference to the golden DDL") {
    val cfg = IniConfig.fromFile(examplePath)
    val inf = JsonInference.inferFromSample(cfg.jsonSample)
    assert(JsonInference.ddlFragment(inf) ===
      ", command String, key_id String, params_key String, params_thingKey String, params_ts String, params_value Float64")
  }

  test("quoted values, comments, unknown keys handled (gcfg tolerance)") {
    val cfg = IniConfig.fromString(
      """[source-mqtt]
        |username = "X"   # quoted with comment
        |mystery = 42
        |[processor-info]
        |messageidlength = 12
        |""".stripMargin)
    assert(cfg.source.username === "X")
    assert(cfg.midLength === 12)
    // untouched sections keep defaults
    assert(cfg.db.rawTable === "raw_message")
  }
}
