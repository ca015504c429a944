package graft.sinks

import graft.engine.{JsonInference, PumpConfig}
import org.scalatest.funsuite.AnyFunSuite

/** K1 — DDL synthesis against the golden transcript CREATE statements
  * (`/root/reference/release_20120128/readme.txt:57-73`).
  */
class ClickHouseDdlSpec extends AnyFunSuite {
  lazy val inf = JsonInference.inferFromSample(PumpConfig.GoldenSample)

  test("raw table DDL matches the reference shape") {
    val ddl = ClickHouseDdl.createRawTableClickHouse("pump", "raw_message")
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS pump.raw_message"))
    assert(ddl.contains("collect_date Date MATERIALIZED toDate(collect_datetime)"))
    assert(ddl.contains("ENGINE = MergeTree(collect_date, (mid, topic, collect_date), 8192)"))
  }

  test("adapter table DDL embeds the inferred golden columns") {
    val ddl = ClickHouseDdl.createAdapterTableClickHouse("pump", "json_message", inf)
    assert(ddl.contains(
      ", command String, key_id String, params_key String, params_thingKey String, params_ts String, params_value Float64"))
    assert(ddl.contains("ENGINE = MergeTree(collect_date, (mid, collect_date), 8192)"))
  }

  test("live-sink Replacing variants keep the reference columns and key " +
    "the message identity (replay convergence)") {
    val raw = ClickHouseDdl.createRawTableReplacing("pump", "raw_message")
    assert(raw.contains("collect_date Date MATERIALIZED toDate(collect_datetime)"))
    assert(raw.contains(
      "ENGINE = ReplacingMergeTree PARTITION BY collect_date ORDER BY (mid, topic)"))
    val ad = ClickHouseDdl.createAdapterTableReplacing("pump", "json_message", inf)
    assert(ad.contains(
      ", command String, key_id String, params_key String, params_thingKey String, params_ts String, params_value Float64"))
    assert(ad.contains("ORDER BY (mid, command, key_id, params_key, " +
      "params_thingKey, params_ts, params_value)"))
  }

  test("spark-catalog DDL partitions by the derived collect_date") {
    val ddl = ClickHouseDdl.createAdapterTableSpark("pump", "json_message", "/tmp/x", inf)
    assert(ddl.contains("PARTITIONED BY (collect_date)"))
    assert(ddl.contains("params_value DOUBLE"))
  }
}
