package graft.sinks

import graft.SparkSpec
import graft.engine.{Adapter, JsonInference, PumpConfig}
import org.apache.spark.sql.functions._

/** K4/K5 against embedded Derby — a real JDBC round-trip of both sink
  * tables, DDL included.
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("raw + adapter batches insert and read back over JDBC") {
    val inf = JsonInference.inferFromSample(PumpConfig.GoldenSample)

    // Derby dialect for the DDL (MergeTree DDL is ClickHouse-only; the
    // *writer* path is engine-agnostic)
    JdbcSink.executeDdl(url,
      """CREATE TABLE raw_message (
        |  mid VARCHAR(32), topic VARCHAR(128), payload VARCHAR(4096),
        |  collect_datetime TIMESTAMP, collect_date DATE)""".stripMargin)
    JdbcSink.executeDdl(url,
      """CREATE TABLE json_message (
        |  mid VARCHAR(32), command VARCHAR(64), key_id VARCHAR(16),
        |  params_key VARCHAR(64), params_thingKey VARCHAR(64),
        |  params_ts VARCHAR(64), params_value DOUBLE)""".stripMargin)

    val msgs = Seq(("m1", PumpConfig.GoldenSample), ("m2", PumpConfig.GoldenSample))
      .toDF("mid", "payload")
    val raw = Adapter.rawProjection(msgs, $"mid", lit("pump/data/0"), $"payload",
      to_timestamp(lit("2020-01-05 20:31:00")))
    val adapter = Adapter.adapt(msgs, "payload", inf, Seq("mid"))
    JdbcSink.dualWriter(url, "raw_message", "json_message")(raw, adapter)

    val rawBack = spark.read.jdbc(url, "raw_message", new java.util.Properties())
    assert(rawBack.count() === 2)
    assert(rawBack.select("collect_date").distinct().as[java.sql.Date]
      .collect().head.toString === "2020-01-05")
    val adBack = spark.read.jdbc(url, "json_message", new java.util.Properties())
    assert(adBack.count() === 4) // 2 msgs x 2 records
    assert(adBack.filter($"params_value" === 564.0).count() === 2)
    // appending again accumulates (mode append, K4 semantics)
    JdbcSink.appendBatch(raw, url, "raw_message")
    assert(spark.read.jdbc(url, "raw_message", new java.util.Properties()).count() === 4)
  }
}
