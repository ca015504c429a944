package graft.sinks

import graft.SparkSpec
import graft.engine.{Adapter, JsonInference, PumpConfig}
import org.apache.spark.sql.functions._

/** The live ClickHouse writer path end-to-end against the HTTP
  * mini-server: K1 DDL executed verbatim over the wire, the
  * golden-transcript sample inserted through the REAL distributed
  * writer (foreachPartition POSTs, gzip compress=true), read back over
  * HTTP — the same gap-closing pattern MqttMiniServer used for S1
  * (reference anchor `data_dbstore.go:336-421`, the two batched-insert
  * loops; `:70-148`, connect-time DDL bootstrap).
  */
class ClickHouseHttpSinkSpec extends SparkSpec {
  import spark.implicits._

  private val inf = JsonInference.inferFromSample(PumpConfig.GoldenSample)

  private def goldenFrames() = {
    val msgs = Seq(("m1", PumpConfig.GoldenSample),
      ("m2", PumpConfig.GoldenSample)).toDF("mid", "payload")
    val raw = Adapter.rawProjection(msgs, $"mid", lit("pump/data/0"),
      $"payload", to_timestamp(lit("2020-01-05 20:31:00")))
      // collect_date is MATERIALIZED in the ClickHouse DDL — the server
      // refuses explicit inserts into it (as real ClickHouse does); the
      // Spark-side column exists for the parquet-partitioning twin
      .drop("collect_date")
    val adapter = Adapter.adapt(msgs, "payload", inf, Seq("mid"))
      .withColumn("collect_datetime", to_timestamp(lit("2020-01-05 20:31:00")))
    (raw, adapter)
  }

  test("golden sample through the real writer: DDL + gzip batched " +
    "inserts + HTTP read-back, materialized collect_date computed " +
    "server-side") {
    val server = new ClickHouseMiniServer()
    try {
      val ep = ClickHouseHttpSink.Endpoint(server.url) // compress=true
      ClickHouseHttpSink.ensureTables(ep, "pump", "Raw_Message",
        "Json_Message", inf)
      val (raw, adapter) = goldenFrames()
      ClickHouseHttpSink.dualWriter(ep, "pump.Raw_Message",
        "pump.Json_Message")(raw, adapter)

      // read back over the same HTTP interface
      val rawLines = ClickHouseHttpSink.query(ep,
        "SELECT * FROM pump.Raw_Message FORMAT JSONEachRow")
        .split("\n").filter(_.nonEmpty)
      assert(rawLines.length === 2)
      assert(rawLines.forall(_.contains("\"topic\":\"pump/data/0\"")))
      // MATERIALIZED collect_date derived from collect_datetime
      assert(rawLines.forall(_.contains("\"collect_date\":\"2020-01-05\"")))
      val cnt = ClickHouseHttpSink.query(ep,
        "SELECT count() FROM pump.Json_Message FORMAT JSONEachRow")
      assert(cnt.trim === """{"count()":4}""") // 2 msgs x 2 records
      val adRows = server.tableRows("pump.Json_Message")
      assert(adRows.count(_.get("params_value").exists(_.toDouble == 564.0)) === 2)
      assert(adRows.count(_.get("params_value").exists(_.toDouble == 128.0)) === 2)
      assert(adRows.forall(_.get("command").contains("property.publish")))
      // appending again accumulates (K4 semantics, mode append)
      ClickHouseHttpSink.appendBatch(raw, ep, "pump.Raw_Message")
      assert(server.tableRows("pump.Raw_Message").size === 4)
    } finally server.close()
  }

  test("auth: wrong credentials refused loudly, right ones accepted " +
    "(X-ClickHouse-User/Key, DSN username parity)") {
    val server = new ClickHouseMiniServer(auth = Some(("pump", "s3cret")))
    try {
      val bad = ClickHouseHttpSink.Endpoint(server.url, "pump", "wrong")
      val e = intercept[java.io.IOException] {
        ClickHouseHttpSink.exec(bad, ClickHouseDdl.createDatabase("pump"))
      }
      assert(e.getMessage.contains("Authentication failed"))
      val good = ClickHouseHttpSink.Endpoint(server.url, "pump", "s3cret")
      ClickHouseHttpSink.ensureTables(good, "pump", "Raw_Message",
        "Json_Message", inf)
      val (raw, _) = goldenFrames()
      ClickHouseHttpSink.appendBatch(raw, good, "pump.Raw_Message")
      assert(server.tableRows("pump.Raw_Message").size === 2)
    } finally server.close()
  }

  test("a failed insert throws with the server's error text (the " +
    "foreachBatch retry surface) and MATERIALIZED columns are " +
    "protocol-refused") {
    val server = new ClickHouseMiniServer()
    try {
      val ep = ClickHouseHttpSink.Endpoint(server.url)
      ClickHouseHttpSink.ensureTables(ep, "pump", "Raw_Message",
        "Json_Message", inf)
      val (raw, _) = goldenFrames()
      server.failNextRequest(500, "Code: 252. Too many parts")
      val e = intercept[org.apache.spark.SparkException] {
        ClickHouseHttpSink.appendBatch(raw.coalesce(1), ep, "pump.Raw_Message")
      }
      assert(e.getMessage.contains("Too many parts") ||
        Option(e.getCause).exists(_.getMessage.contains("Too many parts")))
      // explicit insert into the MATERIALIZED column is refused like
      // real ClickHouse — the writer path must never name it
      val withMat = Adapter.rawProjection(
        Seq(("m9", "p")).toDF("mid", "payload"), $"mid", lit("t"),
        $"payload", to_timestamp(lit("2020-01-05 20:31:00")))
      val e2 = intercept[org.apache.spark.SparkException] {
        ClickHouseHttpSink.appendBatch(withMat.coalesce(1), ep,
          "pump.Raw_Message")
      }
      assert(e2.getMessage.contains("MATERIALIZED") ||
        Option(e2.getCause).exists(_.getMessage.contains("MATERIALIZED")))
      // nothing was stored by the failed attempts beyond the 0 baseline
      assert(server.tableRows("pump.Raw_Message").isEmpty)
    } finally server.close()
  }

  test("replay convergence: the tables are ReplacingMergeTree, so a " +
    "replayed micro-batch accumulates in storage but SELECT FINAL " +
    "reads one row per message (at-least-once delivery, converged read)") {
    val server = new ClickHouseMiniServer()
    try {
      val ep = ClickHouseHttpSink.Endpoint(server.url)
      ClickHouseHttpSink.ensureTables(ep, "pump", "Raw_Message",
        "Json_Message", inf)
      val (raw, _) = goldenFrames()
      ClickHouseHttpSink.appendBatch(raw, ep, "pump.Raw_Message")
      ClickHouseHttpSink.appendBatch(raw, ep, "pump.Raw_Message") // replay
      assert(server.tableRows("pump.Raw_Message").size === 4)
      val finalMids = ClickHouseHttpSink.query(ep,
        "SELECT mid FROM pump.Raw_Message FINAL FORMAT JSONEachRow")
        .split("\n").filter(_.nonEmpty).sorted
      assert(finalMids.toSeq === Seq("{\"mid\":\"m1\"}", "{\"mid\":\"m2\"}"))
    } finally server.close()
  }

  test("DateTime encoding is pinned to UTC regardless of the executor " +
    "JVM's default zone (parity with the UTC-session parquet system of " +
    "record)") {
    val server = new ClickHouseMiniServer()
    val saved = java.util.TimeZone.getDefault
    try {
      val ep = ClickHouseHttpSink.Endpoint(server.url)
      ClickHouseHttpSink.ensureTables(ep, "pump", "Raw_Message",
        "Json_Message", inf)
      val (raw, _) = goldenFrames()
      // local[*] executors share this JVM: a non-UTC default zone here
      // IS the non-UTC-executor deployment. The old toLocalDateTime
      // encoding rendered 2020-01-06 06:31:00 (+10) under this default.
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("Australia/Brisbane"))
      ClickHouseHttpSink.appendBatch(raw, ep, "pump.Raw_Message")
      val rows = server.tableRows("pump.Raw_Message")
      assert(rows.size === 2)
      assert(rows.forall(_.get("collect_datetime")
        .contains("2020-01-05 20:31:00")))
      assert(rows.forall(_.get("collect_date").contains("2020-01-05")))
    } finally { java.util.TimeZone.setDefault(saved); server.close() }
  }

  test("binary columns are refused loudly (JSONEachRow cannot carry " +
    "raw bytes losslessly)") {
    val server = new ClickHouseMiniServer()
    try {
      val ep = ClickHouseHttpSink.Endpoint(server.url)
      ClickHouseHttpSink.ensureTables(ep, "pump", "Raw_Message",
        "Json_Message", inf)
      val bin = Seq(("b1", Array[Byte](0, -1, 127))).toDF("mid", "payload")
      val e = intercept[org.apache.spark.SparkException] {
        ClickHouseHttpSink.appendBatch(bin.coalesce(1), ep,
          "pump.Raw_Message")
      }
      def hasMsg(t: Throwable): Boolean = t != null &&
        (Option(t.getMessage).exists(_.contains("JSONEachRow")) ||
          hasMsg(t.getCause))
      assert(hasMsg(e))
      assert(server.tableRows("pump.Raw_Message").isEmpty)
    } finally server.close()
  }

  test("streaming foreachBatch drives the dual HTTP writer (K3 commit " +
    "policy: one insert transaction per micro-batch)") {
    val server = new ClickHouseMiniServer()
    try {
      val ep = ClickHouseHttpSink.Endpoint(server.url)
      ClickHouseHttpSink.ensureTables(ep, "pump", "Raw_Message",
        "Json_Message", inf)
      implicit val sqlCtx = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
      mem.addData(("s1", PumpConfig.GoldenSample), ("s2", PumpConfig.GoldenSample))
      val q = mem.toDF().toDF("mid", "payload").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val raw = Adapter.rawProjection(batch, col("mid"), lit("pump/data/1"),
            col("payload"), to_timestamp(lit("2020-01-06 21:31:00")))
            .drop("collect_date")
          val adapter = Adapter.adapt(batch, "payload", inf, Seq("mid"))
            .withColumn("collect_datetime",
              to_timestamp(lit("2020-01-06 21:31:00")))
          ClickHouseHttpSink.dualWriter(ep, "pump.Raw_Message",
            "pump.Json_Message")(raw, adapter)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(server.tableRows("pump.Raw_Message").size === 2)
      assert(server.tableRows("pump.Json_Message").size === 4)
      assert(server.tableRows("pump.Raw_Message")
        .forall(_.get("collect_date").contains("2020-01-06")))
    } finally server.close()
  }
}
