package graft.streaming

import java.nio.charset.StandardCharsets

import graft.{SparkSpec, TlsTestPki}
import graft.engine.{Adapter, JsonInference, PumpConfig}
import graft.functions.RandomId
import graft.sinks.{ClickHouseHttpSink, ClickHouseMiniServer}
import graft.sources.mqtt.{MqttClient, MqttMiniServer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The reference's COMPLETE production topology, live and in-process:
  * an ssl:// MQTT broker -> the direct DSv2 subscriber -> per-batch
  * mid stamping + raw/adapter fan-out -> batched ClickHouse inserts
  * over the HTTP protocol -> read-back. Every hop is the real
  * implementation (TLS handshake, MQTT 3.1.1 codec, Spark micro-batch,
  * JSON lattice adapter, gzip JSONEachRow POSTs) — the in-process
  * stand-ins are only the BROKER and the DATABASE, exactly the two
  * services the reference's docker compose provides (EMQX +
  * ClickHouse). This is the `pump -> data_dbstore` path of
  * `/root/reference/main.go` end to end.
  */
class ReferenceTopologySpec extends SparkSpec {

  test("golden payloads flow broker -> source -> adapter -> ClickHouse " +
    "over TLS, raw and adapter tables both landing") {
    val pki = TlsTestPki.create()
    val mqtt = new MqttMiniServer(serverSocketFactory = Some(pki.serverSocketFactory))
    val ch = new ClickHouseMiniServer()
    try {
      val inf = JsonInference.inferFromSample(PumpConfig.GoldenSample)
      val ep = ClickHouseHttpSink.Endpoint(ch.url)
      ClickHouseHttpSink.ensureTables(ep, "pump", "Raw_Message",
        "Json_Message", inf)

      val df = spark.readStream.format("mqtt-direct")
        .option("host", "127.0.0.1")
        .option("port", mqtt.port.toString)
        .option("scheme", "ssl")
        .option("ssltruststore", pki.truststore)
        .option("ssltruststorepassword", pki.password)
        .option("topics", "pump/data/0")
        .load()
      val q = df.writeStream
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          if (!batch.isEmpty) {
            // the pump's own per-batch shape: batchId-seeded mid (T2,
            // replay-identical), then the T3 dual fan-out — here into
            // the live ClickHouse writer instead of parquet
            val withMid = batch.withColumn("mid",
              RandomId.random_id(8, seed = bid))
              .persist()
            try {
              val raw = Adapter.rawProjection(withMid, col("mid"),
                col("topic"), col("payload"), col("received_time"))
                .drop("collect_date") // MATERIALIZED server-side
              val adapter = Adapter.adapt(withMid, "payload", inf, Seq("mid"))
                .join(withMid.select(col("mid"),
                  col("received_time").as("collect_datetime")), Seq("mid"))
              ClickHouseHttpSink.dualWriter(ep, "pump.Raw_Message",
                "pump.Json_Message")(raw, adapter)
            } finally { withMid.unpersist(); () }
          }
        }
        .trigger(Trigger.ProcessingTime("250 milliseconds")).start()
      try {
        val initDeadline = System.currentTimeMillis() + 60000
        while (q.lastProgress == null && System.currentTimeMillis() < initDeadline)
          Thread.sleep(100)
        assert(q.lastProgress != null, "stream never initialized")

        val pub = new MqttClient("127.0.0.1", mqtt.port, "topo-pub",
          scheme = "ssl", sslTrustStore = Some((pki.truststore, pki.password)))
        (0 until 3).foreach { _ =>
          pub.publish("pump/data/0",
            PumpConfig.GoldenSample.getBytes(StandardCharsets.UTF_8))
        }
        pub.close()

        val deadline = System.currentTimeMillis() + 60000
        def rawRows() = ch.tableRows("pump.Raw_Message")
        def adRows() = ch.tableRows("pump.Json_Message")
        while ((rawRows().size < 3 || adRows().size < 6) &&
          System.currentTimeMillis() < deadline) Thread.sleep(200)

        assert(rawRows().size === 3)
        assert(adRows().size === 6) // 3 msgs x 2 records each
        // adapter values survived the whole pipe bit-exactly
        assert(adRows().count(_.get("params_value")
          .exists(_.toDouble == 564.0)) === 3)
        assert(adRows().count(_.get("params_value")
          .exists(_.toDouble == 128.0)) === 3)
        assert(adRows().forall(_.get("command").contains("property.publish")))
        // raw rows carry the topic and a server-materialized collect_date
        assert(rawRows().forall(_.get("topic").contains("pump/data/0")))
        assert(rawRows().forall(_.get("collect_date").exists(_.nonEmpty)))
        // mids: 8 chars (T2), consistent across the raw/adapter fan-out
        val rawMids = rawRows().flatMap(_.get("mid")).toSet
        val adMids = adRows().flatMap(_.get("mid")).toSet
        assert(rawMids.size === 3)
        assert(rawMids.forall(_.length === 8))
        assert(adMids === rawMids)
      } finally q.stop()
    } finally { mqtt.close(); ch.close() }
  }

  test("the same topology over the NATIVE protocol: broker -> source " +
    "-> adapter -> column-oriented block inserts on port 9000 — the " +
    "reference DSN's own interface (data_dbstore.go:85)") {
    val mqtt = new MqttMiniServer()
    val ch = new graft.sinks.ClickHouseNativeMiniServer()
    try {
      val inf = JsonInference.inferFromSample(PumpConfig.GoldenSample)
      val ep = graft.sinks.ClickHouseNativeSink.Endpoint("127.0.0.1", ch.port)
      graft.sinks.ClickHouseNativeSink.ensureTables(ep, "pump",
        "Raw_Message", "Json_Message", inf)

      val df = spark.readStream.format("mqtt-direct")
        .option("host", "127.0.0.1")
        .option("port", mqtt.port.toString)
        .option("topics", "pump/data/0")
        .load()
      val q = df.writeStream
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          if (!batch.isEmpty) {
            val withMid = batch.withColumn("mid",
              RandomId.random_id(8, seed = bid))
              .persist()
            try {
              val raw = Adapter.rawProjection(withMid, col("mid"),
                col("topic"), col("payload"), col("received_time"))
                .drop("collect_date")
              val adapter = Adapter.adapt(withMid, "payload", inf, Seq("mid"))
                .join(withMid.select(col("mid"),
                  col("received_time").as("collect_datetime")), Seq("mid"))
              graft.sinks.ClickHouseNativeSink.dualWriter(ep,
                "pump.Raw_Message", "pump.Json_Message")(raw, adapter)
            } finally { withMid.unpersist(); () }
          }
        }
        .trigger(Trigger.ProcessingTime("250 milliseconds")).start()
      try {
        val initDeadline = System.currentTimeMillis() + 60000
        while (q.lastProgress == null && System.currentTimeMillis() < initDeadline)
          Thread.sleep(100)
        assert(q.lastProgress != null, "stream never initialized")

        val pub = new MqttClient("127.0.0.1", mqtt.port, "topo-pub-tcp")
        (0 until 3).foreach { _ =>
          pub.publish("pump/data/0",
            PumpConfig.GoldenSample.getBytes(StandardCharsets.UTF_8))
        }
        pub.close()

        val deadline = System.currentTimeMillis() + 60000
        def rawRows() = ch.tableRows("pump.Raw_Message")
        def adRows() = ch.tableRows("pump.Json_Message")
        while ((rawRows().size < 3 || adRows().size < 6) &&
          System.currentTimeMillis() < deadline) Thread.sleep(200)

        assert(rawRows().size === 3)
        assert(adRows().size === 6)
        assert(adRows().count(_.get("params_value")
          .exists(_.toDouble == 564.0)) === 3)
        assert(adRows().count(_.get("params_value")
          .exists(_.toDouble == 128.0)) === 3)
        assert(rawRows().forall(_.get("topic").contains("pump/data/0")))
        assert(rawRows().forall(_.get("collect_date").exists(_.nonEmpty)))
        val rawMids = rawRows().flatMap(_.get("mid")).toSet
        assert(rawMids.size === 3)
        assert(adRows().flatMap(_.get("mid")).toSet === rawMids)
        // the native read-back agrees with the driver-side inspection
        val c = new graft.sinks.ClickHouseNativeClient("127.0.0.1", ch.port)
        try {
          val cnt = c.query("SELECT count() FROM pump.Raw_Message")
            .map(_.data.head.head).map(graft.sinks.ClickHouseWire.asString)
          assert(cnt === Seq("3"))
        } finally c.close()
      } finally q.stop()
    } finally { mqtt.close(); ch.close() }
  }

  test("an INI [clickhouse] endpoint engages the live dual sink through " +
    "the pump (Main.liveSink): parquet system of record AND batched " +
    "HTTP inserts off one micro-batch") {
    val ch = new ClickHouseMiniServer()
    try {
      val cfg = graft.engine.IniConfig.fromString(
        s"""[clickhouse]
           |scheme   = http
           |hostname = 127.0.0.1
           |port     = ${ch.port}
           |database = pump
           |compress = true
           |[adapter-info]
           |rawtablename     = raw_message
           |adaptertablename = json_message
           |""".stripMargin)
      // an unknown scheme still fails loudly at startup
      val badCfg = graft.engine.IniConfig.fromString(
        s"""[clickhouse]
           |scheme   = gopher
           |hostname = 127.0.0.1
           |port     = 19000
           |""".stripMargin)
      val err = intercept[IllegalArgumentException](graft.Main.liveSink(badCfg))
      assert(err.getMessage.contains("unsupported"))
      // no hostname -> parquet only, no live sink
      assert(graft.Main.liveSink(graft.engine.PumpConfig()).isEmpty)

      val live = graft.Main.liveSink(cfg)
      assert(live.nonEmpty)
      val inf = JsonInference.inferFromSample(cfg.jsonSample)
      val out = tmpDir("topo-ini")
      val sinks = Pump.Sinks(s"$out/raw", s"$out/adapter", s"$out/ckpt")
      import spark.implicits._
      val batch = Seq(
        ("pump/data/0", PumpConfig.GoldenSample.getBytes(StandardCharsets.UTF_8),
          java.sql.Timestamp.valueOf("2020-01-05 20:31:00")),
        ("pump/data/1", PumpConfig.GoldenSample.getBytes(StandardCharsets.UTF_8),
          java.sql.Timestamp.valueOf("2020-01-05 20:31:01")))
        .toDF("topic", "payload", "received_time")
      Pump.writeBatch(cfg, inf, sinks, live = live)(batch, 7L)

      // both sinks observed the same (row, mid) pairs
      val parquetRaw = spark.read.parquet(sinks.rawPath)
      assert(parquetRaw.count() === 2)
      val chRaw = ch.tableRows("pump.raw_message")
      val chAd = ch.tableRows("pump.json_message")
      assert(chRaw.size === 2)
      assert(chAd.size === 4)
      val parquetMids = parquetRaw.select("mid").as[String].collect().toSet
      assert(chRaw.flatMap(_.get("mid")).toSet === parquetMids)
      assert(chAd.flatMap(_.get("mid")).toSet === parquetMids)
      assert(chRaw.forall(_.get("collect_date").contains("2020-01-05")))
    } finally ch.close()
  }

  test("the reference's SHIPPED INI (scheme = tcp) drives the native-" +
    "protocol sink verbatim — no config edits beyond pointing the port " +
    "at the in-process server (data_dbstore.go:85 DSN parity)") {
    val ch = new graft.sinks.ClickHouseNativeMiniServer()
    try {
      val shipped = graft.engine.IniConfig.fromFile(
        "/root/reference/docker/2020.01.28/conf/pump-plus-emqx-example.ini")
      assert(shipped.db.scheme === "tcp") // the line that used to refuse
      assert(shipped.db.database === "SimTest")
      val cfg = shipped.copy(db = shipped.db.copy(port = ch.port,
        hostname = "127.0.0.1"))
      val live = graft.Main.liveSink(cfg)
      assert(live.nonEmpty)
      val inf = JsonInference.inferFromSample(cfg.jsonSample)
      val out = tmpDir("topo-ini-tcp")
      val sinks = Pump.Sinks(s"$out/raw", s"$out/adapter", s"$out/ckpt")
      import spark.implicits._
      val batch = Seq(
        ("pump/data/0", PumpConfig.GoldenSample.getBytes(StandardCharsets.UTF_8),
          java.sql.Timestamp.valueOf("2020-01-05 20:31:00")))
        .toDF("topic", "payload", "received_time")
      Pump.writeBatch(cfg, inf, sinks, live = live)(batch, 3L)
      val chRaw = ch.tableRows("SimTest.raw_message")
      val chAd = ch.tableRows("SimTest.json_message")
      assert(chRaw.size === 1)
      assert(chAd.size === 2)
      assert(chRaw.forall(_.get("collect_date").contains("2020-01-05")))
      val parquetMids = spark.read.parquet(sinks.rawPath)
        .select("mid").as[String].collect().toSet
      assert(chRaw.flatMap(_.get("mid")).toSet === parquetMids)
    } finally ch.close()
  }
}
