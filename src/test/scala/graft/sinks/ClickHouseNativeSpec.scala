package graft.sinks

import graft.SparkSpec
import graft.engine.{Adapter, JsonInference, PumpConfig}
import org.apache.spark.sql.functions._

/** The native-TCP-protocol writer end-to-end against the port-9000
  * mini-server: revision-54058 hello handshake, ReplacingMergeTree DDL
  * over the wire, the INSERT sample-block/data-blocks/terminator dance
  * through the REAL distributed writer (foreachPartition connections),
  * typed block read-back, replay convergence under FINAL, auth, and the
  * Exception-packet error surface — the protocol the reference's DSN
  * names (`data_dbstore.go:85`: `tcp://host:port?...`), so the shipped
  * INI's `scheme = tcp` works verbatim.
  */
class ClickHouseNativeSpec extends SparkSpec {
  import spark.implicits._

  private val inf = JsonInference.inferFromSample(PumpConfig.GoldenSample)

  private def goldenFrames() = {
    val msgs = Seq(("m1", PumpConfig.GoldenSample),
      ("m2", PumpConfig.GoldenSample)).toDF("mid", "payload")
    val raw = Adapter.rawProjection(msgs, $"mid", lit("pump/data/0"),
      $"payload", to_timestamp(lit("2020-01-05 20:31:00")))
      .drop("collect_date") // MATERIALIZED server-side
    val adapter = Adapter.adapt(msgs, "payload", inf, Seq("mid"))
      .withColumn("collect_datetime", to_timestamp(lit("2020-01-05 20:31:00")))
    (raw, adapter)
  }

  test("golden sample through the native writer: hello, DDL, sample-" +
    "block INSERT dance, typed read-back, MATERIALIZED collect_date " +
    "computed server-side") {
    val server = new ClickHouseNativeMiniServer()
    try {
      val ep = ClickHouseNativeSink.Endpoint("127.0.0.1", server.port)
      ClickHouseNativeSink.ensureTables(ep, "pump", "Raw_Message",
        "Json_Message", inf)
      val (raw, adapter) = goldenFrames()
      ClickHouseNativeSink.dualWriter(ep, "pump.Raw_Message",
        "pump.Json_Message")(raw, adapter)

      val rows = server.tableRows("pump.Raw_Message")
      assert(rows.size === 2)
      assert(rows.forall(_.get("topic").contains("pump/data/0")))
      assert(rows.forall(_.get("collect_datetime")
        .contains("2020-01-05 20:31:00")))
      // MATERIALIZED toDate(collect_datetime), computed on insert
      assert(rows.forall(_.get("collect_date").contains("2020-01-05")))
      assert(rows.map(_("mid")).toSet === Set("m1", "m2"))

      // read back over the native protocol itself
      val c = new ClickHouseNativeClient("127.0.0.1", server.port)
      try {
        val cnt = c.query("SELECT count() FROM pump.Json_Message")
        assert(cnt.map(_.data.head.head).map(ClickHouseWire.asString)
          === Seq("4")) // 2 msgs x 2 records
        val blocks = c.query("SELECT mid, params_value FROM pump.Json_Message")
        val vals = blocks.flatMap { b =>
          val mid = b.data(0).map(ClickHouseWire.asString)
          val pv = b.data(1)
          mid.zip(pv)
        }
        assert(vals.count { case (_, v) => v == 564.0 } === 2)
        assert(vals.count { case (_, v) => v == 128.0 } === 2)
      } finally c.close()
    } finally server.close()
  }

  test("replay convergence: a replayed batch accumulates in storage " +
    "but SELECT FINAL over the ReplacingMergeTree key reads one row " +
    "per message (at-least-once delivery, converged read)") {
    val server = new ClickHouseNativeMiniServer()
    try {
      val ep = ClickHouseNativeSink.Endpoint("127.0.0.1", server.port)
      ClickHouseNativeSink.ensureTables(ep, "pump", "Raw_Message",
        "Json_Message", inf)
      val (raw, _) = goldenFrames()
      ClickHouseNativeSink.appendBatch(raw, ep, "pump.Raw_Message")
      // the foreachBatch replay: same rows, same mids
      ClickHouseNativeSink.appendBatch(raw, ep, "pump.Raw_Message")
      assert(server.tableRows("pump.Raw_Message").size === 4)
      val c = new ClickHouseNativeClient("127.0.0.1", server.port)
      try {
        def count(sql: String) = c.query(sql)
          .map(_.data.head.head).map(ClickHouseWire.asString).head
        assert(count("SELECT count() FROM pump.Raw_Message") === "4")
        val finalRows = c.query("SELECT mid FROM pump.Raw_Message FINAL")
        assert(finalRows.flatMap(_.data.head).map(ClickHouseWire.asString)
          .sorted === Seq("m1", "m2"))
      } finally c.close()
    } finally server.close()
  }

  test("binary payloads ride String columns byte-safely (no UTF-8 " +
    "round-trip corruption — the HTTP sink refuses these)") {
    val server = new ClickHouseNativeMiniServer()
    try {
      val ep = ClickHouseNativeSink.Endpoint("127.0.0.1", server.port)
      val c0 = new ClickHouseNativeClient("127.0.0.1", server.port)
      try c0.execute("CREATE TABLE IF NOT EXISTS blobs (mid String, " +
        "payload String) ENGINE = MergeTree ORDER BY mid")
      finally c0.close()
      val bytes = Array[Byte](0, -1, -2, 127, -128, 10, 13)
      val bin = Seq(("b1", bytes)).toDF("mid", "payload")
      ClickHouseNativeSink.appendBatch(bin.coalesce(1), ep, "blobs")
      val c = new ClickHouseNativeClient("127.0.0.1", server.port)
      try {
        val back = c.query("SELECT payload FROM blobs")
          .flatMap(_.data.head).head.asInstanceOf[Array[Byte]]
        assert(back.toSeq === bytes.toSeq)
      } finally c.close()
    } finally server.close()
  }

  test("auth: wrong credentials refused at hello with the server's " +
    "Exception packet; right ones accepted (DSN username parity)") {
    val server = new ClickHouseNativeMiniServer(auth = Some(("pump", "s3cret")))
    try {
      val e = intercept[java.io.IOException] {
        new ClickHouseNativeClient("127.0.0.1", server.port,
          user = "pump", password = "wrong")
      }
      assert(e.getMessage.contains("Authentication failed"))
      assert(e.getMessage.contains("516"))
      val ep = ClickHouseNativeSink.Endpoint("127.0.0.1", server.port,
        "pump", "s3cret")
      ClickHouseNativeSink.ensureTables(ep, "pump", "Raw_Message",
        "Json_Message", inf)
      val (raw, _) = goldenFrames()
      ClickHouseNativeSink.appendBatch(raw, ep, "pump.Raw_Message")
      assert(server.tableRows("pump.Raw_Message").size === 2)
    } finally server.close()
  }

  test("a failed insert throws with the server's Exception packet text " +
    "(the foreachBatch retry surface) and MATERIALIZED columns are " +
    "protocol-refused") {
    val server = new ClickHouseNativeMiniServer()
    try {
      val ep = ClickHouseNativeSink.Endpoint("127.0.0.1", server.port)
      ClickHouseNativeSink.ensureTables(ep, "pump", "Raw_Message",
        "Json_Message", inf)
      val (raw, _) = goldenFrames()
      server.failNextQuery(252, "Too many parts")
      def hasMsg(t: Throwable, s: String): Boolean = t != null &&
        (Option(t.getMessage).exists(_.contains(s)) || hasMsg(t.getCause, s))
      val e = intercept[org.apache.spark.SparkException] {
        ClickHouseNativeSink.appendBatch(raw.coalesce(1), ep,
          "pump.Raw_Message")
      }
      assert(hasMsg(e, "Too many parts"))
      // naming the MATERIALIZED column in the INSERT is refused before
      // any data is uploaded, like real ClickHouse
      val withMat = Adapter.rawProjection(
        Seq(("m9", "p")).toDF("mid", "payload"), $"mid", lit("t"),
        $"payload", to_timestamp(lit("2020-01-05 20:31:00")))
      val e2 = intercept[org.apache.spark.SparkException] {
        ClickHouseNativeSink.appendBatch(withMat.coalesce(1), ep,
          "pump.Raw_Message")
      }
      assert(hasMsg(e2, "MATERIALIZED"))
      assert(server.tableRows("pump.Raw_Message").isEmpty)
    } finally server.close()
  }

  test("executor-parallel inserts: 16 partitions drive 16 concurrent " +
    "connections with small chunked blocks — every row lands exactly " +
    "once (the no-driver-funnel claim under actual concurrency)") {
    val server = new ClickHouseNativeMiniServer()
    try {
      val ep = ClickHouseNativeSink.Endpoint("127.0.0.1", server.port)
      val c0 = new ClickHouseNativeClient("127.0.0.1", server.port)
      try c0.execute("CREATE TABLE IF NOT EXISTS bulk (mid String, " +
        "v Int64) ENGINE = MergeTree ORDER BY mid")
      finally c0.close()
      val n = 5000
      val df = spark.range(n.toLong)
        .selectExpr("CAST(id AS STRING) AS mid", "id AS v")
        .repartition(16)
      // batchSize 64 = the reference's DBObjectItemsSize: many blocks
      // per connection, interleaved across 16 sockets
      ClickHouseNativeSink.appendBatch(df, ep, "bulk", batchSize = 64)
      val rows = server.tableRows("bulk")
      assert(rows.size === n)
      assert(rows.map(_("mid")).toSet.size === n) // no dup, no loss
      assert(rows.map(_("v").toLong).sum === (0L until n).sum)
    } finally server.close()
  }

  test("ping/pong and timestamp instants: epoch-second DateTime " +
    "encoding is zone-free by construction") {
    val server = new ClickHouseNativeMiniServer()
    val saved = java.util.TimeZone.getDefault
    try {
      val c = new ClickHouseNativeClient("127.0.0.1", server.port)
      try assert(c.ping()) finally c.close()
      val ep = ClickHouseNativeSink.Endpoint("127.0.0.1", server.port)
      ClickHouseNativeSink.ensureTables(ep, "pump", "Raw_Message",
        "Json_Message", inf)
      val (raw, _) = goldenFrames()
      // a non-UTC default zone cannot shift an epoch-second instant
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("Australia/Brisbane"))
      ClickHouseNativeSink.appendBatch(raw, ep, "pump.Raw_Message")
      val rows = server.tableRows("pump.Raw_Message")
      assert(rows.forall(_.get("collect_datetime")
        .contains("2020-01-05 20:31:00")))
      assert(rows.forall(_.get("collect_date").contains("2020-01-05")))
    } finally { java.util.TimeZone.setDefault(saved); server.close() }
  }
}
