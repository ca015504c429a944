package graft.streaming

import java.nio.charset.StandardCharsets

import graft.SparkSpec
import graft.engine.{JsonInference, PumpConfig}
import graft.sources.mqtt.{MqttClient, MqttMiniServer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The full reference modality composed end to end — live tcp:// MQTT
  * direct source (auto-reconnect supervisor) → [[Pump.writeBatch]]
  * dual sink (raw + adapter) → [[CurateStream.applyBatch]] over the
  * adapter output — with a broker KILL + RESTART mid-stream. Each
  * piece proved its own contract in isolation (MqttDirectSpec,
  * PumpStreamingSpec, CurateStreamSpec); this spec proves they
  * COMPOSE: the curation ledger stays exactly-once (one verdict per
  * document, ever) across the reconnect, and near-dup state written
  * before the broker died still catches near-dups arriving after it
  * came back.
  */
class FullModalitySoakSpec extends SparkSpec {

  // one JSON record per message carrying a curate-able document
  private val sample = """{"1": {"doc_id": 1, "text": "sample text"}}"""
  private def payload(id: Long, text: String): Array[Byte] =
    s"""{"1": {"doc_id": $id, "text": "$text"}}"""
      .getBytes(StandardCharsets.UTF_8)

  // the DedupStreamSpec near-dup fixtures (jaccard ~0.949 >= 0.8)
  private def text(tail: String): String =
    (1 to 39).map(i => s"tok$i").mkString(" ") + " " + tail
  private def distinctText(seed: Int): String =
    (1 to 40).map(i => s"other${seed}_$i").mkString(" ")

  test("mqtt-direct -> pump dual sink -> online curation survives a " +
    "broker kill/restart with an exactly-once ledger") {
    var server = new MqttMiniServer()
    val port = server.port
    val out = tmpDir("soak")
    val sinks = Pump.Sinks(s"$out/raw", s"$out/adapter", s"$out/ckpt")
    val curState = s"$out/curate"
    val cfg = PumpConfig(jsonSample = sample)
    val inf = JsonInference.inferFromSample(sample)

    // the composed per-batch step: dual-sink write, then curate the
    // batch AS READ BACK FROM the adapter sink (the e2e claim — the
    // ledger derives from what actually landed, not a parallel plan).
    // Both halves are idempotent per batchId, so the composition is.
    def step(batch: DataFrame, bid: Long): Unit = {
      if (batch.isEmpty) return // idle trigger: no state, no ledger
      Pump.writeBatch(cfg, inf, sinks)(batch, bid)
      val adapted = spark.read.parquet(sinks.adapterPath)
        .filter(col("batch_id") === bid)
        // the adapter's JSON lattice types numbers Float64 (A6); the
        // curation id is integral by construction
        .select(col("doc_id").cast("long").as("doc_id"), col("text"),
          lit(false).as("is_eval"))
      CurateStream.applyBatch(curState, "doc_id", "text", "is_eval",
        0.5, 0.2)(adapted, bid)
    }

    try {
      val df = spark.readStream.format("mqtt-direct")
        .option("host", "127.0.0.1")
        .option("port", port.toString)
        .option("topics", "pump/data/0")
        .option("keepalive", "2")
        .option("pingtimeout", "1")
        .option("reconnectdelayms", "100")
        .load()
      // the soak also drives SELF-MAINTENANCE: every batch, crash-marker
      // recovery before the step and a committed-watermark fold after it
      // — asserting below that state actually folded mid-soak while the
      // ledger stayed exactly-once
      val q = df.writeStream
        .foreachBatch(StateMaintenance.selfMaintaining("CurateStream",
          curState, sinks.checkpoint, maintainEvery = 1)(step))
        .option("checkpointLocation", sinks.checkpoint)
        .trigger(Trigger.ProcessingTime("250 milliseconds"))
        .start()
      try {
        val initDeadline = System.currentTimeMillis() + 60000
        while (q.lastProgress == null &&
               System.currentTimeMillis() < initDeadline) Thread.sleep(100)
        assert(q.lastProgress != null, "stream never initialized")

        // transient-read tolerant: a poll racing an in-flight batch's
        // partition write may throw — treat it as "not yet" and re-poll
        def ledger(): Map[Long, Seq[String]] =
          try {
            if (!new java.io.File(s"$curState/ledger").isDirectory)
              Map.empty
            else CurateStream.ledger(spark, curState, "doc_id")
              .select("doc_id", "verdict").collect()
              .map(r => (r.getLong(0), r.getString(1)))
              .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
          } catch { case _: Exception => Map.empty }

        // ---- phase 1: first broker life — docs 1..3; 2 near-dups 1 ----
        val pub1 = new MqttClient("127.0.0.1", port, "soak-pub1")
        pub1.publish("pump/data/0", payload(1L, text("tailA")))
        pub1.publish("pump/data/0", payload(2L, text("tailB")))
        pub1.publish("pump/data/0", payload(3L, distinctText(1)))
        pub1.close()
        val d1 = System.currentTimeMillis() + 180000
        while (ledger().size < 3 && System.currentTimeMillis() < d1)
          Thread.sleep(300)
        val l1 = ledger()
        assert(l1.keySet === Set(1L, 2L, 3L), l1)
        assert(l1(1L) === Seq("kept"))
        assert(l1(2L) === Seq("near_dup")) // in-batch or cross-batch: drops
        assert(l1(3L) === Seq("kept"))

        // ---- phase 2: kill the broker mid-stream ----
        server.close()
        Thread.sleep(500)

        // ---- phase 3: restart on the SAME port (TIME_WAIT retry) ----
        val bindDeadline = System.currentTimeMillis() + 30000
        var restarted: MqttMiniServer = null
        while (restarted == null &&
               System.currentTimeMillis() < bindDeadline) {
          try restarted = new MqttMiniServer(port)
          catch { case _: java.net.BindException => Thread.sleep(250) }
        }
        assert(restarted != null, s"could not rebind port $port")
        server = restarted

        // ---- phase 4: QoS 0 keeps nothing — probe until deliveries
        // resume. Each probe pair: a near-dup of pre-kill doc 1 (id
        // 500+i — must be caught by state written BEFORE the kill) and
        // a fresh distinct doc (id 1000+i — must be kept).
        val d2 = System.currentTimeMillis() + 180000
        var i = 0
        def resumed(l: Map[Long, Seq[String]]): Boolean =
          l.keys.exists(_ >= 1000L)
        while (!resumed(ledger()) && System.currentTimeMillis() < d2) {
          try {
            val p = new MqttClient("127.0.0.1", port, s"soak-probe$i")
            p.publish("pump/data/0", payload(500L + i, text(s"after$i")))
            p.publish("pump/data/0", payload(1000L + i, distinctText(100 + i)))
            p.close()
          } catch { case _: Throwable => /* broker still settling */ }
          i += 1
          Thread.sleep(400)
        }
        assert(resumed(ledger()), "delivery never resumed after restart")
        // QUIESCE before the final cross-table assertions: publishing
        // has stopped, but batches can run MULTI-SECOND here (composed
        // maintenance + dual sink + curate at a 250 ms trigger), so two
        // polls straddling one long in-flight batch read equal STALE
        // values and a naive stability check passes mid-drain — the
        // later batch then lands between the quiesce exit and the
        // final reads (observed: adapter 21-25 vs ledger snapshot 5).
        // The barrier therefore also requires the stream itself to be
        // IDLE: the most recent completed trigger saw ZERO input rows.
        // The delivery buffer only drains via triggers, so a 0-row
        // trigger after publishing stopped means nothing is queued,
        // and value stability across two such observations is sound.
        def adapterCount(): Long =
          try spark.read.parquet(sinks.adapterPath).count()
          catch { case _: Exception => -1L }
        def idle(): Boolean =
          Option(q.lastProgress).exists(_.numInputRows == 0) &&
            !q.status.isTriggerActive
        val dq = System.currentTimeMillis() + 120000
        var quiet = false
        var snap = (adapterCount(), ledger())
        while (!quiet && System.currentTimeMillis() < dq) {
          val i1 = idle()
          Thread.sleep(2000)
          val next = (adapterCount(), ledger())
          quiet = i1 && idle() && next._1 === snap._1 &&
            next._2 === snap._2 && next._1 === next._2.size.toLong &&
            next._1 > 0
          snap = next
        }
        assert(quiet, "pipeline never quiesced after publishing stopped")
        val l2 = snap._2

        // exactly-once across the reconnect: ONE verdict per doc, ever
        l2.foreach { case (doc, vs) =>
          assert(vs.size === 1, s"doc $doc has ${vs.size} verdicts: $vs")
        }
        // pre-kill state caught the post-restart near-dups of doc 1
        val afterDocs = l2.keys.filter(k => k >= 500L && k < 1000L)
        assert(afterDocs.nonEmpty, s"no after-doc landed: $l2")
        afterDocs.foreach(k => assert(l2(k) === Seq("near_dup"), s"$k: $l2"))
        l2.keys.filter(_ >= 1000L).foreach(k =>
          assert(l2(k) === Seq("kept"), s"$k: $l2"))
        // pre-kill verdicts untouched
        assert(l2(1L) === Seq("kept"))
        assert(l2(2L) === Seq("near_dup"))

        // maintenance FIRED during the soak: committed batches folded
        // into the sentinel (and the ledger equalities above held over
        // the folded state)
        val folded = Seq("fps", "docs", "bands", "ledger").filter(d =>
          new java.io.File(s"$curState/$d/batch_id=-1").isDirectory)
        assert(folded.nonEmpty, "maintenance never folded during the soak")

        // the dual sink stayed consistent: every adapter doc has a raw
        // message, mids are unique (T2/T3 across the reconnect)
        val raw = spark.read.parquet(sinks.rawPath)
        val adapter = spark.read.parquet(sinks.adapterPath)
        assert(adapter.count() === l2.size)
        assert(raw.select("mid").distinct().count() === raw.count())
        assert(adapter.select("mid").distinct().count() === adapter.count())
      } finally q.stop()
    } finally server.close()
  }

  test("live ClickHouse sink survives a db KILL/RESTART mid-stream: " +
    "pump never stalls, parquet stays exactly-once, outage batches are " +
    "counted-and-dropped (G8, data_dbstore.go:150-155), post-recovery " +
    "batches land") {
    var ch = new graft.sinks.ClickHouseMiniServer()
    val chPort = ch.port
    val out = tmpDir("soak-ch")
    val sinks = Pump.Sinks(s"$out/raw", s"$out/adapter", s"$out/ckpt")
    val cfg = graft.engine.IniConfig.fromString(
      s"""[clickhouse]
         |scheme   = http
         |hostname = 127.0.0.1
         |port     = $chPort
         |database = pump
         |[adapter-info]
         |rawtablename     = raw_message
         |adaptertablename = json_message
         |jsonsample       = "${sample.replace("\"", "\\\"")}"
         |""".stripMargin)
    val inf = JsonInference.inferFromSample(cfg.jsonSample)
    graft.sinks.LiveSinkErrors.reset()
    val live = graft.Main.liveSink(cfg)
    assert(live.nonEmpty)

    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Array[Byte], java.sql.Timestamp)]
    val q = mem.toDF().toDF("topic", "payload", "received_time")
      .writeStream
      .foreachBatch(Pump.writeBatch(cfg, inf, sinks, live = live) _)
      .option("checkpointLocation", sinks.checkpoint)
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      val ts = java.sql.Timestamp.valueOf("2020-01-05 20:31:00")
      def send(ids: Range): Unit =
        mem.addData(ids.map(i =>
          ("pump/data/0", payload(i.toLong, distinctText(i)), ts)))
      def parquetCount(): Long =
        try spark.read.parquet(sinks.rawPath).count()
        catch { case _: Exception => 0L }
      def await(cond: () => Boolean, what: String, ms: Long = 120000): Unit = {
        val deadline = System.currentTimeMillis() + ms
        while (!cond() && System.currentTimeMillis() < deadline)
          Thread.sleep(250)
        assert(cond(), s"timed out: $what")
      }

      // ---- phase 1: db up — both stores land ----
      send(1 to 3)
      await(() => parquetCount() == 3L &&
        ch.tableRows("pump.raw_message").size == 3, "phase-1 landing")

      // ---- phase 2: KILL the db mid-stream ----
      ch.close()
      send(4 to 6)
      // the pump must NOT stall: parquet (the exactly-once system of
      // record) keeps committing while the live sink fails, and every
      // failed live write lands on the G8-style error counter
      await(() => parquetCount() == 6L, "parquet progress during outage")
      await(() => graft.sinks.LiveSinkErrors.count >= 1L,
        "outage counted on the error path")
      val outageErrors = graft.sinks.LiveSinkErrors.count

      // ---- phase 3: RESTART on the same port; re-bootstrap the DDL
      // (the in-memory mini-server stands in for a durable ClickHouse,
      // so the connect-time bootstrap is replayed — exactly what the
      // reference's reconnect does, data_dbstore.go:122-147) ----
      val bindDeadline = System.currentTimeMillis() + 30000
      var restarted: graft.sinks.ClickHouseMiniServer = null
      while (restarted == null && System.currentTimeMillis() < bindDeadline) {
        try restarted = new graft.sinks.ClickHouseMiniServer(chPort)
        catch { case _: java.io.IOException => Thread.sleep(250) }
      }
      assert(restarted != null, s"could not rebind port $chPort")
      ch = restarted
      graft.sinks.ClickHouseHttpSink.ensureTables(
        graft.sinks.ClickHouseHttpSink.Endpoint(s"http://127.0.0.1:$chPort"),
        "pump", "raw_message", "json_message", inf)
      send(7 to 9)
      await(() => parquetCount() == 9L, "phase-3 parquet landing")
      await(() => ch.tableRows("pump.raw_message").size >= 3,
        "post-recovery ClickHouse landing")

      // the outage window: parquet has ALL nine docs exactly once;
      // ClickHouse is missing exactly the counted-and-dropped ones
      val raw = spark.read.parquet(sinks.rawPath)
      assert(raw.count() === 9L)
      assert(raw.select("mid").distinct().count() === 9L)
      val chMids = ch.tableRows("pump.raw_message").flatMap(_.get("mid")).toSet
      val allMids = raw.select("mid").collect().map(_.getString(0)).toSet
      assert(chMids.subsetOf(allMids))
      assert(chMids.size >= 3) // the post-recovery batches landed
      assert(graft.sinks.LiveSinkErrors.count >= outageErrors)
      assert(graft.sinks.LiveSinkErrors.count >= 1L)
    } finally { q.stop(); ch.close() }
  }
}
