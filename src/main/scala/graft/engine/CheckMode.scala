package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's `check` command — SURVEY §3.2 / Q3: its only built-in
  * correctness harness (`/root/reference/main.go:33-63`,
  * `data_dbstore.go:200-324`).
  *
  * Reference sequence, per table: create a scratch `ENGINE = Memory` table,
  * insert the config's JSON sample (raw form, then adapter form), select it
  * back (Q1), `count()` it (Q2), drop the table. Here the scratch tables
  * are temp views with the same lifecycle: create -> insert -> query ->
  * drop, returning the observations for the caller to assert on.
  */
object CheckMode {

  final case class CheckResult(
      ddlFragment: String,
      schemaConsistent: Boolean,
      rawRoundTrip: Seq[(String, String, String)], // (mid, topic, payload)
      rawCount: Long,
      adapterCount: Long,
      adapterColumns: Seq[String])

  def run(spark: SparkSession, cfg: PumpConfig): CheckResult = {
    val inf = JsonInference.inferFromSample(cfg.jsonSample)

    // raw round-trip: insert sample -> Q1 select back -> drop
    import spark.implicits._
    val raw = Adapter.rawProjection(
      Seq(("check-mid", cfg.jsonSample)).toDF("mid", "payload"),
      col("mid"), lit("check-topic"), col("payload"), current_timestamp())
    val rawView = s"${cfg.db.rawTable}_check"
    raw.createOrReplaceTempView(rawView)
    val q1 = spark.table(rawView).select("mid", "topic", "payload")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    val rawCount = spark.table(rawView).count()
    spark.catalog.dropTempView(rawView)

    // adapter round-trip: flatten sample -> Q2 count -> drop
    val adapted = Adapter.adapt(
      Seq(("check-mid", cfg.jsonSample)).toDF("mid", "payload"),
      "payload", inf, Seq("mid"))
    val adView = s"${cfg.db.adapterTable}_check"
    adapted.createOrReplaceTempView(adView)
    val q2 = spark.table(adView).agg(count(lit(1))).collect().head.getLong(0)
    val cols = spark.table(adView).columns.toSeq
    spark.catalog.dropTempView(adView)

    CheckResult(JsonInference.ddlFragment(inf), inf.consistent,
      q1, rawCount, q2, cols)
  }

  /** The `show` command (SURVEY §3.3): pretty-print the parsed config. */
  def show(cfg: PumpConfig): String =
    s"""[source-mqtt] server=${cfg.source.server} qos=${cfg.source.qos}
       |  topics=${cfg.sourceTopics.mkString(", ")}
       |[monitor-mqtt] server=${cfg.monitor.server} topicroot=${cfg.monitor.topicRoot}
       |  publishinterval=${cfg.monitor.publishIntervalSecs}s buffer=${cfg.monitor.bufferSize}
       |[dbstore] db=${cfg.db.database} raw=${cfg.db.rawTable} adapter=${cfg.db.adapterTable}
       |  commit=${cfg.db.commitIntervalSecs}s/${cfg.db.commitItems}items compress=${cfg.db.compress}
       |  endpoint=${if (cfg.db.hostname.isEmpty) "(parquet only)"
         else s"${cfg.db.scheme}://${cfg.db.hostname}:${cfg.db.port}"}
       |[adapter] jsonsample=${cfg.jsonSample.take(60)}...
       |[processor] midlength=${cfg.midLength}""".stripMargin
}
