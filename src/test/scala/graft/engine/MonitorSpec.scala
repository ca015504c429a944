package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** G1-G6 arithmetic on a tiny deterministic event stream. */
class MonitorSpec extends SparkSpec {
  import spark.implicits._

  // 6 events across two 5 s windows and two stages
  lazy val events = Seq(
    ("2024-01-01 00:00:01", "sub", 10, true),
    ("2024-01-01 00:00:02", "sub", 20, true),
    ("2024-01-01 00:00:03", "proc", 30, false),
    ("2024-01-01 00:00:06", "sub", 40, true),
    ("2024-01-01 00:00:07", "proc", 50, true),
    ("2024-01-01 00:00:09", "proc", 60, false)
  ).toDF("ts", "stage", "bytes", "ok")
    .withColumn("ts", to_timestamp($"ts"))

  test("G1 tumbling window counts and byte sums") {
    val w = Monitor.windowedStageAgg(events, $"ts", $"stage", $"bytes", "5 seconds")
      .orderBy("window_start", "stage")
    val rows = w.collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(("proc", 1L, 30L), ("sub", 2L, 30L), ("proc", 2L, 110L), ("sub", 1L, 40L)))
  }

  test("G2 cumulative success/failure split") {
    val t = Monitor.cumulativeTotals(events, $"stage", $"ok").orderBy("stage").collect()
    assert(t.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq(("proc", 3L, 1L, 2L), ("sub", 3L, 3L, 0L)))
  }

  test("G3 average rate = total / runtime seconds") {
    val r = Monitor.avgRates(events, $"ts", $"stage").orderBy("stage").collect()
    // runtime = 9 - 1 = 8 s; 3 events each -> 0.375
    assert(r.map(_.getDouble(2)).toSeq === Seq(0.375, 0.375))
  }

  test("G4 stage lags via pivot arithmetic") {
    val totals = events.groupBy(lit(1).as("g"), $"stage").agg(count(lit(1)).as("total"))
    val lags = Monitor.stageLags(totals, Seq("sub", "proc"), Seq("g")).collect().head
    assert(lags.getAs[Long]("lag_sub_to_proc") === 0L)
  }

  test("G5 normalization divides by window length") {
    val w = Monitor.windowedStageAgg(events, $"ts", $"stage", $"bytes", "5 seconds")
    val n = Monitor.normalizeRates(w, 5).orderBy("window_start", "stage").collect().head
    assert(n.getAs[Double]("events_per_sec") === 0.2)
  }

  test("G6 document nests Info and DataInfo") {
    val agg = events.groupBy($"stage").agg(count(lit(1)).as("total"))
    val doc = Monitor.metricsDoc(agg, Seq("stage"), Seq("total"))
      .orderBy("stage").collect().head.getAs[String]("doc")
    assert(doc === """{"Info":{"stage":"proc"},"DataInfo":{"total":3}}""")
  }

  test("G6 FULL document renders the reference's exact byte layout (golden)") {
    // one counter row with uniform stage values: succeed=100, failed=1,
    // win=5; sizes win=10; interval 5 s -> PerSec 1.0, SizePerSec 2.0,
    // AvgPeriod (100+1)/100 = 1.01 -> rounds to 1.0 at one place
    val stageVals = Monitor.RefStages.flatMap { st =>
      Seq(lit(100L).as(s"${st}_succeed"), lit(1L).as(s"${st}_failed"),
        lit(5L).as(s"${st}_win"))
    } ++ Seq("sub", "dp", "da").map(st => lit(10L).as(s"${st}_size_win"))
    val counters = spark.range(1).select(
      (lit(100L).as("runtime_secs") +: lit(5L).as("pipe_num") +:
        lit(3L).as("pub_succeed") +: lit(0L).as("pub_failed") +:
        lit(2L).as("check_errors") +: stageVals): _*)
    val doc = Monitor.fullMetricsDoc(counters, intervalSecs = 5)
      .select("doc").collect().head.getString(0)
    // hand-written against monitor.go:130-176's plFmt/section format
    // strings — key names, key order, nesting, %d vs %.1f all pinned
    val expected =
      """{"Info":{"RunTime(s)":100.0,"PipeNum":5,"MonPubSucceed":3,"MonPubFailed":0},""" +
      """"PerformanceMetrics":{"QueueWaitInfo":{"WaitForProcess":0,""" +
      """"WaitForRawDataObjectToDB":0,"WaitForRawDataObjectToDBCommit":0,""" +
      """"WaitForAdapter":0,"WaitForProcessDataObject":0,""" +
      """"WaitForAdapterDataObjectToDB":0,"WaitForAdapterDataObjectToDBCommit":0},""" +
      """"GapBetweenRawAndAdapterInfo":{"GapToDB":0,"GapToDBCommit":0}},""" +
      """"DataInfo":{"SubscribeMsgInfo":{"SubMsgPerSec":1.0,"SubMsgSizePerSec":2.0,""" +
      """"SubMsgSucceed":100,"SubMsgFailed":1,"AvgPeriodSubMsgPerSec":1.0},""" +
      """"DataProcessMsgInfo":{"DpMsgPerSec":1.0,"DpMsgSizePerSec":2.0,""" +
      """"DpMsgSucceed":100,"DpMsgFailed":1,"AvgPeriodDpMsgPerSec":1.0},""" +
      """"DataAdapterInfo":{"DaMsgPerSec":1.0,"DaMsgSizePerSec":2.0,""" +
      """"DaMsgSucceed":100,"DaMsgFailed":1,"AvgPeriodDaMsgPerSec":1.0},""" +
      """"DataProcessDataObjectInfo":{"DaPdoMsgPerSec":1.0,""" +
      """"DaPdoMsgSucceed":100,"DaPdoMsgFailed":1,"AvgPeriodDaPdoMsgPerSec":1.0}},""" +
      """"DataDBStoreInfo":{"CheckErrors":2,""" +
      """"RawDataObjectReceiveInfo":{"DbsRDOReceivePerSec":1.0,""" +
      """"DbsRDOReceiveSucceed":100,"DbsRDOReceiveFailed":1,"AvgPeriodDbsRdoRevPerSec":1.0},""" +
      """"RawDataObjectCommitInfo":{"DbsRDOCommitPerSec":1.0,""" +
      """"DbsRDOCommitSucceed":100,"DbsRDOCommitFailed":1,"AvgPeriodDbsRdoComPerSec":1.0},""" +
      """"AdapterDataObjectReceiveInfo":{"DbsADOReceivePerSec":1.0,""" +
      """"DbsADOReceiveSucceed":100,"DbsADOReceiveFailed":1,"AvgPeriodDbsAdoRevPerSec":1.0},""" +
      """"AdapterDataObjectCommitInfo":{"DbsADOCommitPerSec":1.0,""" +
      """"DbsADOCommitSucceed":100,"DbsADOCommitFailed":1,"AvgPeriodDbsAdoComPerSec":1.0}}}"""
    assert(doc === expected)
  }
}
