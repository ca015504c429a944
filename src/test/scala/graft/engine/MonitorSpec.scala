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
}
