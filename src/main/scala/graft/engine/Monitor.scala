package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Monitor — SURVEY §2.5 (G1-G8), the reference's only true aggregation
  * engine (`/root/reference/monitor.go`). It keeps per-stage interval
  * counts, cumulative success/failure totals, average rates since start,
  * queue-lag gauges (pairwise stage deltas), and publishes one nested JSON
  * document per tick.
  *
  * Spark-first re-expression: the per-stage instrumentation becomes an
  * *event stream* (one row per stage transition) and every monitor quantity
  * is a declarative aggregate over it — tumbling `window()` for the tick
  * (G1), plain groupBy for the cumulative totals (G2), `pivot` + column
  * arithmetic for the stage lags (G4), `to_json(struct(...))` for the
  * document (G6). All shapes run identically in batch (oracle-checked) and
  * Structured Streaming (with a watermark for state cleanup — a documented
  * improvement over the reference's wall-clock ticker, SURVEY §2.7).
  *
  * Scale note: G1/G2 are partial-aggregate (map-side combine) shuffles on
  * low-cardinality keys — at 100 TB the shuffle carries only
  * stages × windows rows after combine; G4's pivot runs on the already-tiny
  * aggregate, so the whole monitor is shuffle-light by construction.
  */
object Monitor {

  /** G1 — tumbling-window count + byte-sum per stage
    * (`monitor.go:191-249` per-event updates; `monitor.go:116-189` emit).
    * The reference's window is the 5 s publish ticker; window length is a
    * parameter here.
    */
  def windowedStageAgg(events: DataFrame, ts: Column, stage: Column,
                       bytes: Column, windowDur: String): DataFrame =
    events
      .groupBy(window(ts, windowDur).as("w"), stage.as("stage"))
      .agg(count(lit(1)).as("events"), sum(bytes).as("bytes"))
      .select(col("w.start").as("window_start"), col("stage"),
        col("events"), col("bytes"))

  /** G2 — cumulative success/failure totals per stage
    * (`monitor.go:191-249`, e.g. flagSub > 0 -> SubMsgSucceed++).
    */
  def cumulativeTotals(events: DataFrame, stage: Column, success: Column): DataFrame =
    events
      .groupBy(stage.as("stage"))
      .agg(
        count(lit(1)).as("total"),
        count_if(success).as("succeed"),
        count_if(!success).as("failed"))

  /** G3 — average rate since start: `(succeed+fail) / runtime_seconds`
    * (`monitor.go:138-146`). Runtime is (max ts - min ts) of the event
    * stream in the deterministic batch form; rounded for cross-engine
    * float parity. Guarded: a stream whose events all share one second
    * (a single event, a single-instant batch) has runtime 0, and the
    * unguarded divide is an ANSI DIVIDE_BY_ZERO — the rate is
    * undefined over a zero-length window, so null is the one value
    * both ANSI and legacy modes agree on (the oracle SQL carries the
    * same CASE guard).
    */
  def avgRates(events: DataFrame, ts: Column, stage: Column): DataFrame = {
    val span = events.agg(
      (unix_timestamp(max(ts)) - unix_timestamp(min(ts))).as("runtime_secs"))
    events
      .groupBy(stage.as("stage"))
      .agg(count(lit(1)).as("total"))
      .crossJoin(broadcast(span))
      .select(col("stage"), col("total"),
        when(col("runtime_secs") > 0,
          round(col("total").cast("double") / col("runtime_secs"), 6))
          .as("avg_mps"))
  }

  /** G4 — queue-lag derivation: pairwise differences of cumulative totals
    * (`monitor.go:120-136`, WaitForProcess = SubMsgSucceed - DpMsgSucceed,
    * GapToDB...). Expressed as a pivot of the per-stage totals followed by
    * column arithmetic; the pivot input is the already-aggregated frame so
    * this is driver-cheap at any scale.
    */
  def stageLags(totals: DataFrame, stages: Seq[String], groupCols: Seq[String]): DataFrame = {
    val p = totals
      .groupBy(groupCols.map(col): _*)
      .pivot("stage", stages)
      .agg(first(col("total")))
      .na.fill(0L, stages)
    stages.sliding(2).foldLeft(p) { case (df, Seq(a, b)) =>
      df.withColumn(s"lag_${a}_to_$b", col(a) - col(b))
    }
  }

  /** G5 — per-interval rate normalization: counter / window seconds
    * (`monitor.go:151-173`).
    */
  def normalizeRates(windowed: DataFrame, windowSeconds: Int): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be > 0: $windowSeconds")
    windowed
      .withColumn("events_per_sec",
        round(col("events").cast("double") / lit(windowSeconds.toDouble), 6))
      .withColumn("bytes_per_sec",
        round(col("bytes").cast("double") / lit(windowSeconds.toDouble), 6))
  }

  /** G6 — metrics JSON document assembly (`monitor.go:130-176`): nests the
    * aggregates into one document per group via `to_json(struct(...))`.
    */
  def metricsDoc(df: DataFrame, infoCols: Seq[String], dataCols: Seq[String]): DataFrame =
    df.withColumn("doc", to_json(struct(
      struct(infoCols.map(col): _*).as("Info"),
      struct(dataCols.map(col): _*).as("DataInfo"))))

  /** The reference's 8 pipeline-stage counter families, in pipeline order
    * (`monitor.go:21-62`): subscribe, data-process, adapter, adapter
    * process-data-object, then the dbstore receive/commit pairs for the
    * raw and adapter paths.
    */
  val RefStages: Seq[String] =
    Seq("sub", "dp", "da", "da_pdo", "rdo_rev", "rdo_com", "ado_rev", "ado_com")

  /** G6 FULL — the reference's complete 4-section document
    * (`monitor.go:130-176`): `Info`, `PerformanceMetrics{QueueWaitInfo (7
    * stage lags), GapBetweenRawAndAdapterInfo}`, `DataInfo` (4 stage
    * sections), `DataDBStoreInfo{CheckErrors + 4 receive/commit sections}`.
    *
    * The reference renders this payload with `fmt.Sprintf` format strings,
    * so the faithful re-expression builds the SAME byte layout from
    * columns: `%d` fields are long casts, `%.1f` fields are
    * `format_string("%.1f", round(x, 1))` (the pre-round pins midpoint
    * behavior to HALF_UP on both Spark and any external verifier — Java's
    * Formatter and C's printf disagree at representable midpoints like
    * 2.25, `round` resolves them identically before formatting). The lag
    * and gap arithmetic is `monitor.go:120-136` verbatim: pairwise
    * differences of the cumulative succeed counters.
    *
    * Expected input columns, one row per document:
    *  - per stage `s` in [[RefStages]]: `<s>_succeed`, `<s>_failed`
    *    (cumulative totals) and `<s>_win` (last-interval count);
    *  - `sub_size_win` / `dp_size_win` / `da_size_win` (last-interval byte
    *    counts — only those three stages carry sizes, `monitor.go:151-160`);
    *  - `runtime_secs`, `pipe_num`, `pub_succeed`, `pub_failed`,
    *    `check_errors`.
    */
  def fullMetricsDoc(df: DataFrame, intervalSecs: Int): DataFrame = {
    require(intervalSecs > 0, s"intervalSecs must be > 0: $intervalSecs")
    // %.1f with engine-agnostic midpoint handling (see scaladoc)
    def fd(x: Column): Column = format_string("%.1f", round(x.cast("double"), 1))
    def rate(c: Column): Column = fd(c.cast("double") / lit(intervalSecs.toDouble))
    // runtime clamps to >= 1 s: at the startup instant runtime_secs is
    // 0 and the unguarded divide is an ANSI DIVIDE_BY_ZERO, while a
    // null would void the whole concat-assembled doc — the reference's
    // first tick publishes after one full interval anyway, so the
    // clamp only ever changes a window the reference never reports
    def avg(s: String): Column =
      fd((col(s + "_succeed") + col(s + "_failed")).cast("double") /
        greatest(col("runtime_secs"), lit(1L)))
    def d(c: Column): Column = c.cast("long").cast("string")
    def obj(fields: (String, Column)*): Column =
      concat(lit("{") +: fields.zipWithIndex.flatMap { case ((k, v), i) =>
        (if (i == 0) Seq.empty[Column] else Seq(lit(","))) ++
          Seq(lit("\"" + k + "\":"), v)
      } :+ lit("}"): _*)

    val info = obj(
      "RunTime(s)" -> fd(col("runtime_secs")),
      "PipeNum" -> d(col("pipe_num")),
      "MonPubSucceed" -> d(col("pub_succeed")),
      "MonPubFailed" -> d(col("pub_failed")))
    // monitor.go:120-128 — 7 queue lags from cumulative succeed deltas
    val waits = obj(
      "WaitForProcess" -> d(col("sub_succeed") - col("dp_succeed")),
      "WaitForRawDataObjectToDB" -> d(col("dp_succeed") - col("rdo_rev_succeed")),
      "WaitForRawDataObjectToDBCommit" -> d(col("rdo_rev_succeed") - col("rdo_com_succeed")),
      "WaitForAdapter" -> d(col("dp_succeed") - col("da_succeed")),
      "WaitForProcessDataObject" -> d(col("da_succeed") - col("da_pdo_succeed")),
      "WaitForAdapterDataObjectToDB" -> d(col("da_pdo_succeed") - col("ado_rev_succeed")),
      "WaitForAdapterDataObjectToDBCommit" -> d(col("ado_rev_succeed") - col("ado_com_succeed")))
    // monitor.go:133-136 — raw-vs-adapter path gaps (signed)
    val gaps = obj(
      "GapToDB" -> d(col("rdo_rev_succeed") - col("ado_rev_succeed")),
      "GapToDBCommit" -> d(col("rdo_com_succeed") - col("ado_com_succeed")))
    def stageSection(prefix: String, stage: String, withSize: Boolean,
                     avgKey: String): Column = {
      val base = Seq(
        s"${prefix}PerSec" -> rate(col(s"${stage}_win"))) ++
        (if (withSize) Seq(s"${prefix}SizePerSec" -> rate(col(s"${stage}_size_win")))
         else Seq.empty) ++ Seq(
        s"${prefix}Succeed" -> d(col(s"${stage}_succeed")),
        s"${prefix}Failed" -> d(col(s"${stage}_failed")),
        avgKey -> avg(stage))
      obj(base: _*)
    }
    val dataInfo = obj(
      "SubscribeMsgInfo" -> stageSection("SubMsg", "sub", withSize = true, "AvgPeriodSubMsgPerSec"),
      "DataProcessMsgInfo" -> stageSection("DpMsg", "dp", withSize = true, "AvgPeriodDpMsgPerSec"),
      "DataAdapterInfo" -> stageSection("DaMsg", "da", withSize = true, "AvgPeriodDaMsgPerSec"),
      "DataProcessDataObjectInfo" -> stageSection("DaPdoMsg", "da_pdo", withSize = false, "AvgPeriodDaPdoMsgPerSec"))
    val dbStore = obj(
      "CheckErrors" -> d(col("check_errors")),
      "RawDataObjectReceiveInfo" -> stageSection("DbsRDOReceive", "rdo_rev", withSize = false, "AvgPeriodDbsRdoRevPerSec"),
      "RawDataObjectCommitInfo" -> stageSection("DbsRDOCommit", "rdo_com", withSize = false, "AvgPeriodDbsRdoComPerSec"),
      "AdapterDataObjectReceiveInfo" -> stageSection("DbsADOReceive", "ado_rev", withSize = false, "AvgPeriodDbsAdoRevPerSec"),
      "AdapterDataObjectCommitInfo" -> stageSection("DbsADOCommit", "ado_com", withSize = false, "AvgPeriodDbsAdoComPerSec"))
    df.withColumn("doc", obj(
      "Info" -> info,
      "PerformanceMetrics" -> obj(
        "QueueWaitInfo" -> waits,
        "GapBetweenRawAndAdapterInfo" -> gaps),
      "DataInfo" -> dataInfo,
      "DataDBStoreInfo" -> dbStore))
  }

  /** G7/G8 — liveness / error gauges (`monitor.go:250-259`): plain
    * conditional counts over the event stream.
    */
  def gauges(events: DataFrame, isConnect: Column, isDisconnect: Column,
             isError: Column): DataFrame =
    events.agg(
      (count_if(isConnect) - count_if(isDisconnect)).as("pipe_num"),
      count_if(isError).as("db_store_err_num"))
}
