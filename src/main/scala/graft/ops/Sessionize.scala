package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X5 — gap-based sessionization, the workhorse grouping step of event
  * pipelines (and the batch twin of Structured Streaming's session
  * windows).
  *
  * Scale shape: ONE shuffle on the session key; both window passes (lag
  * to detect gaps, running sum to number sessions) and the final
  * per-session aggregation all share the same (key, ts) partitioning and
  * sort, so Catalyst plans a single Exchange + Sort reused by every
  * window function. Timestamps are compared as integer microseconds so
  * results are engine-exact.
  */
object Sessionize {

  /** Attach `session_seq` (1-based per key) to each event: a new session
    * starts when the gap to the key's previous event exceeds `gapSecs`.
    * `tieCol` makes the within-key order total (and results deterministic)
    * when timestamps collide.
    */
  def assign(ev: DataFrame, keyCol: String, tsCol: String, tieCol: String,
             gapSecs: Long): DataFrame = {
    val order = Seq(col("__us"), col(tieCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("__us") - col("__prev") > gapSecs * 1000000L, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(wRun))
      .drop("__prev", "__new")
  }

  /** Per-session stats: event count, bounds, and exact duration in µs. */
  def sessions(ev: DataFrame, keyCol: String, tsCol: String, tieCol: String,
               gapSecs: Long): DataFrame =
    assign(ev, keyCol, tsCol, tieCol, gapSecs)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        (max(col("__us")) - min(col("__us"))).as("duration_us"))

  /** As-of join within one table: each row where `probePred` holds gets
    * the latest at-or-before `tsCol` (ties broken by `tieCol`) of the
    * rows where `refPred` holds, per key — e.g. "each purchase joined to
    * the user's most recent view". Spark has no ASOF JOIN operator; the
    * Spark-first expression is a running conditional max over the SAME
    * (key, ts) window sessionization uses, so the whole operator costs
    * one exchange + sort and no join at all. (The general two-table
    * form is the same shape after a union-tag of both inputs.)
    */
  def asofLast(ev: DataFrame, keyCol: String, tsCol: String, tieCol: String,
               probePred: Column, refPred: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__us"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__ref_us", max(when(refPred, col("__us"))).over(w))
      .filter(probePred)
      .withColumn("asof_ts", timestamp_micros(col("__ref_us")))
      .withColumn("asof_lag_us",
        when(col("__ref_us").isNotNull, col("__us") - col("__ref_us")))
      .drop("__us", "__ref_us")
  }
}
