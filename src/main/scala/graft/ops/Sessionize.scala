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
}
