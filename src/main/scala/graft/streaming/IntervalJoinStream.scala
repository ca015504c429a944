package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X18 in streaming form: a stream-stream interval join — each left event
  * pairs with right events of the same key whose timestamp falls in
  * `[l.ts, l.ts + window]`.
  *
  * This is Spark's NATIVE stream-stream join shape: watermarks on both
  * sides plus a time-range join condition let the engine bound its join
  * state — a left row can stop waiting once the right watermark passes
  * `l.ts + window`, a right row once the left watermark passes `r.ts`
  * (Structured Streaming derives both bounds from the condition; no
  * custom state code). That bounded-state property is exactly what the
  * batch twin ([[graft.ops.RangeJoin.banded]]) gets from its time
  * buckets: state/work proportional to the band, never to history.
  *
  * Inner join + append mode: results emit once both watermarks clear the
  * pair, so every pair emits exactly once — sink-friendly at any scale.
  */
object IntervalJoinStream {

  /** @param left  streaming frame; `keyCol` string-able, `tsCol` timestamp
    * @param right same, disjoint non-key column names enforced by aliasing
    * @param windowSecs band width: right.ts in [left.ts, left.ts + window]
    * @param delaySecs  watermark delay tolerated for late data, both sides
    */
  def joined(left: DataFrame, leftIdCol: String,
             right: DataFrame, rightIdCol: String,
             keyCol: String, tsCol: String,
             windowSecs: Long, delaySecs: Long = 0L): DataFrame = {
    // fail fast like the batch twin: an empty/inverted band would start
    // a query that silently emits nothing
    require(windowSecs >= 1, s"windowSecs must be >= 1: $windowSecs")
    require(delaySecs >= 0, s"delaySecs must be >= 0: $delaySecs")
    val l = left.select(
        col(keyCol).cast("string").as("k"),
        col(leftIdCol).as("l_id"),
        col(tsCol).cast("timestamp").as("lts"))
      .withWatermark("lts", s"$delaySecs seconds")
    val r = right.select(
        col(keyCol).cast("string").as("rk"),
        col(rightIdCol).as("r_id"),
        col(tsCol).cast("timestamp").as("rts"))
      .withWatermark("rts", s"$delaySecs seconds")
    l.join(r,
        col("k") === col("rk") &&
          col("rts") >= col("lts") &&
          col("rts") <= col("lts") + expr(s"INTERVAL $windowSecs seconds"))
      .select(col("k"), col("l_id"), col("r_id"), col("lts"), col("rts"),
        (unix_micros(col("rts")) - unix_micros(col("lts"))).as("lag_us"))
  }
}
