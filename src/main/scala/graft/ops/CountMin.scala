package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X89 — Count-Min sketch (Cormode & Muthukrishnan 2005): frequency
  * estimation over an unbounded token stream with state bounded at
  * depth × width counters no matter the vocabulary. Each of `depth`
  * independent hash lanes maps a token to one of 16^hexDigits buckets
  * and counts collisions in; a token's estimate is the MINIMUM of its
  * lane counters. Collisions only ever ADD, so the estimate
  * OVER-counts or is exact — never under — and that one-sided
  * guarantee (est >= true, est <= true + eps·N w.h.p.) is asserted
  * in-plan by the x89 query rather than cited.
  *
  * Determinism: the lane hash is md5("lane|token") hex-prefixed (the
  * minhash-lane discipline — strings end to end, no engine-specific
  * hex→int), and every counter is an exact BIGINT count, so the sketch
  * and all its estimates are bit-identical across engines; the DuckDB
  * oracle rebuilds the sketch from the data and re-derives the
  * estimates.
  *
  * Shape at 100 TB: the build explodes each occurrence into `depth`
  * (lane, bucket) rows but the partial aggregation collapses every
  * partition to ≤ depth·16^k groups before the exchange, so the
  * shuffle carries sketch-sized state, not corpus-sized — the same
  * map-side-combine contract as x83/x88. Counters are MERGEABLE by
  * addition (per-shard sketches sum to the corpus sketch —
  * [[graft.streaming.CountMinStream]] leans on exactly that), and
  * point lookups are a broadcast-sized join of the query tokens
  * against the ≤ depth·16^k-row sketch.
  */
object CountMin {

  private def checkKnobs(depth: Int, hexDigits: Int): Unit = {
    require(depth >= 1 && depth <= 8, s"depth $depth out of [1, 8]")
    require(hexDigits >= 1 && hexDigits <= 4,
      s"hexDigits $hexDigits out of [1, 4] (width = 16^k, <= 65536)")
  }

  /** Lane `i`'s bucket for a token — the fragment both [[sketch]] and
    * [[estimate]] (and the oracle, textually) must agree on.
    */
  def bucket(lane: Int, token: Column, hexDigits: Int): Column =
    substring(md5(concat(lit(s"$lane|"), token)), 1, hexDigits)

  private def laneArray(token: Column, depth: Int,
                        hexDigits: Int): Column =
    array((0 until depth).map(i => struct(lit(i).as("lane"),
      bucket(i, token, hexDigits).as("bkt"))): _*)

  /** One row per token OCCURRENCE in -> the (lane, bucket, cnt)
    * counter table, ≤ depth·16^hexDigits rows.
    */
  def sketch(tokens: DataFrame, tokenCol: String, depth: Int,
             hexDigits: Int): DataFrame = {
    checkKnobs(depth, hexDigits)
    tokens.filter(col(tokenCol).isNotNull)
      .select(explode(laneArray(col(tokenCol), depth, hexDigits)).as("lb"))
      .groupBy(col("lb.lane").as("lane"), col("lb.bkt").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `queries` (one row per DISTINCT token):
    * (token, est) with est = min over lanes of the token's counter.
    * A token the sketch never saw estimates 0 (all its lane counters
    * absent), which is also exact.
    */
  def estimate(sk: DataFrame, queries: DataFrame, tokenCol: String,
               depth: Int, hexDigits: Int): DataFrame = {
    checkKnobs(depth, hexDigits)
    queries.filter(col(tokenCol).isNotNull)
      .select(col(tokenCol).as("token"),
        explode(laneArray(col(tokenCol), depth, hexDigits)).as("lb"))
      .select(col("token"), col("lb.lane").as("lane"),
        col("lb.bkt").as("bucket"))
      .join(sk, Seq("lane", "bucket"), "left")
      .groupBy(col("token"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
