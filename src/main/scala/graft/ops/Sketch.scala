package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X83 — bounded-state cardinality estimation with its own audit:
  * per-group LINEAR COUNTING (Whang, Vander-Zanden & Taylor 1990) of
  * distinct values, next to the exact count it approximates. HLL++ is
  * the production sketch (`approx_count_distinct`); linear counting is
  * its oracle-checkable cousin — DETERMINISTIC given the hash lane, so
  * two engines reproduce the estimate bit-for-bit and the
  * estimate-vs-exact error becomes a measured, hash-gated number
  * instead of a trust-me bound.
  *
  * Bucket = the first `hexDigits` chars of md5(value) — m = 16^k
  * buckets that stay STRINGS end to end (the minhash-lane discipline:
  * no engine-specific hex→int conversion anywhere). With `filled`
  * distinct buckets hit, n̂ = −m·ln(1 − filled/m). Load factors well
  * under 1 keep the estimate tight; filled == m saturates the sketch
  * and fails LOUDLY in-plan (an explicit raise_error branch — Spark's
  * ln(0) would silently yield NULL while DuckDB's raises, so the guard
  * also keeps the two engines from diverging; size m to the corpus,
  * the LshBits discipline).
  *
  * Shape at 100 TB: the sketch side is the point — the partial
  * distinct aggregation caps per-group state at m buckets REGARDLESS
  * of corpus size, so the exchange carries ≤ groups·m short strings
  * where the exact count's exchange carries every distinct value. The
  * exact column here is the audit baseline you can only afford at test
  * SF; production keeps the sketch and drops the baseline.
  *
  * Returns (grp, n_exact, filled, est, err_ppm) — est and the signed
  * relative error are rounded doubles (round-6, the x12 float
  * discipline).
  */
object Sketch {

  /** The estimator as a SQL fragment over a `filled` column — ONE copy
    * shared by the batch operator and the streaming twin
    * ([[graft.streaming.CardinalityStream]]): the two must never
    * diverge on rounding, threshold, or the saturation message.
    */
  def estExpr(m: Long): String =
    s"""CASE WHEN filled >= $m
       |  THEN raise_error('linear counting saturated (filled == m=$m): increase hexDigits')
       |  ELSE round(-$m.0 * ln(1.0 - CAST(filled AS DOUBLE) / $m.0), 6)
       |END""".stripMargin

  def linearCount(df: DataFrame, groupCol: String, valueCol: String,
                  hexDigits: Int): DataFrame = {
    require(hexDigits >= 1 && hexDigits <= 6,
      s"hexDigits $hexDigits out of [1, 6] (m = 16^k buckets, <= 16.7M)")
    val m = math.pow(16, hexDigits).toLong
    val est = estExpr(m)
    // drop null values BEFORE grouping (mirrors the streaming twin's
    // pos-isNotNull filter): countDistinct ignores nulls, so an
    // all-null group would otherwise emit n_exact=0/filled=0 and a 0/0
    // NaN err_ppm here while CardinalityStream never emits the group —
    // filtering on both sides keeps the batch-equals-stream contract
    // and guarantees n_exact >= 1 on every emitted row.
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), col(valueCol).as("v"),
        substring(md5(col(valueCol)), 1, hexDigits).as("pos"))
      .groupBy(col("grp"))
      .agg(countDistinct(col("v")).as("n_exact"),
        countDistinct(col("pos")).as("filled"))
      .select(col("grp"), col("n_exact"), col("filled"),
        expr(est).as("est"),
        expr(s"round((($est) - CAST(n_exact AS DOUBLE)) " +
          "/ CAST(n_exact AS DOUBLE) * 1000000.0, 6)").as("err_ppm"))
  }
}
