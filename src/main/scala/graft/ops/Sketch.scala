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

  // ------------------------------------------------------------------ X88

  /** X88 — HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007), the
    * production-grade successor to X83's linear counting: where linear
    * counting saturates once every bucket fills, HLL's registers hold
    * the MAX rank (leading-zero run + 1) seen per bucket, so the same
    * m-bounded state estimates cardinalities orders of magnitude past
    * m. Same determinism story as the rest of the sketch family: the
    * hash lane is md5 hex, every fragment below is plain string /
    * integer / CASE arithmetic valid verbatim in BOTH engines, so the
    * estimate is bit-reproducible and the oracle re-derives it from
    * the data rather than trusting a library.
    *
    * Lane layout (one md5 per value, 32 hex chars): the first
    * `hexDigits` chars are the register index (m = 16^k registers);
    * the NEXT 12 chars are the 48-bit rank source. rho = number of
    * leading zero BITS in those 48 + 1 (rho = 49 if all 48 are zero):
    * strip leading '0' hex chars with an anchored regexp, count 4 zero
    * bits per stripped char, then a 4-way CASE on the first surviving
    * hex digit. 48 bits of rank means no value in any realistic corpus
    * exhausts the lane (P[rho > 48] = 2^-48 per value).
    *
    * Estimator: raw = alpha_m * m^2 / sum_j 2^(-M_j), with the zero
    * denominator sum carried EXACTLY — every term is scaled by 2^49 so
    * 2^(-M_j) becomes the exact BIGINT 2^(49-M_j) (power(2.0, k) is
    * exact in IEEE double for k <= 49, so the shared CAST(power(...))
    * fragment is integer-exact in both engines) and absent registers
    * contribute 2^49 each. Small-range correction per the paper: when
    * raw <= 2.5m and empty registers remain, fall back to linear
    * counting over register occupancy, m*ln(m/V) with V = m - filled.
    * No large-range correction: that branch exists only for 32-bit
    * hashes (Heule et al. 2013 drop it at >= 64 hash bits; this lane
    * has 48 rank bits behind 16^k buckets).
    *
    * Shape at 100 TB: per-group state is m (register, max-rank) pairs
    * REGARDLESS of corpus size — the max aggregation combines map-side
    * — and registers MERGE by pointwise max, so per-shard sketches
    * roll up to the corpus sketch without re-scanning anything
    * ([[hllMerged]]: cross-corpus union cardinality from the two
    * corpora's registers alone). That merge is what
    * `approx_count_distinct` does internally; here it is an auditable
    * relational plan with the exact count alongside as the test-SF
    * baseline.
    */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
                   hexDigits: Int): DataFrame = {
    require(hexDigits >= 2 && hexDigits <= 4,
      s"hexDigits $hexDigits out of [2, 4] (m = 16^k registers; " +
        "k >= 2 keeps the single published alpha formula applicable)")
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), md5(col(valueCol)).as("h"))
      .select(col("grp"), expr(s"substring(h, 1, $hexDigits)").as("reg"),
        expr(rhoSql("h", hexDigits + 1)).as("rho"))
      .groupBy(col("grp"), col("reg"))
      .agg(max(col("rho")).as("mj"))
  }

  /** rho over the 12 hex chars of `hCol` starting at 1-based `off`:
    * leading-zero bits + 1. Valid verbatim in Spark SQL and DuckDB
    * (anchored regexp_replace strips exactly the leading-zero run in
    * both engines' first-match and all-match semantics; instr is the
    * shared hex-digit decoder, the simhash-lane discipline).
    */
  def rhoSql(hCol: String, off: Int): String = {
    val s0 = s"regexp_replace(substring($hCol, $off, 12), '^0*', '')"
    val d = s"(instr('0123456789abcdef', substring($s0, 1, 1)) - 1)"
    s"""CASE WHEN length($s0) = 0 THEN 49
       |  ELSE (12 - length($s0)) * 4
       |    + (CASE WHEN $d >= 8 THEN 0 WHEN $d >= 4 THEN 1
       |            WHEN $d >= 2 THEN 2 ELSE 3 END) + 1
       |END""".stripMargin
  }

  /** The X88 estimator over an aggregated (filled, s_present) pair —
    * ONE fragment for the direct and merged paths (and any future
    * streaming twin): alpha_m * m^2 * 2^49 / S with
    * S = (m - filled) * 2^49 + s_present, then the paper's small-range
    * fallback. alpha is interpolated as its defining FORMULA, not a
    * pre-evaluated double literal, so both engines compute the
    * identical IEEE value.
    */
  def hllEstExpr(m: Long): String = {
    val twoTo49 = 562949953421312L // 2^49, exact in BIGINT and DOUBLE
    // literals CAST to DOUBLE explicitly: Spark (and DuckDB) parse bare
    // decimal literals as DECIMAL, and decimal-lane alpha drifts ~1e-5
    // from the IEEE-double value the driver-side replica (and any
    // reader of the paper) computes
    val alpha = "(CAST(0.7213 AS DOUBLE) / " +
      s"(1.0 + CAST(1.079 AS DOUBLE) / $m.0))"
    val s = s"(($m - filled) * $twoTo49 + s_present)"
    val raw = s"($alpha * $m.0 * $m.0 * $twoTo49 / CAST($s AS DOUBLE))"
    s"""CASE WHEN $raw <= 2.5 * $m.0 AND filled < $m
       |  THEN round($m.0 * ln($m.0 / CAST($m - filled AS DOUBLE)), 6)
       |  ELSE round($raw, 6)
       |END""".stripMargin
  }

  /** Exact BIGINT contribution of one register to the 2^49-scaled
    * denominator sum.
    */
  def hllTermSql: String = "CAST(power(2.0, 49 - mj) AS BIGINT)"

  /** Registers -> per-group estimate, joined with the exact audit
    * baseline `exact` (grp, n_exact). Shared by [[hll]] and
    * [[hllMerged]] so the two paths cannot diverge on the estimator.
    */
  def hllEstimate(regs: DataFrame, exact: DataFrame,
                  hexDigits: Int): DataFrame = {
    val m = math.pow(16, hexDigits).toLong
    val est = hllEstExpr(m)
    regs.groupBy(col("grp"))
      .agg(count(lit(1)).as("filled"),
        sum(expr(hllTermSql)).as("s_present"))
      .join(exact, Seq("grp"))
      .select(col("grp"), col("n_exact"), col("filled"),
        expr(est).as("est"),
        expr(s"round((($est) - CAST(n_exact AS DOUBLE)) " +
          "/ CAST(n_exact AS DOUBLE) * 1000000.0, 6)").as("err_ppm"))
  }

  /** Direct per-group HLL next to its exact baseline:
    * (grp, n_exact, filled, est, err_ppm).
    */
  def hll(df: DataFrame, groupCol: String, valueCol: String,
          hexDigits: Int): DataFrame = {
    val exact = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(col(valueCol)).as("n_exact"))
    hllEstimate(hllRegisters(df, groupCol, valueCol, hexDigits),
      exact, hexDigits)
  }

  /** Cross-corpus union cardinality from SKETCHES ALONE — the merge
    * property that makes HLL the 100 TB tool: |A ∪ B| estimated by
    * pointwise-max over the two corpora's registers, with neither
    * corpus re-scanned at merge time. The exact side (distinct over
    * the physical union) is the audit baseline only.
    */
  def hllMerged(a: DataFrame, b: DataFrame, groupCol: String,
                valueCol: String, hexDigits: Int): DataFrame = {
    val regs = hllRegisters(a, groupCol, valueCol, hexDigits)
      .unionAll(hllRegisters(b, groupCol, valueCol, hexDigits))
      .groupBy(col("grp"), col("reg"))
      .agg(max(col("mj")).as("mj"))
    val exact = a.select(col(groupCol), col(valueCol))
      .unionAll(b.select(col(groupCol), col(valueCol)))
      .filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(col(valueCol)).as("n_exact"))
    hllEstimate(regs, exact, hexDigits)
  }
}
