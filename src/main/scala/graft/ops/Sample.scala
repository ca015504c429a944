package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X6 — deterministic hash sampling for training-data pipelines.
  *
  * `rand()`-based sampling is nondeterministic across retries and engines;
  * here a row is kept iff the first 8 hex chars of md5(key ++ seed) fall
  * below floor(fraction * 2^32) — fixed-width lowercase hex compares
  * lexicographically = numerically, so the predicate is reproducible in
  * any engine with md5 (the DuckDB oracle runs the identical expression),
  * stable under retries/replays, and consistent across shards with no
  * coordination: a pure scan-side filter that pushes work to zero at
  * 100 TB (rejected rows never leave the scan).
  */
object Sample {

  /** 8-hex-char threshold for a [0,1) fraction. */
  def threshold(fraction: Double): String = {
    require(fraction >= 0 && fraction < 1, s"fraction must be in [0,1): $fraction")
    f"${math.floor(fraction * 4294967296.0).toLong}%08x"
  }

  /** The shared reproducibility primitive: first 8 hex chars of
    * md5(key ++ seed). Non-private so [[Curate]] assigns splits/quotas
    * off the IDENTICAL expression (the oracles and the split-stability
    * guarantee both depend on the two never diverging).
    */
  private[ops] def bucket(keyCol: Column, seed: String): Column =
    substring(md5(concat(keyCol.cast("string"), lit(seed))), 1, 8)

  /** Uniform deterministic sample. */
  def uniform(df: DataFrame, keyCol: String, fraction: Double,
              seed: String = ""): DataFrame =
    df.filter(bucket(col(keyCol), seed) < lit(threshold(fraction)))

  /** Weighted deterministic Bernoulli sample: row kept with probability
    * `fraction * weight / maxWeight` — documents weighted by length,
    * domains by trust score, etc. The comparison is EXACT integer
    * arithmetic (`hash * maxWeight < fraction * 2^32 * weight`, both
    * sides bigint), so unlike the float `u^(1/w)` reservoir-key trick it
    * is bit-reproducible in any engine. Still a pure scan-side filter:
    * rejected rows never leave the scan.
    *
    * `maxWeight` is a corpus constant the caller supplies (at 100 TB you
    * know your weight cap; deriving it would cost an extra aggregate
    * pass). Weights above it keep the row always — clamped, not an error.
    */
  def weighted(df: DataFrame, keyCol: String, weightCol: String,
               fraction: Double, maxWeight: Long,
               seed: String = ""): DataFrame = {
    require(fraction >= 0 && fraction < 1, s"fraction must be in [0,1): $fraction")
    require(maxWeight >= 1, s"maxWeight must be >= 1: $maxWeight")
    val hv = conv(bucket(col(keyCol), seed), 16, 10).cast("bigint")
    val bound = lit(math.floor(fraction * 4294967296.0).toLong) *
      least(col(weightCol).cast("bigint"), lit(maxWeight))
    df.filter(hv * lit(maxWeight) < bound)
  }

  /** Stratified deterministic sample: per-stratum fractions with a default
    * for unlisted strata. The threshold is a row-local CASE — still a pure
    * scan-side filter.
    */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
                 fractions: Map[String, Double], default: Double,
                 seed: String = ""): DataFrame = {
    val thr = fractions.foldLeft(lit(threshold(default))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(threshold(f))).otherwise(acc)
    }
    df.filter(bucket(col(keyCol), seed) < thr)
  }
}
