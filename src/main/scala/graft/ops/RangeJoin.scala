package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X18 — banded range join: pairs `(l, r)` sharing an equi-key with
  * `r.ts` in `[l.ts, l.ts + window]`.
  *
  * Spark's built-in answer to a range predicate on top of an equi-join is
  * "join on the key, filter the band" — correct, but when a single key is
  * hot (one user with millions of events at 100 TB) the per-key cross
  * product explodes before the filter runs. The banded form bounds that:
  * time is cut into `window`-sized buckets, the left side is duplicated
  * into its bucket and the next (a right row matching `l` is at most
  * `window` later, so its bucket is `floor(l/window)` or that + 1), the
  * right side lands in exactly one bucket, and the join becomes a plain
  * equi-join on `(key, bucket)` + the exact band predicate. Each pair
  * meets in EXACTLY one bucket (the right row's), so no dedup pass is
  * needed, and a hot key's work is split across its time buckets instead
  * of colliding in one task.
  *
  * Callers pass pre-projected frames with disjoint non-key column names.
  * Timestamps are compared at µs precision; epoch values are assumed
  * non-negative (`div` truncates toward zero, which is floor only there).
  */
object RangeJoin {

  def banded(left: DataFrame, right: DataFrame, key: String,
             lTs: String, rTs: String, windowUs: Long): DataFrame = {
    require(windowUs >= 1, s"windowUs must be >= 1: $windowUs")
    val l = left
      .withColumn("__lus", unix_micros(col(lTs)))
      .withColumn("__b",
        explode(array(expr(s"__lus div $windowUs"), expr(s"__lus div $windowUs") + 1)))
    val r = right
      .withColumn("__rus", unix_micros(col(rTs)))
      .withColumn("__b", expr(s"__rus div $windowUs"))
    l.join(r, Seq(key, "__b"))
      .filter(col("__rus") >= col("__lus") &&
        col("__rus") <= col("__lus") + lit(windowUs))
      .withColumn("lag_us", col("__rus") - col("__lus"))
      .drop("__b", "__lus", "__rus")
  }
}
