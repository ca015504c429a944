package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X27 — slowly-changing-dimension (type 2) history build: collapse an
  * ordered change stream into versioned validity intervals per key —
  * the standard CDC → warehouse-dimension materialization (one row per
  * (key, attribute-run), `valid_from`/`valid_to` half-open, open-ended
  * current row).
  *
  * Algorithm: one window pass per key ordered by (ts, tie-breaker) —
  * `lag(attr)` marks change points, a running sum of change points
  * numbers the versions, a per-(key, version) aggregate collapses each
  * run, and `lead(valid_from)` closes each interval with the next
  * version's start.
  *
  * Shape at 100 TB: everything partitions by the dimension key — ONE
  * shuffle, then the change-point window, the version aggregate, and
  * the interval-closing lead all reuse the same (key)-clustered
  * distribution (Catalyst collapses them into a single exchange; the
  * spec pins that). Skewed keys are bounded by their own history
  * length, not corpus size.
  */
object Cdc {

  /** Build the SCD2 history of `attrCol` per `keyCol`, ordered by
    * (`tsCol`, `tieCol`). Output: key, version (1-based), attr,
    * valid_from, valid_to (null = current), n_rows (source rows in the
    * run), is_current (int 1/0).
    */
  def scd2(df: DataFrame, keyCol: String, attrCol: String,
           tsCol: String, tieCol: String): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val changed = when(
      lag(col(attrCol), 1).over(byTime).isNull ||
        lag(col(attrCol), 1).over(byTime) =!= col(attrCol), 1L)
      .otherwise(0L)
    val versioned = df.select(col(keyCol), col(attrCol), col(tsCol), col(tieCol))
      .withColumn("version",
        sum(changed).over(byTime.rowsBetween(Window.unboundedPreceding, 0)))
    // min, not first: attr is constant within a (key, version) run by
    // construction, but min is order-deterministic and mirrors the
    // oracle's aggregate exactly — no reliance on aggregation order
    val runs = versioned.groupBy(col(keyCol), col("version"))
      .agg(min(col(attrCol)).as(attrCol),
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_rows"))
    val byVersion = Window.partitionBy(col(keyCol)).orderBy(col("version"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1).otherwise(0))
      .select(col(keyCol), col("version"), col(attrCol),
        col("valid_from"), col("valid_to"), col("n_rows"), col("is_current"))
  }

  /** X29 — the APPLY half of CDC: merge a change batch (upserts and
    * deletes) into a dimension snapshot, materializing the
    * latest-row-per-key state. The snapshot rows participate as the
    * oldest upsert per key, so keys untouched by the batch survive
    * unchanged, upserted keys take the newest change's attributes, and
    * keys whose newest change is a delete disappear.
    *
    * `snapshot` and `changes` must share the schema
    * (key, attrs..., tsCol, tieCol, opCol); `opCol` is 'U' (upsert) or
    * 'D' (delete). Output drops `opCol`.
    *
    * Shape at 100 TB: one shuffle on the key. The latest-row window is
    * a rank-1 filter, which Spark rewrites into WindowGroupLimit — a
    * per-partition top-1 BEFORE the exchange (map-side), so the shuffle
    * carries one candidate row per (input partition, key), not the full
    * change history. That is the MERGE kernel every warehouse implements.
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
                   keyCol: String, tsCol: String, tieCol: String,
                   opCol: String): DataFrame = {
    val merged = snapshot.unionByName(changes)
    val latest = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    merged
      .withColumn("rn", row_number().over(latest))
      .filter(col("rn") === 1 && col(opCol) === "U")
      .drop("rn", opCol)
  }
}
