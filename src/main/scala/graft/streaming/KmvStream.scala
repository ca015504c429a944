package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Kmv

/** X92 in streaming form: ONLINE per-group KMV (k-minimum-values) set
  * sketches over an unbounded stream — the last sketch-family member
  * without a twin, and mergeable BY CONSTRUCTION: the k smallest
  * digests of a union are a subset of the union of each side's k
  * smallest, so min-k(state ∪ batch-sketch) IS the sketch of
  * everything ever seen (the same pointwise-merge argument as
  * [[HllStream]]'s register maxima).
  *
  * STATE IS THE ADMISSION LOG: per batch, the batch's own min-k sketch
  * ([[Kmv.sketch]] — two-level rank, digests only) merges with the
  * log's reconstruction, and only digests NEWLY ENTERING the current
  * sketch append. A digest is admitted at most once ever, and a new
  * digest displaces the current k-th minimum — under md5's uniform
  * order the expected lifetime admissions per group are ~k·ln(n/k)+k,
  * the [[HllStream]] improvement-log bound, independent of stream
  * length in practice. Read-time min-k over the log reconstructs the
  * sketch exactly (the log always contains the true sketch as a
  * subset; supersets are harmless because min-k re-filters).
  *
  * POINT-IN-TIME CONTRACT: batch N's sketch snapshot equals
  * [[Kmv.sketch]] on the union of batches 0..N (spec-pinned), so any
  * two streams' snapshots feed [[Kmv.jaccardEst]] directly — the
  * cross-corpus overlap estimate without re-scanning either stream.
  * State is APPEND-ONLY and batchId-partitioned with the strict
  * `batch_id < N` read rule: at-least-once replay sees the identical
  * prior log and rewrites identical partitions — exactly-once, no
  * pointer file.
  */
object KmvStream {

  def applyBatch(statePath: String, groupCol: String, valueCol: String,
                 k: Int)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // the batch's own sketch: ≤ k digests per group leave the scan
    val bs = Kmv.sketch(batch, groupCol, valueCol, k)
    val prior = DedupStream.readState(spark, s"$statePath/mins", bs,
      Seq("grp", "h"), batchId)
    // current sketch = min-k over log ∪ batch sketch; both sides are
    // sketch-sized (≤ admissions + k rows per group), so a plain
    // grp-partitioned rank is bounded work — never a corpus sort
    val merged = prior.unionByName(bs).distinct()
      .withColumn("r", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"))))
      .filter(col("r") <= k)
      .select(col("grp"), col("h"))
      .localCheckpoint(false)
    // admissions: sketch members the log has never held (null-safe on
    // grp — a null group is legitimate and must not re-append)
    val novel = merged.as("m").join(prior.as("p"),
        col("m.grp") <=> col("p.grp") && col("m.h") === col("p.h"),
        "left_anti")
      .select(col("m.grp").as("grp"), col("m.h").as("h"))
    merged.write.mode("overwrite")
      .parquet(s"$statePath/sketch/batch_id=$batchId")
    novel.write.mode("overwrite")
      .parquet(s"$statePath/mins/batch_id=$batchId")
  }

  /** The LATEST per-group sketch: each batch rewrites the full (grp, h)
    * snapshot, so read the highest batch partition. Feed two streams'
    * snapshots to [[Kmv.jaccardEst]] for the overlap estimate.
    */
  def latest(spark: SparkSession, statePath: String): DataFrame = {
    DedupStream.latestSnapshot(spark, s"$statePath/sketch",
      Seq("grp", "h"))
  }

  /** Drain a streaming frame of (groupCol, valueCol) rows into the
    * online sketch state under `statePath`.
    */
  def start(rows: DataFrame, statePath: String, groupCol: String,
            valueCol: String, k: Int,
            checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    rows.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("KmvStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, groupCol, valueCol, k)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
