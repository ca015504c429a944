package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.KneserNey

/** X56 in streaming form: ONLINE CCNet perplexity bucketing — scored
  * documents arrive in batches and each is assigned head/middle/tail
  * against tertile thresholds derived from the REFERENCE slice seen so
  * far, the shape of a continuous ingestion pipeline quality-routing
  * documents as they land (CCNet's bucket-by-Wikipedia-perplexity
  * recipe, Wenzek et al. 2020, run against a reference that is itself
  * still streaming in).
  *
  * Input rows are (idCol, avg_p_fix, refCol): already-scored documents
  * — the natural upstream is [[KnLmStream]]'s per-batch score emissions
  * (the composed pipeline is spec-pinned) — with `refCol` marking the
  * reference slice (CCNet's target-domain sample).
  *
  * POINT-IN-TIME CONTRACT (the [[SubstringStream]] cap discipline):
  * batch N's buckets equal batch-mode
  * `KneserNey.perplexityBuckets(batchN, refs seen through N)` —
  * thresholds come from the CUMULATIVE reference slice INCLUDING the
  * batch's own reference rows, and earlier batches are never
  * re-bucketed as thresholds drift (append-only emissions). WARM-UP:
  * until the first reference row arrives there is no threshold to cut
  * with — those documents emit `bucket = NULL`, explicitly unbucketed
  * (the batch operator refuses an empty slice loudly; a stream cannot,
  * so the unknown is surfaced as NULL, never silently 'tail').
  *
  * Per-batch cost: the reference ledger read is O(reference rows seen)
  * — tiny by CCNet construction (the reference is a curated sample,
  * not the corpus) — plus the batch's own scan; the 1-row threshold
  * table broadcasts into the batch assignment, so the corpus-sized
  * side never shuffles. State is APPEND-ONLY and batchId-partitioned
  * (`state/{refsc,buckets}/batch_id=N`) with the strict `batch_id < N`
  * read rule: at-least-once replay sees the identical prior reference
  * ledger and rewrites identical partitions — exactly-once with no
  * pointer file.
  */
object PplBucketStream {

  def applyBatch(statePath: String, idCol: String, refCol: String)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val scoredBatch = batch
      .select(col(idCol), col("avg_p_fix"), col(refCol).as("is_ref"))
      .localCheckpoint(false)
    val refDelta = scoredBatch.filter(col("is_ref"))
      .select(col(idCol), col("avg_p_fix"))
    val priorRef = DedupStream.readState(spark, s"$statePath/refsc",
      refDelta, Seq(idCol, "avg_p_fix"), batchId)
    // cumulative slice through THIS batch — including its own ref rows,
    // so a single batch reduces to the batch operator exactly
    val allRef = priorRef.unionByName(refDelta).localCheckpoint(false)
    // empty cumulative slice → warm-up: both thresholds NULL, bucketOf
    // would silently emit 'tail' for every row, so the assignment is
    // guarded to NULL until a reference row exists
    val th = KneserNey.tertileThresholds(allRef, idCol)
      .withColumn("warm", lit(allRef.isEmpty))
    val buckets = scoredBatch.crossJoin(broadcast(th))
      .select(col(idCol), col("avg_p_fix"),
        when(col("warm"), lit(null).cast("string"))
          .otherwise(KneserNey.bucketOf).as("bucket"))
    buckets.write.mode("overwrite")
      .parquet(s"$statePath/buckets/batch_id=$batchId")
    refDelta.write.mode("overwrite")
      .parquet(s"$statePath/refsc/batch_id=$batchId")
  }

  /** All per-batch bucket assignments emitted so far. */
  def buckets(spark: SparkSession, statePath: String,
              idCol: String): DataFrame =
    StateMaintenance.stableRead(spark, s"$statePath/buckets")
      .select(col(idCol), col("avg_p_fix"), col("bucket"))

  /** Drain a streaming frame of (idCol, avg_p_fix, refCol) scored
    * documents into the online bucketing state under `statePath`.
    */
  def start(scored: DataFrame, statePath: String, idCol: String,
            refCol: String, checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    scored.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("PplBucketStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, idCol, refCol)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
