package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Quantile

/** X91 in streaming form: ONLINE per-group φ-quantiles over an
  * unbounded stream — the quantile summary is mergeable BY UNION
  * (weighted rows just concatenate; that is the Manku-Rajagopalan-
  * Lindsay shape's whole point), so streaming needs no new estimator:
  * each batch contributes its own ≤ shards·(k+1)-row summary and the
  * answer is read off the union.
  *
  * STATE IS THE SUMMARY LOG: per batch, [[Quantile.summary]] over the
  * batch alone (per-(group, shard) sort — batch-local, embarrassingly
  * parallel) appends as-is; nothing is ever rewritten. Read-time union
  * of the log IS the merged summary. State grows by one bounded
  * summary PER BATCH (shards·(k+1) rows per group), not with data
  * volume — the cross-batch analog of per-executor summary roll-up. A
  * production stream would periodically COMPACT the log (re-summarize
  * the weighted union, trading ε for ε+ε′ — Greenwald-Khanna's merge
  * analysis); that seam is deliberately left out here so the emitted
  * numbers stay exactly replayable from the data.
  *
  * ERROR CONTRACT of the merged summary: batch b's summary bounds the
  * rank gap by n_b/k + shards, so after B batches the merged bound is
  * Σn_b/k + B·shards = n/k + B·shards — the batch operator's bound
  * with `shards` scaled by the batch count (spec-asserted against the
  * union data). The estimates themselves come from
  * [[Quantile.estimateFromSummary]] — the SAME fragment the batch
  * operator scores through, so the two cannot drift on target/pick
  * arithmetic.
  *
  * POINT-IN-TIME CONTRACT: batch N emits estimates over the union of
  * batches 0..N. State is APPEND-ONLY and batchId-partitioned with the
  * strict `batch_id < N` read rule: at-least-once replay recomputes
  * the identical batch summary ([[Quantile.summary]] is deterministic
  * given a unique idCol) and rewrites identical partitions —
  * exactly-once, no pointer file.
  */
object QuantileStream {

  def applyBatch(statePath: String, groupCol: String, valueCol: String,
                 idCol: String, shards: Int, k: Int, phisPpm: Seq[Long])
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val bs = Quantile.summary(batch, groupCol, valueCol, idCol,
      shards, k).localCheckpoint(false)
    val prior = DedupStream.readState(spark, s"$statePath/summ", bs,
      Seq("grp", "shard", "v", "w"), batchId)
    val est = Quantile.estimateFromSummary(prior.unionByName(bs), phisPpm)
      .select(col("grp"), col("n"), col("phi_ppm"), col("est"),
        col("target"))
    est.write.mode("overwrite")
      .parquet(s"$statePath/q/batch_id=$batchId")
    bs.write.mode("overwrite")
      .parquet(s"$statePath/summ/batch_id=$batchId")
  }

  /** The LATEST per-group estimates: each batch rewrites the full
    * snapshot, so read the highest batch partition.
    */
  def latest(spark: SparkSession, statePath: String): DataFrame = {
    DedupStream.latestSnapshot(spark, s"$statePath/q",
      Seq("grp", "n", "phi_ppm", "est", "target"))
  }

  /** Drain a streaming frame into the online quantile state under
    * `statePath`.
    */
  def start(rows: DataFrame, statePath: String, groupCol: String,
            valueCol: String, idCol: String, shards: Int, k: Int,
            phisPpm: Seq[Long], checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    rows.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("QuantileStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, groupCol, valueCol, idCol,
        shards, k, phisPpm)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
