package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** X130 in streaming form: ONLINE word-dispersion moments — the
  * Fano-factor audit maintained incrementally as documents arrive.
  *
  * STATE IS THE MOMENT LEDGER: (df, n_occ, s2) are each sums over a
  * word's containing documents, and a document lives wholly in one
  * micro-batch, so per-batch moment DELTAS merge by pure addition
  * (the [[graft.ops.Similarity]] covariance-moment contract at word
  * grain) — exactly why this streams. Vocab-grain deltas append
  * batchId-partitioned; the per-batch doc count is a 1-row meta
  * partition.
  *
  * SNAPSHOT CONTRACT — stronger than the ledger twins: because the
  * accumulated moments ARE the batch operator's aggregation state,
  * batch N's snapshot equals [[graft.ops.CorpusStats.burstiness]] run
  * over ALL documents of batches 0..N — full equality at every batch
  * through the shared `vmrOf` kernel, not just point-in-time per-batch
  * rows. Each batch overwrites the full (small, minDf-gated) snapshot;
  * [[latest]] reads the highest batch (the [[CardinalityStream]]
  * shape). State is APPEND-ONLY with the strict `batch_id < N` read
  * rule: at-least-once replay recomputes identical deltas and rewrites
  * identical partitions — exactly-once, no pointer file.
  */
object BurstinessStream {

  /** One micro-batch: accumulate moments, snapshot the VMR table,
    * append the delta — exposed for direct unit testing of the replay
    * contract.
    */
  def applyBatch(statePath: String, idCol: String, textCol: String,
                 minDf: Long)
                (batch: DataFrame, batchId: Long): Unit = {
    require(minDf >= 1, s"minDf $minDf must be >= 1")
    val spark = batch.sparkSession
    val base = batch.filter(col(textCol).isNotNull)
      .select(col(idCol), col(textCol)).localCheckpoint(false)
    val delta = graft.ops.CorpusStats.wordMoments(base, idCol, textCol)
      .localCheckpoint(false)
    val nDelta = base.agg(count(lit(1)).as("n_docs"))
      .localCheckpoint(false)

    val priorM = DedupStream.readState(spark, s"$statePath/moments",
      delta, Seq("w", "df", "n_occ", "s2"), batchId)
    val priorN = DedupStream.readState(spark, s"$statePath/meta",
      nDelta, Seq("n_docs"), batchId)
    val acc = priorM.unionByName(delta)
      .groupBy(col("w"))
      .agg(sum(col("df")).as("df"), sum(col("n_occ")).as("n_occ"),
        sum(col("s2")).as("s2"))
    val nTotal = priorN.unionByName(nDelta)
      .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"))
    val snapshot = graft.ops.CorpusStats.vmrOf(acc, nTotal, minDf)

    snapshot.write.mode("overwrite")
      .parquet(s"$statePath/vmr/batch_id=$batchId")
    delta.write.mode("overwrite")
      .parquet(s"$statePath/moments/batch_id=$batchId")
    nDelta.write.mode("overwrite")
      .parquet(s"$statePath/meta/batch_id=$batchId")
  }

  /** The LATEST dispersion snapshot: each batch rewrites the full
    * minDf-gated table, so read the highest batch partition.
    */
  def latest(spark: SparkSession, statePath: String): DataFrame =
    DedupStream.latestSnapshot(spark, s"$statePath/vmr",
      Seq("w", "df", "n_occ", "vmr_micro"))

  /** Drain a streaming frame of (idCol, textCol) documents into the
    * online dispersion state under `statePath`.
    */
  def start(docs: DataFrame, statePath: String, idCol: String,
            textCol: String, minDf: Long,
            checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("BurstinessStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, idCol, textCol, minDf)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
