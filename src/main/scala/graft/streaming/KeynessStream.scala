package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** X132 in streaming form: ONLINE Dunning G² keyness — per-slice
  * signature-vocabulary monitoring for a feed (which words is today's
  * ingest making significantly over-represented in one source?).
  *
  * STATE IS THE (group, word) COUNT LEDGER — the exact
  * [[UnigramKlStream]] surface: per batch, slice-grain token counts
  * append as a DELTA partition and merge by pure addition; the word
  * marginals, group totals, and corpus total all FOLD from the one
  * accumulated (grp, w, c) table.
  *
  * SNAPSHOT CONTRACT (the [[BurstinessStream]] shape): the accumulated
  * counts ARE the batch operator's aggregation state, so batch N's
  * snapshot equals [[graft.ops.CorpusStats.dunningKeyness]] over ALL
  * documents of batches 0..N — full snapshot equality at every batch
  * through the shared [[graft.ops.CorpusStats.keynessOf]] kernel. Each
  * batch overwrites the (filtered) cell-grain snapshot; [[latest]]
  * reads the highest batch. State is APPEND-ONLY with the strict
  * `batch_id < N` read rule: at-least-once replay recomputes identical
  * deltas and rewrites identical partitions — exactly-once, no pointer
  * file. Maintenance: counts fold via
  * [[StateMaintenance.compactState]], key snapshots prune via
  * [[StateMaintenance.pruneSnapshots]] (registered in
  * [[StateMaintenance.TwinStateShapes]]).
  */
object KeynessStream {

  /** One micro-batch: accumulate counts, snapshot the keyness table,
    * append the delta — exposed for direct unit testing of the replay
    * contract.
    */
  def applyBatch(statePath: String, grpCol: String, textCol: String,
                 minCount: Long)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // the batch operator's own tokenization (shared kernel — a
    // delimiter or filter change cannot diverge the snapshot contract)
    val delta = graft.ops.CorpusStats
      .groupWordCounts(batch, grpCol, textCol)
      .withColumnRenamed("c_sw", "c")
      .localCheckpoint(false)

    val prior = DedupStream.readState(spark, s"$statePath/counts",
      delta, Seq("grp", "w", "c"), batchId)
    val acc = prior.unionByName(delta)
      .groupBy(col("grp"), col("w")).agg(sum(col("c")).as("c_sw"))
      .localCheckpoint(false) // feeds three folds + the cell join
    val snapshot = graft.ops.CorpusStats.keynessOf(acc, minCount)

    snapshot.write.mode("overwrite")
      .parquet(s"$statePath/key/batch_id=$batchId")
    delta.write.mode("overwrite")
      .parquet(s"$statePath/counts/batch_id=$batchId")
  }

  /** The LATEST keyness snapshot: each batch rewrites the full
    * cell-grain table, so read the highest batch partition.
    */
  def latest(spark: SparkSession, statePath: String): DataFrame =
    DedupStream.latestSnapshot(spark, s"$statePath/key",
      Seq("grp", "w", "c_sw", "dir", "g2_micro"))

  /** Drain a streaming frame of (grpCol, textCol) documents into the
    * online keyness state under `statePath`.
    */
  def start(docs: DataFrame, statePath: String, grpCol: String,
            textCol: String, minCount: Long,
            checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("KeynessStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, grpCol, textCol, minCount)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
