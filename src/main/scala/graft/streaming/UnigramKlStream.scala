package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** X131 in streaming form: ONLINE per-group unigram KL against the
  * pooled corpus — composition-skew monitoring for a feed (is today's
  * ingest drifting one language's distribution away from the pool?).
  *
  * STATE IS THE (group, word) COUNT LEDGER: per batch, the slice-
  * grain token counts append as a DELTA partition and merge by pure
  * addition; pool counts, slice totals, and the corpus total all FOLD
  * from the accumulated (grp, w, c) table, so there is exactly one
  * state surface to keep consistent. Type-grain state, the
  * [[BoilerplateStream]] sliver-size contract.
  *
  * SNAPSHOT CONTRACT (the [[BurstinessStream]] shape): the accumulated
  * counts ARE the batch operator's aggregation state, so batch N's
  * snapshot equals [[graft.ops.CorpusStats.unigramKl]] over ALL
  * documents of batches 0..N — full snapshot equality at every batch
  * through the shared lane expression. Each batch overwrites the
  * group-sized snapshot; [[latest]] reads the highest batch. State is
  * APPEND-ONLY with the strict `batch_id < N` read rule: at-least-once
  * replay recomputes identical deltas and rewrites identical
  * partitions — exactly-once, no pointer file.
  */
object UnigramKlStream {

  /** One micro-batch: accumulate counts, snapshot the KL table, append
    * the delta — exposed for direct unit testing of the replay
    * contract.
    */
  def applyBatch(statePath: String, grpCol: String, textCol: String)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // the batch operator's own tokenization (shared kernel — delimiter
    // or filter changes cannot diverge the snapshot contract)
    val delta = graft.ops.CorpusStats
      .groupWordCounts(batch, grpCol, textCol)
      .withColumnRenamed("c_sw", "c")
      .localCheckpoint(false)

    val prior = DedupStream.readState(spark, s"$statePath/counts",
      delta, Seq("grp", "w", "c"), batchId)
    val acc = prior.unionByName(delta)
      .groupBy(col("grp"), col("w")).agg(sum(col("c")).as("c_sw"))
      .localCheckpoint(false) // feeds the pool fold, slice fold, terms
    // the batch operator's lane through the shared kernel — one code
    // path for the rounding seam, not a transcript
    val snapshot = graft.ops.CorpusStats.klOf(acc)

    snapshot.write.mode("overwrite")
      .parquet(s"$statePath/kl/batch_id=$batchId")
    delta.write.mode("overwrite")
      .parquet(s"$statePath/counts/batch_id=$batchId")
  }

  /** The LATEST KL snapshot: each batch rewrites the full group-sized
    * table, so read the highest batch partition.
    */
  def latest(spark: SparkSession, statePath: String): DataFrame =
    DedupStream.latestSnapshot(spark, s"$statePath/kl",
      Seq("grp", "n_tokens", "n_types", "kl_micro"))

  /** Drain a streaming frame of (grpCol, textCol) documents into the
    * online KL state under `statePath`.
    */
  def start(docs: DataFrame, statePath: String, grpCol: String,
            textCol: String, checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("UnigramKlStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, grpCol, textCol)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
