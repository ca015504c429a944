package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** X127 in streaming form: ONLINE word-frequency subsampling — each
  * micro-batch of documents is damped against the word frequencies
  * accumulated over everything ingested so far, the streaming shape of
  * word2vec's high-frequency subsampling for a corpus that arrives as
  * a feed.
  *
  * STATE IS THE FREQUENCY LEDGER: per batch, the batch's per-word
  * occurrence counts append as a DELTA partition and the accumulated
  * count of a word is the SUM of its deltas (the corpus total folds
  * from the accumulated vocab table, never stored separately — it is
  * derivable, so storing it would just be a second thing to keep
  * consistent). Counts merge by addition — exactly why this streams —
  * and state is vocab-grain per batch, the [[BoilerplateStream]]
  * sliver-size contract.
  *
  * POINT-IN-TIME CONTRACT: batch N's keep decisions use frequencies
  * over batches 0..N INCLUSIVE through the SAME
  * [[graft.ops.Sample.subsampleTokens]] kernel as the batch operator,
  * so a single batch equals [[graft.ops.Sample.freqSubsample]] on the
  * same rows exactly. Earlier batches are not re-sampled as
  * frequencies grow (the [[BoilerplateStream]] point-in-time
  * discipline); the per-occurrence md5 keep hash is state-free, so a
  * batch re-run makes identical decisions given identical accumulated
  * counts. State is APPEND-ONLY and batchId-partitioned with the
  * strict `batch_id < N` read rule: at-least-once replay recomputes
  * the identical deltas and rewrites identical partitions —
  * exactly-once, no pointer file.
  */
object SubsampleStream {

  /** One micro-batch: accumulate counts, subsample the batch against
    * them, append the delta — exposed for direct unit testing of the
    * replay contract.
    */
  def applyBatch(statePath: String, idCol: String, textCol: String,
                 tPpm: Long, seed: String)
                (batch: DataFrame, batchId: Long): Unit = {
    require(tPpm >= 1 && tPpm <= 1000000, s"tPpm $tPpm out of [1, 1e6]")
    val spark = batch.sparkSession
    // tokenize filters null text itself; only the token table needs
    // pinning (it feeds the delta AND the keep probe — base has no
    // second consumer here, unlike the x130 twin)
    val toks = graft.ops.Sample.tokenize(
        batch.select(col(idCol), col(textCol)), idCol, textCol)
      .localCheckpoint(false)
    val delta = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false)

    val prior = DedupStream.readState(spark, s"$statePath/counts",
      delta, Seq("w", "c"), batchId)
    // accumulated frequencies INCLUDING this batch (single batch ==
    // the batch operator), merged by addition; vocab-sized
    val acc = prior.unionByName(delta)
      .groupBy(col("w")).agg(sum(col("c")).as("c"))
      .localCheckpoint(false)
    val out = graft.ops.Sample.subsampleTokens(toks, idCol, acc, tPpm, seed)

    out.write.mode("overwrite")
      .parquet(s"$statePath/out/batch_id=$batchId")
    delta.write.mode("overwrite")
      .parquet(s"$statePath/counts/batch_id=$batchId")
  }

  /** The full subsampled-document ledger across every batch so far. */
  def ledger(spark: SparkSession, statePath: String): DataFrame =
    StateMaintenance.stableRead(spark, s"$statePath/out")

  /** Drain a streaming frame of (idCol, textCol) documents into the
    * online subsampling state under `statePath`.
    */
  def start(docs: DataFrame, statePath: String, idCol: String,
            textCol: String, tPpm: Long, seed: String,
            checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("SubsampleStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, idCol, textCol, tPpm, seed)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
