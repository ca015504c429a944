package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** X128 in streaming form: ONLINE corpus-frequency line removal — the
  * CCNet shard model as a stream, where each micro-batch of documents
  * is cleaned against the line document-frequencies accumulated over
  * everything ingested so far.
  *
  * STATE IS THE DF LEDGER: per batch, each document's line digests
  * collapse row-locally (`array_distinct` — one count per document per
  * line, [[graft.ops.Boilerplate]]'s grain) and the batch's per-digest
  * document counts append as a DELTA partition; the accumulated
  * document frequency of a line is the SUM of its deltas, and the
  * corpus size the sum of per-batch doc counts (a 1-row meta
  * partition). Both merge by addition — exactly why this streams. The
  * state is digest-grain (one row per batch per distinct-in-batch
  * line), the [[DedupStream]] sliver-size contract: digests, never
  * text.
  *
  * POINT-IN-TIME CONTRACT: batch N's documents are cleaned against
  * frequencies over batches 0..N INCLUSIVE — a single batch therefore
  * equals [[graft.ops.Boilerplate.removeFrequentLines]] on the same
  * rows exactly. Documents emitted by earlier batches are NOT
  * retro-cleaned when a line later crosses the threshold (the
  * [[DecontaminateStream]] point-in-time discipline; a re-clean pass
  * over the ledger is a batch re-run). State is APPEND-ONLY and
  * batchId-partitioned with the strict `batch_id < N` read rule:
  * at-least-once replay recomputes the identical deltas and rewrites
  * identical partitions — exactly-once, no pointer file.
  */
object BoilerplateStream {

  /** One micro-batch: accumulate dfs, clean the batch against them,
    * append the delta — exposed for direct unit testing of the replay
    * contract.
    */
  def applyBatch(statePath: String, idCol: String, textCol: String,
                 docFracPpm: Long)
                (batch: DataFrame, batchId: Long): Unit = {
    require(docFracPpm >= 1 && docFracPpm <= 1000000,
      s"docFracPpm $docFracPpm out of [1, 1e6]")
    val spark = batch.sparkSession
    val base = batch.filter(col(textCol).isNotNull)
      .select(col(idCol), col(textCol)).localCheckpoint(false)
    // the batch's per-digest document counts (one per doc per line) —
    // the batch operator's distinct-grain kernel
    val delta = graft.ops.Boilerplate.docDigests(base, idCol, textCol)
      .groupBy(col("d")).agg(count(lit(1)).as("df"))
      .localCheckpoint(false)
    val nDelta = base.agg(count(lit(1)).as("n_docs"))
      .localCheckpoint(false)

    val priorDf = DedupStream.readState(spark, s"$statePath/df",
      delta, Seq("d", "df"), batchId)
    val priorN = DedupStream.readState(spark, s"$statePath/meta",
      nDelta, Seq("n_docs"), batchId)
    // accumulated frequencies INCLUDING this batch (single batch ==
    // the batch operator), merged by addition, then the operator's own
    // threshold + excision kernels — one code path, not a transcript
    val acc = priorDf.unionByName(delta)
      .groupBy(col("d")).agg(sum(col("df")).as("df"))
    val nTotal = priorN.unionByName(nDelta)
      .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"))
    val frequent = graft.ops.Boilerplate.thresholdFrequent(
      acc, nTotal, docFracPpm)
    val cleaned = graft.ops.Boilerplate.excise(base, idCol, textCol,
      frequent)

    cleaned.write.mode("overwrite")
      .parquet(s"$statePath/out/batch_id=$batchId")
    delta.write.mode("overwrite")
      .parquet(s"$statePath/df/batch_id=$batchId")
    nDelta.write.mode("overwrite")
      .parquet(s"$statePath/meta/batch_id=$batchId")
  }

  /** The full cleaned-document ledger across every batch so far. */
  def ledger(spark: SparkSession, statePath: String): DataFrame =
    StateMaintenance.stableRead(spark, s"$statePath/out")

  /** Drain a streaming frame of (idCol, textCol) documents into the
    * online boilerplate state under `statePath`.
    */
  def start(docs: DataFrame, statePath: String, idCol: String,
            textCol: String, docFracPpm: Long,
            checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("BoilerplateStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, idCol, textCol, docFracPpm)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
