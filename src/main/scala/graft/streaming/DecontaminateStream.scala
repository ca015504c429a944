package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Dedup

/** X60 in streaming form: ONLINE eval-set decontamination — corpus
  * documents and eval-suite documents arrive interleaved (rows flagged
  * by `evalCol`), and every corpus document is excised against the
  * eval shingles seen SO FAR, the shape of an ingestion pipeline whose
  * benchmark suite itself grows over time ("new eval released —
  * everything from now on is cleaned against it too").
  *
  * POINT-IN-TIME CONTRACT (the [[SubstringStream]] cap discipline):
  * batch N's cleaned output equals batch-mode
  * `Dedup.decontaminate(batchN corpus rows, eval rows of batches
  * 0..N)` — including the batch's OWN eval rows, so a single batch
  * reduces to the batch operator exactly — and earlier emissions are
  * never re-cleaned as the eval set grows (append-only). A pipeline
  * needing full retroactive decontamination against a late-arriving
  * eval suite re-runs batch x60 over the emitted corpus; the stream's
  * job is to stop NEW contamination reaching the sink.
  *
  * STATE IS THE SHINGLE SET, NOT THE EVAL TEXT: per batch the state
  * gains only the eval delta's NOVEL distinct n-shingles (anti-joined
  * against the prior set — the [[KnLmStream]] novelty-append
  * discipline), so the state stays bounded by the eval suite's
  * distinct-shingle mass — tiny by construction — and BROADCASTS into
  * each batch's positional match. Per-batch cost is the batch's own
  * scan-side shingle explode plus the broadcast join; the corpus never
  * shuffles. State is APPEND-ONLY and batchId-partitioned
  * (`state/{evsh,cleaned}/batch_id=N`) with the strict `batch_id < N`
  * read rule: at-least-once replay sees the identical prior shingle
  * set and rewrites identical partitions — exactly-once, no pointer
  * file.
  */
object DecontaminateStream {

  def applyBatch(statePath: String, idCol: String, textCol: String,
                 evalCol: String, n: Int)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val rows = batch
      .select(col(idCol), col(textCol), col(evalCol).as("is_eval"))
      .localCheckpoint(false)
    val evalDelta = Dedup.evalShingleSet(
      rows.filter(col("is_eval")), textCol, n)
    val priorSh = DedupStream.readState(spark, s"$statePath/evsh",
      evalDelta, Seq("s"), batchId)
    // novelty only: the appended state stays the distinct shingle set
    val newSh = evalDelta.join(priorSh, Seq("s"), "left_anti")
      .localCheckpoint(false)
    // prior ∪ new is a disjoint union of the full set — no distinct
    val allSh = priorSh.unionByName(newSh)
    val cleaned = Dedup.decontaminateAgainst(
      rows.filter(!col("is_eval")).select(col(idCol), col(textCol)),
      allSh, idCol, textCol, n)
    cleaned.write.mode("overwrite")
      .parquet(s"$statePath/cleaned/batch_id=$batchId")
    newSh.write.mode("overwrite")
      .parquet(s"$statePath/evsh/batch_id=$batchId")
  }

  /** All cleaned corpus rows emitted so far. */
  def cleaned(spark: SparkSession, statePath: String,
              idCol: String): DataFrame =
    StateMaintenance.stableRead(spark, s"$statePath/cleaned")
      .select(col(idCol), col("clean_text"), col("n_removed"))

  /** Drain a streaming frame of (idCol, textCol, evalCol) rows into
    * the online decontamination state under `statePath`.
    */
  def start(docs: DataFrame, statePath: String, idCol: String,
            textCol: String, evalCol: String, n: Int,
            checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("DecontaminateStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, idCol, textCol, evalCol, n)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
