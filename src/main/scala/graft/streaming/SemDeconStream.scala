package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.{SemDedup, Similarity}

/** X117 in streaming form: ONLINE semantic decontamination — corpus
  * vectors and eval-suite vectors arrive interleaved (rows flagged by
  * `evalCol`), and every corpus vector is gated against the eval
  * vectors seen SO FAR. The embedding-space twin of
  * [[DecontaminateStream]]: "new eval suite released — everything from
  * now on is semantically screened against it too".
  *
  * POINT-IN-TIME CONTRACT: batch N's verdicts equal batch-mode
  * [[SemDedup.semanticDecon]](batch-N corpus rows, eval rows of
  * batches 0..N) — including the batch's OWN eval rows, so a single
  * batch reduces to the batch operator exactly. Earlier verdicts are
  * never revisited as the eval set grows (append-only); a pipeline
  * needing retroactive screening re-runs batch x117 over the emitted
  * corpus — the stream's job is stopping NEW contamination.
  *
  * STATE IS THE QUANTIZED EVAL BLOCK, never raw floats: per batch the
  * state gains only NOVEL eval ids (anti-join against the prior set),
  * each as its exact floor(x·1000) integer vector — so replay re-derives
  * bit-identical cosines, and the state stays bounded by the eval
  * suite's size (tiny by construction — the x74 bounded-eval argument),
  * broadcasting into each batch's corpus scan. Cold start (no eval seen
  * yet) emits `keep` with the [[SemDedup.NoEvalSentinelPpm]] sentinel
  * instead of a fake similarity. State is APPEND-ONLY and
  * batchId-partitioned with the strict `batch_id < N` read rule:
  * at-least-once replay sees the identical prior block and rewrites
  * identical partitions — exactly-once, no pointer file.
  */
object SemDeconStream {

  def applyBatch(statePath: String, idCol: String, vecCol: String,
                 evalCol: String, tauPpm: Long)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val rows = batch
      .select(col(idCol), col(vecCol), col(evalCol).as("is_eval"))
      .localCheckpoint(false)
    val evalDelta = rows.filter(col("is_eval"))
      .select(col(idCol).as("eval_id"),
        Similarity.quantize(col(vecCol)).as("eq"))
      .dropDuplicates("eval_id")
    val prior = DedupStream.readState(spark, s"$statePath/ev",
      evalDelta, Seq("eval_id", "eq"), batchId)
    val novel = evalDelta.join(prior.select(col("eval_id")),
        Seq("eval_id"), "left_anti")
      .localCheckpoint(false)
    val allEv = prior.unionByName(novel)
    val verdicts = SemDedup.semanticDeconAgainst(
      rows.filter(!col("is_eval")).select(col(idCol), col(vecCol)),
      allEv, idCol, vecCol, tauPpm)
    verdicts.write.mode("overwrite")
      .parquet(s"$statePath/out/batch_id=$batchId")
    novel.write.mode("overwrite")
      .parquet(s"$statePath/ev/batch_id=$batchId")
  }

  /** All verdicts emitted so far. */
  def verdicts(spark: SparkSession, statePath: String,
               idCol: String): DataFrame =
    StateMaintenance.stableRead(spark, s"$statePath/out")
      .select(col(idCol), col("max_sim_ppm"), col("nearest_eval"),
        col("verdict"))

  /** Drain a streaming frame of (idCol, vecCol, evalCol) rows through
    * the online semantic gate under `statePath`.
    */
  def start(rows: DataFrame, statePath: String, idCol: String,
            vecCol: String, evalCol: String, tauPpm: Long,
            checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    rows.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("SemDeconStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, idCol, vecCol, evalCol,
        tauPpm)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
