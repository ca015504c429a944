package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.{Bloom, Dedup}

/** X74 in streaming form: ONLINE Bloom-gated eval contamination — corpus
  * and eval documents arrive interleaved (flagged by `evalCol`), and
  * every corpus document is scored against the eval suite seen SO FAR
  * through the x74 bitmap gate + exact verify.
  *
  * POINT-IN-TIME CONTRACT (the [[DecontaminateStream]] discipline):
  * batch N's output equals batch-mode `Bloom.contamination(batchN
  * corpus rows, eval rows of batches 0..N)` — a single batch reduces to
  * the batch operator exactly — and earlier emissions are never
  * re-scored as the eval set grows (append-only).
  *
  * STATE IS THE (eval_id, shingle) TABLE (x74 counts distinct eval
  * DOCS, so ids ride along — the one addition over
  * [[DecontaminateStream]]'s bare shingle set): per batch it gains only
  * the eval delta's NOVEL pairs, stays bounded by the eval suite's
  * shingle mass, and broadcasts into the verify join. The 32 KB bitmap
  * is REBUILT from the accumulated distinct set each batch (one
  * map-side-combined bit_or — bitmap-sized, not shingle-count-sized);
  * a production stream would exploit Bloom OR-monotonicity and keep the
  * bitmap itself as merge-only state, same answers either way. State is
  * APPEND-ONLY and batchId-partitioned with the strict `batch_id < N`
  * read rule: at-least-once replay sees the identical prior state and
  * rewrites identical partitions — exactly-once, no pointer file.
  */
object BloomGateStream {

  def applyBatch(statePath: String, idCol: String, textCol: String,
                 evalCol: String, n: Int, m: Int, k: Int)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val rows = batch
      .select(col(idCol), col(textCol),
        // a null eval flag would silently vanish from BOTH sides of the
        // gate (filter(f) and filter(!f) each reject null) — raise
        // instead of letting a document slip past unexamined
        when(col(evalCol).isNotNull, col(evalCol))
          .otherwise(expr(
            "raise_error('BloomGateStream: null eval flag')").cast("boolean"))
          .as("is_eval"))
      .localCheckpoint(false)
    // distinct WITHIN the delta too: an at-least-once source can
    // duplicate an eval row inside one batch, and the left_anti below
    // only dedupes against PRIOR batches
    val evalDelta = Dedup.shingleTable(
        rows.filter(col("is_eval")), idCol, textCol, n)
      .select(col(idCol).as("eval_id"), col("s"))
      .distinct()
    val prior = DedupStream.readState(spark, s"$statePath/evsh",
      evalDelta, Seq("eval_id", "s"), batchId)
    // novelty only: the appended state stays the distinct pair table
    val novel = evalDelta.join(prior, Seq("eval_id", "s"), "left_anti")
      .localCheckpoint(false)
    val all = prior.unionByName(novel)
    val scored = Bloom.contaminationAgainst(
      // distinct for the same at-least-once reason as the eval delta:
      // a corpus row duplicated WITHIN the batch must score once
      rows.filter(!col("is_eval")).select(col(idCol), col(textCol))
        .distinct(),
      all, idCol, textCol, n, m, k)
    scored.write.mode("overwrite")
      .parquet(s"$statePath/contam/batch_id=$batchId")
    novel.write.mode("overwrite")
      .parquet(s"$statePath/evsh/batch_id=$batchId")
  }

  /** All (idCol, n_eval_matches) scores emitted so far. */
  def scores(spark: SparkSession, statePath: String,
             idCol: String): DataFrame =
    StateMaintenance.stableRead(spark, s"$statePath/contam")
      .select(col(idCol), col("n_eval_matches"))

  /** Drain a streaming frame of (idCol, textCol, evalCol) rows into
    * the online gate state under `statePath`.
    */
  def start(docs: DataFrame, statePath: String, idCol: String,
            textCol: String, evalCol: String, n: Int, m: Int, k: Int,
            checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("BloomGateStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, idCol, textCol, evalCol, n, m, k)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
