package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Bleu

/** X96 in streaming form: ONLINE corpus-BLEU monitoring of an unbounded
  * stream of aligned (hypothesis, reference) pairs — the live quality
  * gauge over a bitext-mining or augmentation pipeline's output, with
  * state bounded by GROUP COUNT, never pair count.
  *
  * STATE IS THE PER-BATCH DELTA COUNT TABLE: corpus BLEU's numerators
  * and denominators (clipped matches m1..mN, hyp totals t1..tN, length
  * sums c/r) are exact-integer SUMS over pairs ([[Bleu.counts]]'s
  * additivity, spec-pinned), so each batch reduces to its own per-group
  * count row — a pure function of the batch — appended under
  * `batch_id=N`. The stream-wide score at batch N is one sum over the
  * state partitions pushed through the SAME [[Bleu.withBleu]] estimator
  * the batch operator uses, so every snapshot equals the batch operator
  * run on the union of batches 0..N — the family's point-in-time
  * contract. Clipping is per PAIR, and a pair lives inside one batch,
  * so batch-local clipping is exactly global clipping.
  *
  * State is APPEND-ONLY and batchId-partitioned with the strict
  * `batch_id < N` read rule: at-least-once replay sees the identical
  * prior counts and rewrites the identical delta partition —
  * exactly-once, no pointer file. Pair text is never retained: state
  * rows are count integers only.
  */
object BleuStream {

  def applyBatch(statePath: String, grpCol: String, idCol: String,
                 hypCol: String, refCol: String, maxN: Int)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val stateCols = "grp" +: ((1 to maxN).map(n => s"m$n") ++
      (1 to maxN).map(n => s"t$n") ++ Seq("c", "r"))
    // the batch's own delta counts — pinned so the snapshot read and
    // the state write see one computation
    val delta = Bleu.counts(batch, grpCol, idCol, hypCol, refCol, maxN)
      .localCheckpoint(false)
    val prior = DedupStream.readState(spark, s"$statePath/counts", delta,
      stateCols, batchId)
    val full = prior.unionByName(delta).groupBy(col("grp"))
      .agg(sum(stateCols(1)).as(stateCols(1)),
        stateCols.drop(2).map(c => sum(c).as(c)): _*)
    Bleu.withBleu(full, maxN).write.mode("overwrite")
      .parquet(s"$statePath/score/batch_id=$batchId")
    delta.write.mode("overwrite")
      .parquet(s"$statePath/counts/batch_id=$batchId")
  }

  /** The LATEST per-group corpus BLEU: each batch writes the full
    * (grp, counts, bleu) snapshot, so read the highest batch partition.
    */
  def latest(spark: SparkSession, statePath: String): DataFrame = {
    DedupStream.latestSnapshot(spark, s"$statePath/score", Seq.empty)
  }

  /** Drain a streaming frame of aligned pairs into the online BLEU
    * state under `statePath`.
    */
  def start(pairs: DataFrame, statePath: String, grpCol: String,
            idCol: String, hypCol: String, refCol: String, maxN: Int,
            checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    pairs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("BleuStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, grpCol, idCol, hypCol, refCol,
        maxN)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
