package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Curate

/** X144 in streaming form: ONLINE gate-RULE attribution — the
  * remediation face of the live feed beside [[GateRateStream]]'s
  * alarm ("source X's pass rate dropped" → "it is dying on
  * `too_short`, go look at the extractor"). Each micro-batch computes
  * the shared [[Curate.attributionCounts]] lanes (the SAME
  * tokenization/threshold path as the batch operator) and merges by
  * pure addition.
  *
  * STATE IS THE (src, 5 counters) LEDGER — the [[GateRateStream]]
  * surface with three more BIGINTs per source per batch. The
  * accumulated counts ARE the batch operator's aggregation state, so
  * batch N's snapshot equals [[Curate.gateAttribution]] over ALL
  * documents of batches 0..N — full snapshot equality through the
  * shared [[Curate.attributionOf]] kernel. Each batch overwrites the
  * source-sized snapshot; [[latest]] reads the highest batch. State
  * is APPEND-ONLY with the strict `batch_id < N` read rule:
  * at-least-once replay recomputes identical deltas and rewrites
  * identical partitions — exactly-once, no pointer file. Maintenance:
  * counts fold, attr snapshots prune
  * ([[StateMaintenance.TwinStateShapes]]).
  */
object GateAttributionStream {

  /** One micro-batch: gate, count per rule, accumulate, snapshot —
    * exposed for direct unit testing of the replay contract.
    */
  def applyBatch(statePath: String, srcCol: String, textCol: String,
                 qualityMin: Double, dupMax: Double)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val lanes = Seq("n_docs", "n_too_short", "n_low_quality",
      "n_repetitive", "n_passed")
    val delta = Curate.attributionCounts(batch, srcCol, textCol,
        qualityMin, dupMax)
      .localCheckpoint(false)

    val prior = DedupStream.readState(spark, s"$statePath/counts",
      delta, "src" +: lanes, batchId)
    val sums = lanes.map(l => sum(col(l)).as(l))
    val acc = prior.unionByName(delta)
      .groupBy(col("src"))
      .agg(sums.head, sums.tail: _*)
    val snapshot = Curate.attributionOf(acc)

    snapshot.write.mode("overwrite")
      .parquet(s"$statePath/attr/batch_id=$batchId")
    delta.write.mode("overwrite")
      .parquet(s"$statePath/counts/batch_id=$batchId")
  }

  /** The LATEST per-source attribution table. */
  def latest(spark: SparkSession, statePath: String): DataFrame =
    DedupStream.latestSnapshot(spark, s"$statePath/attr",
      Seq("src", "n_docs", "n_too_short", "n_low_quality",
        "n_repetitive", "n_failed", "fail_ppm"))

  /** Drain a streaming frame of (srcCol, textCol) documents into the
    * online attribution state under `statePath`.
    */
  def start(docs: DataFrame, statePath: String, srcCol: String,
            textCol: String, qualityMin: Double, dupMax: Double,
            checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining(
        "GateAttributionStream", statePath, checkpointDir,
        maintainEvery, maintainFilesPerFold)(
        applyBatch(statePath, srcCol, textCol, qualityMin, dupMax)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
