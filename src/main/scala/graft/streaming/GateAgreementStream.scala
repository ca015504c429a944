package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Agreement

/** X154 in streaming form: ONLINE inter-gate agreement — the live
  * answer to "is the quality gate still doing (part of) the PII
  * audit's work on this feed?" beside [[GateAttributionStream]]'s
  * per-rule alarm. Each micro-batch rates its documents through the
  * shared [[Agreement.agreementCounts]] lanes (the SAME signal paths
  * as the batch operator) and merges by pure addition — the
  * contingency cells are counts, so disjoint batches add.
  *
  * STATE IS THE (src, 4 contingency counters) LEDGER — the
  * [[GateAttributionStream]] surface with the second rater's lanes.
  * The accumulated counts ARE the batch operator's aggregation state,
  * so batch N's snapshot equals [[Agreement.gatePiiAgreement]] over
  * ALL documents of batches 0..N — full snapshot equality through the
  * shared [[Agreement.agreementOf]] projection (kappa, McNemar, and
  * the ppm lanes are all derived, never accumulated). State is
  * APPEND-ONLY with the strict `batch_id < N` read rule:
  * at-least-once replay recomputes identical deltas and rewrites
  * identical partitions — exactly-once, no pointer file. Maintenance:
  * counts fold, agree snapshots prune
  * ([[StateMaintenance.TwinStateShapes]]).
  */
object GateAgreementStream {

  private val Lanes = Seq("n_docs", "n_a_pass", "n_b_pass", "n_both")

  /** One micro-batch: rate both gates, count cells, accumulate,
    * snapshot — exposed for direct unit testing of the replay
    * contract.
    */
  def applyBatch(statePath: String, srcCol: String, textCol: String,
                 augCol: String, qualityMin: Double, dupMax: Double)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val delta = Agreement.agreementCounts(batch, srcCol, textCol,
        augCol, qualityMin, dupMax)
      .localCheckpoint(false)
    val prior = DedupStream.readState(spark, s"$statePath/counts",
      delta, "src" +: Lanes, batchId)
    val sums = Lanes.map(l => sum(col(l)).as(l))
    val acc = prior.unionByName(delta)
      .groupBy(col("src"))
      .agg(sums.head, sums.tail: _*)
    val snapshot = Agreement.agreementOf(acc)

    snapshot.write.mode("overwrite")
      .parquet(s"$statePath/agree/batch_id=$batchId")
    delta.write.mode("overwrite")
      .parquet(s"$statePath/counts/batch_id=$batchId")
  }

  /** The LATEST per-source agreement table (cells + po/pe ppm +
    * kappa_micro + mcnemar_micro).
    */
  def latest(spark: SparkSession, statePath: String): DataFrame =
    DedupStream.latestSnapshot(spark, s"$statePath/agree",
      Seq("src", "n_docs", "n_a_pass", "n_b_pass", "n_both",
        "n_only_a", "n_only_b", "po_ppm", "pe_ppm", "kappa_micro",
        "mcnemar_micro"))

  /** Drain a streaming frame of (srcCol, textCol, augCol) documents
    * into the online agreement state under `statePath`.
    */
  def start(docs: DataFrame, statePath: String, srcCol: String,
            textCol: String, augCol: String, qualityMin: Double,
            dupMax: Double, checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining(
        "GateAgreementStream", statePath, checkpointDir,
        maintainEvery, maintainFilesPerFold)(
        applyBatch(statePath, srcCol, textCol, augCol, qualityMin,
          dupMax)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
