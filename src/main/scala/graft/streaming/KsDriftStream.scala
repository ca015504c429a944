package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** X137 in streaming form: ONLINE per-group KS drift against the
  * accumulated pool — the bin-free sibling of [[PsiDriftStream]] ("is
  * source X's length distribution walking away from the corpus, and at
  * which value?"). Each micro-batch appends its (grp, v) value-count
  * deltas; counts merge by pure addition, and the pool marginal folds
  * from the one accumulated table.
  *
  * SNAPSHOT CONTRACT (the [[UnigramKlStream]] shape): batch N's
  * snapshot equals [[graft.ops.CorpusStats.ksDrift]] over ALL rows of
  * batches 0..N — full snapshot equality through the shared
  * [[graft.ops.CorpusStats.ksOf]] kernel. Each batch overwrites the
  * group-sized snapshot; [[latest]] reads the highest batch. State is
  * APPEND-ONLY with the strict `batch_id < N` read rule: at-least-once
  * replay recomputes identical deltas and rewrites identical
  * partitions — exactly-once, no pointer file. Maintenance: counts
  * fold, ks snapshots prune ([[StateMaintenance.TwinStateShapes]]).
  */
object KsDriftStream {

  def applyBatch(statePath: String, grpCol: String, valCol: String)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val delta = graft.ops.CorpusStats
      .groupValueCounts(batch, grpCol, valCol)
      .localCheckpoint(false)
    val prior = DedupStream.readState(spark, s"$statePath/counts",
      delta, Seq("grp", "v", "c"), batchId)
    val acc = prior.unionByName(delta)
      .groupBy(col("grp"), col("v")).agg(sum(col("c")).as("c"))
      .localCheckpoint(false) // pool fold + grid + totals
    val snapshot = graft.ops.CorpusStats.ksOf(acc)

    snapshot.write.mode("overwrite")
      .parquet(s"$statePath/ks/batch_id=$batchId")
    delta.write.mode("overwrite")
      .parquet(s"$statePath/counts/batch_id=$batchId")
  }

  /** The LATEST drift snapshot: one row per group. */
  def latest(spark: SparkSession, statePath: String): DataFrame =
    DedupStream.latestSnapshot(spark, s"$statePath/ks",
      Seq("grp", "n", "d_ppm", "at_val"))

  /** Drain a streaming frame of (grpCol, valCol) rows into the online
    * drift state under `statePath`.
    */
  def start(rows: DataFrame, statePath: String, grpCol: String,
            valCol: String, checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    rows.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("KsDriftStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, grpCol, valCol)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
