package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** X138 in streaming form: ONLINE corpus-composition concentration —
  * the ingest-balance alarm ("one source started dominating the feed:
  * HHI and top-share just jumped"). Each micro-batch appends its
  * per-source doc-count deltas; counts merge by pure addition.
  *
  * SNAPSHOT CONTRACT (the [[UnigramKlStream]] shape): batch N's 1-row
  * snapshot equals [[graft.ops.Report.sourceConcentration]] over ALL
  * documents of batches 0..N — full snapshot equality through the
  * shared [[graft.ops.Report.concentrationOf]] kernel. Each batch
  * overwrites the 1-ROW snapshot (the smallest snapshot surface of any
  * twin); [[latest]] reads the highest batch. State is APPEND-ONLY
  * with the strict `batch_id < N` read rule: at-least-once replay
  * recomputes identical deltas and rewrites identical partitions —
  * exactly-once, no pointer file. Maintenance: counts fold, conc
  * snapshots prune ([[StateMaintenance.TwinStateShapes]]).
  */
object ConcentrationStream {

  def applyBatch(statePath: String, sourceCol: String)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val delta = batch.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).as("src")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val prior = DedupStream.readState(spark, s"$statePath/counts",
      delta, Seq("src", "c"), batchId)
    val acc = prior.unionByName(delta)
      .groupBy(col("src")).agg(sum(col("c")).as("c"))
      .localCheckpoint(false) // K rows; three folds + the pair join
    val snapshot = graft.ops.Report.concentrationOf(acc)

    snapshot.write.mode("overwrite")
      .parquet(s"$statePath/conc/batch_id=$batchId")
    delta.write.mode("overwrite")
      .parquet(s"$statePath/counts/batch_id=$batchId")
  }

  /** The LATEST 1-row concentration snapshot. */
  def latest(spark: SparkSession, statePath: String): DataFrame =
    DedupStream.latestSnapshot(spark, s"$statePath/conc",
      Seq("n_sources", "n_docs", "hhi_ppm", "gini_ppm", "top_share_ppm"))

  /** Drain a streaming frame carrying `sourceCol` into the online
    * concentration state under `statePath`.
    */
  def start(docs: DataFrame, statePath: String, sourceCol: String,
            checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("ConcentrationStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, sourceCol)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
