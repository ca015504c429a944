package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Curate

/** X133 in streaming form: ONLINE Wilson-bounded gate pass-rate
  * monitoring — the data-quality face of a live feed ("source X's
  * pass rate just dropped, and the interval says it's not noise").
  * Each micro-batch computes the [[Curate.gateSignals]] projection
  * (the SAME one the batch flagship and [[CurateStream]] use), counts
  * per-group (n, n_hit), and merges by pure addition.
  *
  * STATE IS THE (group, n, n_hit) COUNT LEDGER: per batch, the
  * group-grain counts append as a DELTA partition — two BIGINTs per
  * group per batch, the smallest state surface of any twin. The
  * accumulated counts ARE the batch operator's aggregation state, so
  * batch N's snapshot equals [[graft.ops.Eval.wilsonRates]] over ALL
  * documents of batches 0..N — full snapshot equality through the
  * shared [[graft.ops.Eval.wilsonOf]] kernel (one parenthesization of
  * the interval math, so the double seams cannot diverge). Each batch
  * overwrites the group-sized snapshot; [[latest]] reads the highest
  * batch. State is APPEND-ONLY with the strict `batch_id < N` read
  * rule: at-least-once replay recomputes identical deltas and
  * rewrites identical partitions — exactly-once, no pointer file.
  * Maintenance: counts fold via [[StateMaintenance.compactState]],
  * rate snapshots prune via [[StateMaintenance.pruneSnapshots]]
  * (registered in [[StateMaintenance.TwinStateShapes]]).
  */
object GateRateStream {

  /** One micro-batch: gate, count, accumulate, snapshot — exposed for
    * direct unit testing of the replay contract.
    */
  def applyBatch(statePath: String, grpCol: String, textCol: String,
                 qualityMin: Double, dupMax: Double, z: Double = 1.96)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val delta = Curate.gateSignals(
        batch.select(col(grpCol).as("grp"), col(textCol)), textCol)
      .withColumn("hit",
        Curate.gatePass(qualityMin, dupMax).cast("long"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("hit")).as("n_hit"))
      .localCheckpoint(false)

    val prior = DedupStream.readState(spark, s"$statePath/counts",
      delta, Seq("grp", "n", "n_hit"), batchId)
    val acc = prior.unionByName(delta)
      .groupBy(col("grp"))
      .agg(sum(col("n")).as("n"), sum(col("n_hit")).as("n_hit"))
    val snapshot = graft.ops.Eval.wilsonOf(acc, z)

    snapshot.write.mode("overwrite")
      .parquet(s"$statePath/rates/batch_id=$batchId")
    delta.write.mode("overwrite")
      .parquet(s"$statePath/counts/batch_id=$batchId")
  }

  /** The LATEST per-group rate table with Wilson bounds. */
  def latest(spark: SparkSession, statePath: String): DataFrame =
    DedupStream.latestSnapshot(spark, s"$statePath/rates",
      Seq("grp", "n", "n_hit", "rate", "lo", "hi"))

  /** Drain a streaming frame of (grpCol, textCol) documents into the
    * online rate state under `statePath`.
    */
  def start(docs: DataFrame, statePath: String, grpCol: String,
            textCol: String, qualityMin: Double, dupMax: Double,
            checkpointDir: String, z: Double = 1.96,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("GateRateStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, grpCol, textCol, qualityMin,
        dupMax, z)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
