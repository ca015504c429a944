package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.CorpusStats

/** X104 in streaming form: ONLINE drift monitoring — the job PSI
  * exists for in production. A fixed REFERENCE snapshot's bucket
  * table is pinned once; the live stream accumulates its own bucket
  * counts batch by batch, and every batch snapshots the per-group PSI
  * of everything-seen-so-far against the reference.
  *
  * STATE IS THE PER-BATCH DELTA BUCKET TABLE: bucket counts are
  * additive exact integers ([[CorpusStats.tokenBuckets]], spec-pinned),
  * so each batch reduces to ≤ groups·nBuckets count rows — a pure
  * function of the batch — appended under `batch_id=N`. The snapshot
  * sums the state partitions and scores through the SAME
  * [[CorpusStats.psiFromBuckets]] estimator as the batch operator, so
  * every snapshot equals the batch operator run on (union of batches
  * 0..N) vs the reference — the family's point-in-time contract.
  * Text is never retained: state rows are (grp, bkt, c) integers.
  *
  * State is APPEND-ONLY and batchId-partitioned with the strict
  * `batch_id < N` read rule: at-least-once replay sees identical prior
  * counts and rewrites the identical delta partition — exactly-once,
  * no pointer file.
  */
object PsiDriftStream {

  /** Pin the reference snapshot's bucket table (run once per reference
    * version, before the stream starts).
    */
  def writeReference(reference: DataFrame, statePath: String,
                     grpCol: String, textCol: String, nBuckets: Int): Unit =
    CorpusStats.tokenBuckets(reference, grpCol, textCol, nBuckets)
      .write.mode("overwrite").parquet(s"$statePath/ref")

  def applyBatch(statePath: String, grpCol: String, textCol: String,
                 nBuckets: Int)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val delta = CorpusStats.tokenBuckets(batch, grpCol, textCol, nBuckets)
      .localCheckpoint(false)
    val prior = DedupStream.readState(spark, s"$statePath/cur", delta,
      Seq("grp", "bkt", "c"), batchId)
    val full = prior.unionByName(delta)
      .groupBy("grp", "bkt").agg(sum("c").as("c"))
    val ref = spark.read.parquet(s"$statePath/ref")
    CorpusStats.psiFromBuckets(full, ref, nBuckets)
      .write.mode("overwrite").parquet(s"$statePath/psi/batch_id=$batchId")
    delta.write.mode("overwrite")
      .parquet(s"$statePath/cur/batch_id=$batchId")
  }

  /** The LATEST per-group PSI snapshot. */
  def latest(spark: SparkSession, statePath: String): DataFrame = {
    DedupStream.latestSnapshot(spark, s"$statePath/psi", Seq.empty)
  }

  def start(docs: DataFrame, statePath: String, grpCol: String,
            textCol: String, nBuckets: Int,
            checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("PsiDriftStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, grpCol, textCol, nBuckets)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
