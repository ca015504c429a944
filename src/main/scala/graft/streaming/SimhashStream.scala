package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Dedup

/** X79 in streaming form: ONLINE SimHash near-dup detection — each
  * arriving batch is signed once, probed against the accumulated banded
  * index (plus itself), and appended; every within-distance pair emits
  * EXACTLY ONCE, in the batch its later member arrives — the
  * [[DedupStream]] incremental-LSH contract with Hamming bands in
  * place of MinHash bands.
  *
  * STATE IS THE BANDED SIGNATURE INDEX, NOT THE TEXT: (id, simhash,
  * band, key) — maxDist+1 rows of three BIGINTs per document
  * regardless of document size, the x79 compression. Unlike
  * [[DedupStream]] (whose Jaccard verify needs the stored text), the
  * Hamming verify is one XOR+popcount on the signatures the index
  * already carries, so text is never retained. State is APPEND-ONLY
  * and batchId-partitioned with the strict `batch_id < N` read rule:
  * at-least-once replay sees the identical prior index and rewrites
  * identical partitions — exactly-once, no pointer file.
  *
  * Documents too short to shingle (< n tokens) produce no signature
  * and are invisible to the gate — the batch operator's contract.
  */
object SimhashStream {

  def applyBatch(statePath: String, idCol: String, textCol: String,
                 n: Int, maxDist: Int)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // distinct: an at-least-once source may duplicate a row in-batch
    val delta = batch.select(col(idCol), col(textCol)).distinct()
    val deltaBands = Dedup.hammingBands(
        Dedup.simhash64(Dedup.shingleTable(delta, idCol, textCol, n), idCol),
        idCol, maxDist)
      .localCheckpoint(false)
    val prior = DedupStream.readState(spark, s"$statePath/bands",
      deltaBands, Seq(idCol, "simhash", "band", "key"), batchId)
    val pairs = Dedup.hammingPairsBetween(deltaBands,
      prior.unionByName(deltaBands), idCol, maxDist)
    pairs.write.mode("overwrite")
      .parquet(s"$statePath/pairs/batch_id=$batchId")
    deltaBands.write.mode("overwrite")
      .parquet(s"$statePath/bands/batch_id=$batchId")
  }

  /** All pairs emitted so far (d1, d2, dist). */
  def pairs(spark: SparkSession, statePath: String): DataFrame =
    StateMaintenance.stableRead(spark, s"$statePath/pairs").select("d1", "d2", "dist")

  /** Drain a streaming frame of (idCol, textCol) documents into the
    * online near-dup state under `statePath`.
    */
  def start(docs: DataFrame, statePath: String, idCol: String,
            textCol: String, checkpointDir: String, n: Int = 3,
            maxDist: Int = 3,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("SimhashStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, idCol, textCol, n, maxDist)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
