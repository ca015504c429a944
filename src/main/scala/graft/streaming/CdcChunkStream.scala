package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Multimodal

/** X49/X50 in streaming form: an ONLINE content-defined-chunk dedup
  * ledger over a growing blob corpus — the [[DedupStream]] pattern
  * applied to CDC chunk hashes (the shape of every dedup storage /
  * artifact-cache service: as objects arrive, chunk them, look each
  * chunk up, store only the new ones).
  *
  * Each micro-batch chunks its delta blobs ONCE
  * ([[Multimodal.cdcChunks]] — row-local, shift-resilient boundaries),
  * probes the appended chunk index for PRIOR copies of exactly the
  * delta's hashes (the corpus index contributes join work only where a
  * delta hash matches — probe-side build, per-batch cost scales with
  * the batch), and emits one LEDGER row per distinct delta chunk hash:
  * `(chunk_md5, clen, n_new_copies, n_new_docs, n_prior_copies)`.
  * `n_prior_copies > 0` is the cross-batch duplicate signal (the chunk
  * is already stored — reference it); `n_new_copies > 1` marks
  * intra-batch duplication. Accumulated ledgers reconstruct the batch
  * [[Multimodal.chunkDedup]] table exactly: every blob arrives once, so
  * summing `n_new_copies`/`n_new_docs` per hash over all batches equals
  * the batch-mode copy counts (spec-pinned).
  *
  * State is APPEND-ONLY and batchId-partitioned
  * (`state/{chunks,ledger}/batch_id=N`) with the strict `batch_id < N`
  * read rule: at-least-once replay collapses to exactly-once ledger
  * rows with no pointer file. A blob is chunked exactly once, ever.
  */
object CdcChunkStream {

  private val ChunkCols = Seq("chunk_idx", "start", "clen", "chunk_md5")

  def applyBatch(statePath: String, idCol: String, blobCol: String,
                 kb: Int, hexZeros: Int)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // chunked exactly once: these rows feed BOTH the probe and the append
    val deltaChunks = Multimodal.cdcChunks(
      batch.select(col(idCol), col(blobCol)), idCol, blobCol, kb, hexZeros)
    val corpus = DedupStream.readState(spark, s"$statePath/chunks",
      deltaChunks, idCol +: ChunkCols, batchId)
    val deltaHashes = deltaChunks.select(col("chunk_md5")).distinct()
    // prior copies of ONLY the probed hashes (semi-join prune first, so
    // the index aggregate is delta-hash-sized, never corpus-sized)
    val prior = corpus.join(deltaHashes, Seq("chunk_md5"), "left_semi")
      .groupBy(col("chunk_md5")).agg(count(lit(1)).as("n_prior_copies"))
    val ledger = deltaChunks.groupBy(col("chunk_md5"))
      .agg(max(col("clen")).as("clen"),
        count(lit(1)).as("n_new_copies"),
        countDistinct(col(idCol)).as("n_new_docs"))
      .join(prior, Seq("chunk_md5"), "left")
      .select(col("chunk_md5"), col("clen"), col("n_new_copies"),
        col("n_new_docs"),
        coalesce(col("n_prior_copies"), lit(0L)).as("n_prior_copies"))
    ledger.write.mode("overwrite")
      .parquet(s"$statePath/ledger/batch_id=$batchId")
    deltaChunks.write.mode("overwrite")
      .parquet(s"$statePath/chunks/batch_id=$batchId")
  }

  /** All chunk rows appended so far. */
  def chunks(spark: SparkSession, statePath: String, idCol: String): DataFrame =
    StateMaintenance.stableRead(spark, s"$statePath/chunks")
      .select((idCol +: ChunkCols).map(col): _*)

  /** All ledger rows emitted so far. */
  def ledger(spark: SparkSession, statePath: String): DataFrame =
    StateMaintenance.stableRead(spark, s"$statePath/ledger")
      .select("chunk_md5", "clen", "n_new_copies", "n_new_docs",
        "n_prior_copies")

  /** Drain a streaming frame of (idCol, blobCol) rows into the online
    * chunk-dedup state under `statePath`.
    */
  def start(blobs: DataFrame, statePath: String, idCol: String,
            blobCol: String, checkpointDir: String, kb: Int = 8,
            hexZeros: Int = 1,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    blobs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("CdcChunkStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, idCol, blobCol, kb, hexZeros)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
