package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Dedup

/** X30 in streaming form: ONLINE near-dup detection over a growing
  * corpus. Each micro-batch of new documents probes the persisted LSH
  * band index of everything seen before, emits the verified near-dup
  * pairs it introduces (batch-vs-corpus and batch-vs-batch), then
  * APPENDS its own band rows and documents to the index — the corpus is
  * hashed exactly once, ever, no matter how many batches follow
  * ([[Dedup.incrementalLshPairsIndexed]]).
  *
  * State layout is APPEND-ONLY and batchId-partitioned:
  * `state/{docs,bands,pairs}/batch_id=N/`. A batch reads strictly
  * `batch_id < N` and overwrites its own partition, so a replayed batch
  * sees exactly the same inputs and rewrites the same outputs —
  * at-least-once delivery collapses to exactly-once pairs without any
  * pointer file (the partition filter IS the isolation). At 100 TB this
  * is the standard dedup-service shape: the band index is a partitioned
  * table that only ever gains partitions, and per-batch cost scales
  * with the batch, never the corpus.
  */
object DedupStream {

  /** The max-batch_id snapshot read shared by the snapshot-semantics
    * twins (Bleu/Cardinality/CountMin/Hll/Kmv/Psi/Quantile/Burstiness/
    * UnigramKl): each batch overwrites its full snapshot partition, so
    * the LATEST state is the highest batch_id. Empty `cols` keeps
    * every column except batch_id. Partition-column type inference may
    * read batch_id as int, and a stream whose batches were all empty
    * has 0-row snapshots — max() is then null and the answer is the
    * empty frame, not an NPE.
    */
  private[streaming] def latestSnapshot(spark: SparkSession, dir: String,
                                        cols: Seq[String]): DataFrame = {
    // the shared external-accessor entry point: route through the
    // maintenance-race-absorbing read (marker wait + FNF retry +
    // relation-scoped ignoreMissingFiles). In-batch callers pay two
    // existence probes and never wait (no fold runs mid-batch).
    val all = StateMaintenance.stableRead(spark, dir)
    def shape(df: DataFrame): DataFrame =
      if (cols.isEmpty) df.drop("batch_id")
      else df.select(cols.map(col): _*)
    val row = all.agg(max(col("batch_id").cast("long"))).collect()(0)
    if (row.isNullAt(0)) shape(all).limit(0)
    else shape(all.filter(col("batch_id").cast("long") === row.getLong(0)))
  }

  private[streaming] def readState(spark: SparkSession, dir: String,
                                   like: DataFrame, cols: Seq[String],
                                   batchId: Long): DataFrame = {
    // the existence probe goes through the path's OWN filesystem (the
    // StateMaintenance resolution): a local-only probe on an hdfs://
    // or s3a:// state root would return false forever and every batch
    // would silently accumulate against an empty prior
    val hasData = {
      val (fs, p) = StateMaintenance.fsRoot(dir)
      fs.exists(p) && fs.listStatus(p)
        .exists(_.getPath.getName.startsWith("batch_id="))
    }
    if (!hasData) like.select(cols.map(col): _*).limit(0)
    else spark.read.parquet(dir)
      .filter(col("batch_id") < batchId) // replayed own data excluded
      .select(cols.map(col): _*)
  }

  /** One micro-batch: probe, emit pairs, append to the index — exposed
    * for direct unit testing of the replay contract.
    */
  def applyBatch(statePath: String, idCol: String, textCol: String,
                 numSigs: Int, rowsPerBand: Int, threshold: Double)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val delta = batch.select(col(idCol), col(textCol))
    val corpus = readState(spark, s"$statePath/docs", delta,
      Seq(idCol, textCol), batchId)
    // the batch is hashed exactly once: these bands feed BOTH the probe
    // and the index append
    val deltaBands = Dedup.bandRows(
      Dedup.docSignatures(delta, idCol, textCol, numSigs),
      idCol, numSigs, rowsPerBand)
    val corpusBands = readState(spark, s"$statePath/bands", deltaBands,
      Seq(idCol, "band_id", "key"), batchId)
    val pairs = Dedup.incrementalLshPairsIndexed(delta, deltaBands,
      corpus, corpusBands, idCol, textCol, threshold)
    pairs.write.mode("overwrite")
      .parquet(s"$statePath/pairs/batch_id=$batchId")
    delta.write.mode("overwrite").parquet(s"$statePath/docs/batch_id=$batchId")
    deltaBands.write.mode("overwrite")
      .parquet(s"$statePath/bands/batch_id=$batchId")
  }

  /** All pairs emitted so far (d1, d2, jac). */
  def pairs(spark: SparkSession, statePath: String): DataFrame =
    StateMaintenance.stableRead(spark, s"$statePath/pairs").select("d1", "d2", "jac")

  /** Drain a streaming frame of (idCol, textCol) documents into the
    * online dedup state under `statePath`.
    */
  def start(docs: DataFrame, statePath: String, idCol: String, textCol: String,
            checkpointDir: String, numSigs: Int = 16, rowsPerBand: Int = 4,
            threshold: Double = 0.8,
            maintainEvery: Int = 0,
            // docs/ is retained-corpus-sized: a 1-file fold would both
            // serialize the fold write and strip later probe scans of
            // their split parallelism (the CurateStream default)
            maintainFilesPerFold: Int = 32): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("DedupStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, idCol, textCol, numSigs, rowsPerBand, threshold)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
