package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Dedup

/** X139 in streaming form: ONLINE per-source near-dup participation —
  * the ingest-balance alarm beside [[ConcentrationStream]] ("this
  * source just started self-copying": its dup_ppm jumps while the
  * composition row stays flat). Each micro-batch rides the FULL
  * [[DedupStream]] machinery — probe the persisted LSH band index,
  * emit the verified pairs this batch introduces, append docs + bands
  * — plus one source-ledger delta, then snapshots the per-source
  * participation table from everything accumulated.
  *
  * SNAPSHOT CONTRACT (the [[KeynessStream]] shape): batch N's snapshot
  * equals [[Dedup.sourceDupRate]] over ALL documents of batches 0..N
  * with the pairs the batch operator would find on that union — the
  * [[DedupStream]] incremental-pairs equivalence carries the claim
  * (spec-pinned per batch). The kernel is SHARED: the snapshot calls
  * `Dedup.sourceDupRate` itself, so the batch and streaming seams
  * cannot drift.
  *
  * STATE: `docs/ bands/ pairs/` are the [[DedupStream]] tables
  * (append-only, batchId-partitioned, strict `batch_id < N` reads,
  * overwrite-own-partition writes — at-least-once replay rewrites
  * identical partitions, exactly-once without a pointer file);
  * `src/` appends each batch's (id, source) rows — per-batch cost for
  * the snapshot is the accumulated pair table (duplicate-density-
  * sized, never raw stream volume) joined against the corpus-sized
  * src ledger, the batch kernel's own shape. `dup/` holds the
  * overwritten snapshot; [[latest]] reads the highest batch.
  * Maintenance: the four delta dirs fold, dup prunes
  * ([[StateMaintenance.TwinStateShapes]]).
  */
object SourceDupStream {

  def applyBatch(statePath: String, idCol: String, textCol: String,
                 srcCol: String, numSigs: Int = 16, rowsPerBand: Int = 4,
                 threshold: Double = 0.8)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // probe + pair emission + index append — the DedupStream step
    // verbatim (same state layout, same replay rule)
    DedupStream.applyBatch(statePath, idCol, textCol, numSigs,
      rowsPerBand, threshold)(batch.select(col(idCol), col(textCol)),
      batchId)
    // the source ledger delta (null sources keep their row here — the
    // kernel applies the x131 null rule itself, one seam)
    batch.select(col(idCol), col(srcCol).as("src")).write
      .mode("overwrite").parquet(s"$statePath/src/batch_id=$batchId")

    // accumulate THROUGH batch N: prior partitions (strict < N,
    // replay-safe) + the just-written ones re-read back (the
    // UniMaxStream discipline — each batch pipeline executes once)
    def through(dir: String, like: DataFrame,
                cols: Seq[String]): DataFrame =
      DedupStream.readState(spark, s"$statePath/$dir", like, cols,
          batchId)
        .unionByName(spark.read
          .parquet(s"$statePath/$dir/batch_id=$batchId")
          .select(cols.map(col): _*))
    val docsAll = through("src",
      batch.select(col(idCol), col(srcCol).as("src")), Seq(idCol, "src"))
    // empty-pairs schema derives d1/d2 from the id column's OWN type:
    // pair partitions carry whatever type idCol has, and a hardcoded
    // LongType would silently widen (bigint vs string) or fail at
    // runtime on the union for non-long ids
    val pairsLike = batch
      .select(col(idCol).as("d1"), col(idCol).as("d2")).limit(0)
    val pairsAll = through("pairs", pairsLike, Seq("d1", "d2"))

    Dedup.sourceDupRate(docsAll, pairsAll, idCol, "src")
      .write.mode("overwrite")
      .parquet(s"$statePath/dup/batch_id=$batchId")
  }

  /** The LATEST per-source participation snapshot
    * (src, n_docs, n_dup_docs, dup_ppm).
    */
  def latest(spark: SparkSession, statePath: String): DataFrame =
    DedupStream.latestSnapshot(spark, s"$statePath/dup",
      Seq("src", "n_docs", "n_dup_docs", "dup_ppm"))

  /** Drain a streaming frame of (idCol, textCol, srcCol) documents
    * into the online participation state under `statePath`.
    */
  def start(docs: DataFrame, statePath: String, idCol: String,
            textCol: String, srcCol: String, checkpointDir: String,
            numSigs: Int = 16, rowsPerBand: Int = 4,
            threshold: Double = 0.8,
            maintainEvery: Int = 0,
            // docs/ and src/ are retained-corpus-sized: keep the fold
            // write and later snapshot scans parallel (the CurateStream
            // default, not the sliver-state 1)
            maintainFilesPerFold: Int = 32): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("SourceDupStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, idCol, textCol, srcCol, numSigs,
          rowsPerBand, threshold)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
