package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.UniMax

/** X66 in streaming form: an ONLINE language-budget allocator — as
  * documents arrive, per-language token totals accumulate and the
  * UniMax waterfilling allocation over everything-seen-so-far is
  * re-emitted after every batch. This is the monitoring shape a
  * multilingual collection run needs ("given what we have ingested,
  * what would each language's share of the budget be?"), and because
  * an allocation is a PURE FUNCTION of the cumulative counts, the
  * streaming contract is exact rather than point-in-time: after ANY
  * batch, the emitted table equals [[UniMax.allocate]] applied to the
  * union of all arrived batches (spec-pinned for one batch and across
  * batches).
  *
  * Per-batch cost: the batch's own map-side-combined groupBy(lang)
  * count, one read of the language ledger (O(batches × languages)
  * rows, never the corpus), and the language-sized waterfilling
  * window. State is APPEND-ONLY and batchId-partitioned
  * (`state/counts/batch_id=N`), so replay reads the identical prior
  * counts and rewrites identical partitions — exactly-once ledger
  * growth with no pointer file. The allocation table itself is
  * likewise versioned (`state/alloc/batch_id=N`): every batch's
  * snapshot is kept, making the allocation history queryable (the
  * [[MonitorStream]] gauge discipline).
  */
object UniMaxStream {

  def applyBatch(statePath: String, langCol: String, textCol: String,
                 budgetTokens: Long, maxEpochs: Long)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val countsLike = spark.range(0).select(lit("").as(langCol),
      lit(0L).as("lang_tokens"))
    // this batch's per-language tokens -> its ledger partition
    UniMax.tokenCounts(batch, langCol, textCol)
      .write.mode("overwrite")
      .parquet(s"$statePath/counts/batch_id=$batchId")
    // cumulative counts: prior partitions (replay-safe: own batch_id
    // excluded) + the just-written one, re-read so the batch pipeline
    // executes exactly once
    val cumulative = DedupStream.readState(spark, s"$statePath/counts",
        countsLike, Seq(langCol, "lang_tokens"), batchId)
      .unionByName(spark.read
        .parquet(s"$statePath/counts/batch_id=$batchId")
        .select(col(langCol), col("lang_tokens")))
      .groupBy(col(langCol))
      .agg(sum(col("lang_tokens")).as("lang_tokens"))
    UniMax.allocate(cumulative, langCol, budgetTokens, maxEpochs)
      .write.mode("overwrite")
      .parquet(s"$statePath/alloc/batch_id=$batchId")
  }

  /** The allocation as of batch `batchId` (default: the latest).
    *
    * Point-in-time reads fail LOUDLY when the requested version was
    * retired by [[StateMaintenance.pruneSnapshots]] (alloc is a prune
    * dir in [[StateMaintenance.TwinStateShapes]] — the
    * [[CdcApplyStream]] retention contract): an empty frame here would
    * silently sample nothing downstream.
    */
  def allocation(spark: SparkSession, statePath: String,
                 batchId: Option[Long] = None): DataFrame = {
    batchId.foreach { v =>
      // isDir resolves the path's OWN filesystem (file/hdfs/s3a), so a
      // remote state root probes the remote store, never a local shadow
      require(StateMaintenance.isDir(s"$statePath/alloc/batch_id=$v"),
        s"UniMaxStream.allocation: version $v does not exist under " +
          s"$statePath/alloc — it was never written or was pruned by " +
          "state maintenance (retention keeps only versions >= the " +
          "prune watermark)")
    }
    val all = StateMaintenance.stableRead(spark, s"$statePath/alloc")
    val at: Long = batchId.getOrElse(
      all.agg(max(col("batch_id").cast("long"))).head().getLong(0))
    all.filter(col("batch_id").cast("long") === at).drop("batch_id")
  }

  def start(docs: DataFrame, statePath: String, langCol: String,
            textCol: String, checkpointDir: String, budgetTokens: Long,
            maxEpochs: Long,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("UniMaxStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, langCol, textCol, budgetTokens,
        maxEpochs)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
