package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Sample

/** X57 in streaming form: an ONLINE token-budget admission controller —
  * documents arrive in batches and are admitted until the corpus-wide
  * token budget fills, the shape of a training-data collection service
  * ("keep ingesting until we have N tokens").
  *
  * Admission order is POINT-IN-TIME (the [[SubstringStream]] cap
  * contract): batches are admitted in ARRIVAL order, each batch
  * internally in the same deterministic md5 order as
  * [[Sample.tokenBudget]] — so a single batch reproduces the batch
  * operator exactly (spec-pinned), while across batches the stream
  * spends budget on what arrived first instead of re-ranking history
  * (admitted documents are never retracted). The greedy-prefix
  * guarantee survives: cumulative admitted tokens before each admitted
  * document stay under the budget, the budget-crossing document is
  * admitted, and everything after it is refused — including in all
  * later batches, which see a spent budget.
  *
  * Per-batch cost is the batch's own two-pass prefix sum plus ONE
  * 1-row read of the spent ledger (`batch_id < N` sums — O(batches)
  * rows, never the admitted corpus). State is APPEND-ONLY and
  * batchId-partitioned (`state/{admitted,spent}/batch_id=N`): replay
  * reads the identical prior spend and rewrites identical partitions —
  * exactly-once admission with no pointer file.
  */
object TokenBudgetStream {

  def applyBatch(statePath: String, idCol: String, textCol: String,
                 budgetTokens: Long, seed: String)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // prior spend: one tiny sum over the per-batch ledger
    val spentLike = spark.range(0).select(lit(0L).as("spent"))
    val prior = DedupStream.readState(spark, s"$statePath/spent",
      spentLike, Seq("spent"), batchId)
      .agg(coalesce(sum(col("spent")), lit(0L)).as("prior_spent"))
    // the batch's internal prefix (same order and decomposition as the
    // batch operator), shifted by the prior spend; cum_before counts
    // ADMITTED tokens only once the filter applies, and since admission
    // is a prefix of the batch order, the shifted prefix IS the global
    // admitted-cumulative for every admitted row
    val admitted = Sample.tokenBudget(batch, idCol, textCol,
        budgetTokens = Long.MaxValue, seed = seed)
      .crossJoin(broadcast(prior))
      .select(col(idCol), col("n_tokens"),
        (col("cum_before") + col("prior_spent")).as("cum_before"))
      .filter(col("cum_before") < budgetTokens)
    admitted.write.mode("overwrite")
      .parquet(s"$statePath/admitted/batch_id=$batchId")
    // this batch's spend ledger row (0 if nothing admitted) — summed
    // from the JUST-WRITTEN partition, so the prefix pipeline executes
    // exactly once per batch instead of once per action
    spark.read.parquet(s"$statePath/admitted/batch_id=$batchId")
      .agg(coalesce(sum(col("n_tokens")), lit(0L)).as("spent"))
      .write.mode("overwrite")
      .parquet(s"$statePath/spent/batch_id=$batchId")
  }

  /** All admitted rows so far: (idCol, n_tokens, cum_before). */
  def admitted(spark: SparkSession, statePath: String,
               idCol: String): DataFrame =
    StateMaintenance.stableRead(spark, s"$statePath/admitted")
      .select(col(idCol), col("n_tokens"), col("cum_before"))

  def start(docs: DataFrame, statePath: String, idCol: String,
            textCol: String, checkpointDir: String, budgetTokens: Long,
            seed: String = "",
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("TokenBudgetStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, idCol, textCol, budgetTokens,
        seed)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
