package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** X83 in streaming form: ONLINE per-group cardinality over an
  * unbounded stream with BOUNDED state — the textbook job for a
  * cardinality sketch, because the exact answer's state (every distinct
  * value ever seen) grows without bound while the sketch's is capped at
  * m buckets per group forever.
  *
  * STATE IS THE FILLED-BUCKET SET: per batch, each value hashes to its
  * md5-prefix bucket row-locally ([[graft.ops.Sketch]]'s string lane)
  * and only the batch's NOVEL (grp, pos) pairs append
  * (anti-join against the prior set — the [[DecontaminateStream]]
  * novelty discipline), so state is ≤ groups·m short strings at any
  * stream length. Linear counting is MERGE-ONLY (bucket sets union
  * monotonically), which is exactly why it streams.
  *
  * POINT-IN-TIME CONTRACT: batch N emits, per group seen so far, the
  * filled count and estimate over batches 0..N — equal to the batch
  * operator's (filled, est) columns on the union of those batches. The
  * batch operator's `n_exact` audit column deliberately does NOT
  * stream: it IS the unbounded-state exact baseline the sketch exists
  * to replace. State is APPEND-ONLY and batchId-partitioned with the
  * strict `batch_id < N` read rule: at-least-once replay sees the
  * identical prior buckets and rewrites identical partitions —
  * exactly-once, no pointer file.
  */
object CardinalityStream {

  def applyBatch(statePath: String, groupCol: String, valueCol: String,
                 hexDigits: Int)
                (batch: DataFrame, batchId: Long): Unit = {
    require(hexDigits >= 1 && hexDigits <= 6,
      s"hexDigits $hexDigits out of [1, 6]")
    val m = math.pow(16, hexDigits).toLong
    val spark = batch.sparkSession
    // null VALUES drop (the batch operator's countDistinct ignores them
    // too — md5(null) is null); null GROUPS are legitimate, so the
    // novelty anti-join below is NULL-SAFE on grp (a plain equi
    // anti-join would re-append a null-group bucket every batch,
    // growing state and inflating filled monotonically)
    val delta = batch
      .select(col(groupCol).as("grp"),
        substring(md5(col(valueCol)), 1, hexDigits).as("pos"))
      .filter(col("pos").isNotNull)
      .distinct()
    val prior = DedupStream.readState(spark, s"$statePath/buckets",
      delta, Seq("grp", "pos"), batchId)
    val novel = delta.join(prior,
        delta("grp") <=> prior("grp") && delta("pos") === prior("pos"),
        "left_anti")
      .localCheckpoint(false)
    val est = graft.ops.Sketch.estExpr(m)
    val scores = prior.unionByName(novel)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("filled")) // prior ∪ novel is disjoint-distinct
      .select(col("grp"), col("filled"), expr(est).as("est"))
    scores.write.mode("overwrite")
      .parquet(s"$statePath/card/batch_id=$batchId")
    novel.write.mode("overwrite")
      .parquet(s"$statePath/buckets/batch_id=$batchId")
  }

  /** The LATEST per-group estimates: each batch rewrites the full
    * (grp, filled, est) snapshot, so read the highest batch partition.
    */
  def latest(spark: SparkSession, statePath: String): DataFrame =
    DedupStream.latestSnapshot(spark, s"$statePath/card",
      Seq("grp", "filled", "est"))

  /** Drain a streaming frame of (groupCol, valueCol) rows into the
    * online cardinality state under `statePath`.
    */
  def start(rows: DataFrame, statePath: String, groupCol: String,
            valueCol: String, hexDigits: Int,
            checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    rows.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("CardinalityStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, groupCol, valueCol, hexDigits)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
