package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.CountMin

/** X89 in streaming form: ONLINE frequency monitoring of a fixed watch
  * list over an unbounded token stream with BOUNDED state — the job
  * Count-Min was invented for (Cormode & Muthukrishnan 2005 frame it
  * as the streaming model), because exact per-token counting needs
  * vocabulary-sized state while the sketch's is depth × 16^hexDigits
  * counters forever.
  *
  * STATE IS THE PER-BATCH DELTA SKETCH: each batch reduces to its own
  * (lane, bucket, cnt) counter table — a pure function of the batch,
  * ≤ depth·16^k rows — appended under `batch_id=N`. Counters are
  * additive ([[graft.ops.CountMin]]'s merge law, spec-pinned), so the
  * stream-wide sketch at batch N is one sum over the state partitions,
  * and the per-batch snapshot of watch-token estimates equals the
  * batch operator run on the union of batches 0..N — the family's
  * point-in-time contract. State is APPEND-ONLY and batchId-partitioned
  * with the strict `batch_id < N` read rule: at-least-once replay sees
  * the identical prior counters and rewrites the identical delta
  * partition — exactly-once, no pointer file.
  *
  * The over-estimate-only guarantee survives streaming by the same
  * additivity: summed counters are exactly the counters of the
  * concatenated stream, so every snapshot estimate >= the true count
  * so far (spec-asserted per batch).
  */
object CountMinStream {

  def applyBatch(statePath: String, tokenCol: String, watch: Seq[String],
                 depth: Int, hexDigits: Int)
                (batch: DataFrame, batchId: Long): Unit = {
    require(watch.nonEmpty, "watch list must be non-empty")
    val spark = batch.sparkSession
    import spark.implicits._
    // the batch's own delta sketch — pinned so the snapshot read and
    // the state write see one computation
    val delta = CountMin.sketch(batch, tokenCol, depth, hexDigits)
      .localCheckpoint(false)
    val prior = DedupStream.readState(spark, s"$statePath/sk", delta,
      Seq("lane", "bucket", "cnt"), batchId)
    val full = prior.unionByName(delta)
      .groupBy(col("lane"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val snap = CountMin.estimate(full, watch.toDF(tokenCol), tokenCol,
      depth, hexDigits)
    snap.write.mode("overwrite")
      .parquet(s"$statePath/watch/batch_id=$batchId")
    delta.write.mode("overwrite")
      .parquet(s"$statePath/sk/batch_id=$batchId")
  }

  /** The LATEST watch-token estimates: each batch writes the full
    * (token, est) snapshot, so read the highest batch partition.
    */
  def latest(spark: SparkSession, statePath: String): DataFrame = {
    DedupStream.latestSnapshot(spark, s"$statePath/watch",
      Seq("token", "est"))
  }

  /** Drain a streaming frame of (tokenCol) rows into the online
    * frequency state under `statePath`.
    */
  def start(rows: DataFrame, statePath: String, tokenCol: String,
            watch: Seq[String], depth: Int, hexDigits: Int,
            checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    rows.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("CountMinStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, tokenCol, watch, depth,
        hexDigits)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
