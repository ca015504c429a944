package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Sketch

/** X88 in streaming form: ONLINE per-group HyperLogLog over an
  * unbounded stream — [[CardinalityStream]]'s shape with registers
  * instead of bucket occupancy, which removes that twin's one hard
  * limit: linear counting saturates (and raises) once every bucket
  * fills, while max-rank registers keep estimating for any stream
  * length at the same m-bounded state.
  *
  * STATE IS THE REGISTER-IMPROVEMENT LOG: per batch, the batch's own
  * registers (row-local rho over the md5 lane, map-side-combined max)
  * are compared against the accumulated maxima and only STRICT
  * IMPROVEMENTS append — a register's value only ever goes up, and
  * mj ∈ [1, 49], so a (grp, reg) pair can improve at most 49 times
  * over the stream's whole lifetime: state is ≤ groups·m·49 rows EVER,
  * independent of stream length (in practice ~log of it). Read-time
  * max over the log reconstructs the registers; pointwise max is
  * idempotent and commutative, which is exactly why HLL streams.
  *
  * POINT-IN-TIME CONTRACT: batch N's snapshot equals the batch
  * operator's (filled, est) on the union of batches 0..N (the
  * estimator fragment is SHARED — [[Sketch.hllEstExpr]] — so the two
  * cannot diverge on arithmetic). The batch operator's n_exact audit
  * column deliberately does not stream: it is the unbounded-state
  * baseline the sketch replaces. State is APPEND-ONLY and
  * batchId-partitioned with the strict `batch_id < N` read rule:
  * replay sees identical prior maxima and rewrites identical
  * improvement partitions — exactly-once, no pointer file.
  */
object HllStream {

  def applyBatch(statePath: String, groupCol: String, valueCol: String,
                 hexDigits: Int)
                (batch: DataFrame, batchId: Long): Unit = {
    val m = math.pow(16, hexDigits).toLong
    val spark = batch.sparkSession
    val delta = Sketch.hllRegisters(batch, groupCol, valueCol, hexDigits)
    val prior = DedupStream.readState(spark, s"$statePath/regs", delta,
      Seq("grp", "reg", "mj"), batchId)
      .groupBy(col("grp"), col("reg")).agg(max(col("mj")).as("mj"))
    // strict improvements only (null-safe on grp — a null group is
    // legitimate and must not re-append every batch)
    val novel = delta.as("d").join(prior.as("p"),
        col("d.grp") <=> col("p.grp") && col("d.reg") === col("p.reg"),
        "left")
      .filter(col("p.mj").isNull || col("d.mj") > col("p.mj"))
      .select(col("d.grp").as("grp"), col("d.reg").as("reg"),
        col("d.mj").as("mj"))
      .localCheckpoint(false)
    val regs = prior.unionByName(novel)
      .groupBy(col("grp"), col("reg")).agg(max(col("mj")).as("mj"))
    val est = Sketch.hllEstExpr(m)
    val snap = regs.groupBy(col("grp"))
      .agg(count(lit(1)).as("filled"),
        sum(expr(Sketch.hllTermSql)).as("s_present"))
      .select(col("grp"), col("filled"), expr(est).as("est"))
    snap.write.mode("overwrite")
      .parquet(s"$statePath/card/batch_id=$batchId")
    novel.write.mode("overwrite")
      .parquet(s"$statePath/regs/batch_id=$batchId")
  }

  /** The LATEST per-group estimates: each batch rewrites the full
    * (grp, filled, est) snapshot, so read the highest batch partition.
    */
  def latest(spark: SparkSession, statePath: String): DataFrame = {
    DedupStream.latestSnapshot(spark, s"$statePath/card",
      Seq("grp", "filled", "est"))
  }

  /** Drain a streaming frame of (groupCol, valueCol) rows into the
    * online register state under `statePath`.
    */
  def start(rows: DataFrame, statePath: String, groupCol: String,
            valueCol: String, hexDigits: Int,
            checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    rows.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining("HllStream",
        statePath, checkpointDir, maintainEvery,
        maintainFilesPerFold)(
        applyBatch(statePath, groupCol, valueCol,
        hexDigits)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
