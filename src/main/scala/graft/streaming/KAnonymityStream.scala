package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Pii

/** X134 in streaming form: ONLINE k-anonymity release audit — the
  * re-identification alarm beside [[GateAttributionStream]]'s gate
  * alarm ("source X just started shipping quasi-identifier SINGLETON
  * classes — stop the release and look"). Each micro-batch counts its
  * equivalence classes through the shared [[Pii.classCounts]] lane
  * (the SAME grouping/null semantics as the batch operator) and
  * merges by pure addition.
  *
  * STATE IS THE (quasi-identifier tuple, k_size) LEDGER — class-grain,
  * bounded by the attribute cross product, never corpus-sized. The
  * accumulated counts ARE the batch operator's aggregation state, so
  * batch N's snapshot equals [[Pii.kAnonymity]] over ALL documents of
  * batches 0..N — full snapshot equality through the shared
  * [[Pii.kAnonymityOf]] projection (at-risk flags + the broadcast
  * suppression total). Note the direction of the alarm: a class can
  * only GROW, so `at_risk` rows heal as the stream ingests — the
  * operational read is "these classes are still below k as of now;
  * releasing the corpus ingested so far leaks them".
  *
  * State is APPEND-ONLY with the strict `batch_id < N` read rule:
  * at-least-once replay recomputes identical deltas and rewrites
  * identical partitions — exactly-once, no pointer file. Maintenance:
  * counts fold, risk snapshots prune
  * ([[StateMaintenance.TwinStateShapes]]).
  */
object KAnonymityStream {

  /** One micro-batch: count classes, accumulate, snapshot — exposed
    * for direct unit testing of the replay contract.
    */
  def applyBatch(statePath: String, quasiIds: Seq[String], k: Long)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val delta = Pii.classCounts(batch.select(quasiIds.map(col): _*),
      quasiIds).localCheckpoint(false)
    val prior = DedupStream.readState(spark, s"$statePath/counts",
      delta, quasiIds :+ "k_size", batchId)
    val acc = prior.unionByName(delta)
      .groupBy(quasiIds.map(col): _*)
      .agg(sum(col("k_size")).as("k_size"))
    val snapshot = Pii.kAnonymityOf(acc, quasiIds, k)

    snapshot.write.mode("overwrite")
      .parquet(s"$statePath/risk/batch_id=$batchId")
    delta.write.mode("overwrite")
      .parquet(s"$statePath/counts/batch_id=$batchId")
  }

  /** The LATEST class-grain risk table (quasi-identifier columns,
    * k_size, at_risk, n_suppressed). Empty `cols` keeps every column:
    * the quasi-identifier tuple is caller-chosen, so the snapshot's
    * own schema is the contract.
    */
  def latest(spark: SparkSession, statePath: String): DataFrame =
    DedupStream.latestSnapshot(spark, s"$statePath/risk", Seq.empty)

  /** Threshold SWEEP over the ACCUMULATED class ledger (the x147 curve
    * computed online): suppression cost at each candidate k for
    * everything committed so far, WITHOUT restarting the stream at a
    * different k — the twin's fixed start-time k only shapes the
    * at-risk snapshot, the ledger itself is threshold-free. Reads
    * every committed counts partition (sentinel included), so like all
    * external accessors it can transiently race an in-flight batch or
    * fold; returns the fixed 5-column sweep schema, empty when no
    * batch has committed yet.
    */
  def sweep(spark: SparkSession, statePath: String, quasiIds: Seq[String],
            ks: Seq[Long]): DataFrame = {
    val dir = s"$statePath/counts"
    if (!StateMaintenance.isDir(dir))
      return Pii.sweepOf(
        spark.createDataset(Seq.empty[Long])(
          org.apache.spark.sql.Encoders.scalaLong).toDF("k_size"), ks)
    val classes = StateMaintenance.stableRead(spark, dir).drop("batch_id")
      .groupBy(quasiIds.map(col): _*)
      .agg(sum(col("k_size")).as("k_size"))
    Pii.sweepOf(classes, ks)
  }

  /** Generalization CURVE over the accumulated ledger (the x148 curve
    * computed online, completing the privacy face beside [[sweep]]'s
    * x147): suppression cost at fixed `k` as a function of bucket
    * coarseness, for everything committed so far. Requires the twin to
    * have been STARTED with the finest length bucket in its
    * quasi-identifier tuple (`lbCol` = length div `b0`, one of
    * `quasiIds` at [[start]] time) — the ledger is then the finest
    * class table, and every coarser width is a class-grain rollup
    * through the SAME [[Pii.generalizeOf]] kernel as the batch
    * operator, so the two cannot drift. `quasiIds` here is the tuple
    * WITHOUT the bucket column. Returns the fixed 5-column x148 schema,
    * empty-corpus-safe (0 ppm), without restarting the stream for a
    * different bucket list.
    */
  def generalize(spark: SparkSession, statePath: String,
                 quasiIds: Seq[String], lbCol: String, b0: Long,
                 buckets: Seq[Long], k: Long): DataFrame = {
    val dir = s"$statePath/counts"
    val finest =
      if (!StateMaintenance.isDir(dir)) {
        // fixed output schema even before the first commit: an empty
        // finest table with the caller's tuple + bucket + k_size
        val cols = (quasiIds :+ lbCol).map(c => col(c)) :+ col("k_size")
        spark.createDataset(Seq.empty[Long])(
          org.apache.spark.sql.Encoders.scalaLong).toDF("k_size")
          .withColumns((quasiIds :+ lbCol).map(c =>
            c -> lit(null).cast("bigint")).toMap)
          .select(cols: _*)
      } else StateMaintenance.stableRead(spark, dir).drop("batch_id")
        .groupBy((quasiIds :+ lbCol).map(col): _*)
        .agg(sum(col("k_size")).as("k_size"))
    Pii.generalizeOf(finest, quasiIds, lbCol, b0, buckets, k)
  }

  /** The accumulated ledger rolled up to one class table over
    * `groupCols` — the shared read behind [[sweep]], [[generalize]],
    * [[lDiversity]] and [[tCloseness]]: a twin started with tuple T
    * can answer any audit whose grouping is a subset of T, because
    * class counts are additive under coarsening.
    */
  private def ledgerClasses(spark: SparkSession, statePath: String,
                            groupCols: Seq[String]): Option[DataFrame] = {
    val dir = s"$statePath/counts"
    if (!StateMaintenance.isDir(dir)) None
    else Some(StateMaintenance.stableRead(spark, dir).drop("batch_id")
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("k_size")).as("sv_count")))
  }

  /** An empty class-value ledger with the caller's column shape — the
    * fixed-schema answer for every pre-first-commit accessor below.
    */
  private def emptyLedger(spark: SparkSession,
                          groupCols: Seq[String]): DataFrame = {
    val cols = groupCols.map(col) :+ col("sv_count")
    spark.createDataset(Seq.empty[Long])(
      org.apache.spark.sql.Encoders.scalaLong).toDF("sv_count")
      .withColumns(groupCols.map(c =>
        c -> lit(null).cast("string")).toMap)
      .select(cols: _*)
  }

  /** X151 ONLINE: the distinct l-diversity sweep over the accumulated
    * ledger. Requires the twin to have been STARTED with the sensitive
    * attribute in its tuple (`quasiIds :+ sensitiveCol` at [[start]]
    * time) — the ledger is then exactly [[Pii.sensitiveClassCounts]]'
    * shape, and the sweep runs through the SAME [[Pii.lDiversityOf]]
    * kernel as the batch operator (no corpus access, no restart).
    */
  def lDiversity(spark: SparkSession, statePath: String,
                 quasiIds: Seq[String], sensitiveCol: String,
                 ls: Seq[Long]): DataFrame = {
    val svc = ledgerClasses(spark, statePath, quasiIds :+ sensitiveCol)
      .getOrElse(emptyLedger(spark, quasiIds :+ sensitiveCol))
    Pii.lDiversityOf(svc, quasiIds, ls)
  }

  /** X152 ONLINE: the t-closeness audit over the accumulated ledger —
    * same started-tuple contract as [[lDiversity]], same
    * [[Pii.tClosenessOf]] kernel as the batch operator.
    */
  def tCloseness(spark: SparkSession, statePath: String,
                 quasiIds: Seq[String], sensitiveCol: String,
                 tPpm: Long): DataFrame = {
    val svc = ledgerClasses(spark, statePath, quasiIds :+ sensitiveCol)
      .getOrElse(emptyLedger(spark, quasiIds :+ sensitiveCol))
    Pii.tClosenessOf(svc, quasiIds, sensitiveCol, tPpm)
  }

  /** Drain a streaming frame carrying the quasi-identifier columns
    * into the online risk state under `statePath`.
    */
  def start(docs: DataFrame, statePath: String, quasiIds: Seq[String],
            k: Long, checkpointDir: String,
            maintainEvery: Int = 0,
            maintainFilesPerFold: Int = 1): StreamingQuery =
    docs.writeStream
      .foreachBatch(StateMaintenance.selfMaintaining(
        "KAnonymityStream", statePath, checkpointDir,
        maintainEvery, maintainFilesPerFold)(
        applyBatch(statePath, quasiIds, k)))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
