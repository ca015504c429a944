package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Cdc

/** X29 in streaming form: a `foreachBatch` MERGE — each micro-batch of
  * CDC changes is applied onto a persisted dimension snapshot with
  * [[Cdc.applyChanges]] (latest-row-per-key upsert/delete semantics).
  *
  * Idempotence: `foreachBatch` is at-least-once, so the snapshot is
  * VERSIONED BY batchId — batch N always reads the newest version
  * strictly below N and overwrites `v=N`. A replayed batch is then a
  * pure function of (version N-1, batch N) and rewrites `v=N`
  * bit-identically: at-least-once delivery collapses to exactly-once
  * state (the standard batchId-as-idempotence-token recipe, same
  * discipline as [[Pump.writeBatch]]). The `_LATEST` pointer only
  * advances after the version's parquet commit, so readers never see a
  * half-written snapshot; superseded versions beyond the retention
  * window are pruned (retention must be >= 2 so a replay can still see
  * its predecessor).
  *
  * Shape at 100 TB: the merge itself is one key exchange with a
  * map-side rank-1 (WindowGroupLimit) — see [[Cdc.applyChanges]]. The
  * full-snapshot rewrite per batch is the parquet-native equivalent of
  * a warehouse MERGE; a table format with file-level pruning (the
  * natural production sink) would rewrite only touched files, but the
  * versioning/replay contract here is identical.
  */
object CdcApplyStream {

  private def versions(statePath: String): Seq[Long] = {
    val d = Paths.get(statePath)
    if (!Files.isDirectory(d)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val s = Files.list(d)
    try s.forEach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("v=")) out += n.stripPrefix("v=").toLong
    } finally s.close()
    out.toSeq.sorted
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
      finally s.close()
    }

  /** The merge applied to one micro-batch — exposed so the replay
    * contract is unit-testable without a streaming harness.
    */
  def applyBatch(seed: => DataFrame, statePath: String,
                 keyCol: String, tsCol: String, tieCol: String, opCol: String,
                 keepVersions: Int)(batch: DataFrame, batchId: Long): Unit = {
    require(keepVersions >= 2, s"keepVersions must be >= 2 for replay: $keepVersions")
    val spark = batch.sparkSession
    val prev = versions(statePath).filter(_ < batchId).lastOption match {
      case Some(v) => spark.read.parquet(s"$statePath/v=$v")
      case None => seed
    }
    // the materialized snapshot has no op column (applyChanges drops it):
    // every surviving row is by definition an upsert
    val prevTagged =
      if (prev.columns.contains(opCol)) prev
      else prev.withColumn(opCol, org.apache.spark.sql.functions.lit("U"))
    Cdc.applyChanges(prevTagged, batch, keyCol, tsCol, tieCol, opCol)
      .write.mode("overwrite").parquet(s"$statePath/v=$batchId")
    // atomic pointer swap: a concurrent snapshot() reader must never see
    // a truncated/half-written _LATEST
    val tmp = Paths.get(statePath, "_LATEST.tmp")
    Files.writeString(tmp, batchId.toString)
    Files.move(tmp, Paths.get(statePath, "_LATEST"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val all = versions(statePath)
    all.dropRight(keepVersions).foreach { v =>
      deleteRecursively(Paths.get(statePath, s"v=$v"))
    }
  }

  /** Current materialized snapshot (the newest committed version). */
  def snapshot(spark: SparkSession, statePath: String): DataFrame = {
    val v = Files.readString(Paths.get(statePath, "_LATEST")).trim.toLong
    spark.read.parquet(s"$statePath/v=$v")
  }

  /** Drain `changes` (a streaming frame with the [[Cdc.applyChanges]]
    * schema) into the versioned snapshot under `statePath`, starting
    * from `seed` when no version exists yet.
    */
  def start(changes: DataFrame, seed: DataFrame, statePath: String,
            keyCol: String, tsCol: String, tieCol: String, opCol: String,
            checkpointDir: String, keepVersions: Int = 3): StreamingQuery =
    changes.writeStream
      .foreachBatch(
        applyBatch(seed, statePath, keyCol, tsCol, tieCol, opCol, keepVersions) _)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
