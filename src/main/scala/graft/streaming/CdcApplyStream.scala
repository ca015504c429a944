package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * Every filesystem touch goes through the path's own Hadoop
  * [[FileSystem]] (the [[StateMaintenance]] resolution), so the
  * versioned state lives as happily on `hdfs://`/`s3a://` as on a
  * local disk. The pointer swap is object-store-safe: the new value is
  * fully written to `_LATEST.tmp` first, then moved over `_LATEST`
  * (delete + single-object rename — each step atomic per object), and
  * [[snapshot]] falls back to the tmp pointer in the one window where
  * `_LATEST` is momentarily absent, so an external reader always
  * resolves a COMMITTED version (the tmp pointer is only ever written
  * after its version's parquet commit).
  *
  * Shape at 100 TB: the merge itself is one key exchange with a
  * map-side rank-1 (WindowGroupLimit) — see [[Cdc.applyChanges]]. The
  * full-snapshot rewrite per batch is the parquet-native equivalent of
  * a warehouse MERGE; a table format with file-level pruning (the
  * natural production sink) would rewrite only touched files, but the
  * versioning/replay contract here is identical.
  */
object CdcApplyStream {

  private def versions(fs: FileSystem, root: Path): Seq[Long] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong)
      .toSeq.sorted

  /** Read one pointer file, absorbing the two transient states a
    * concurrent swap can expose: the file vanishing between any probe
    * and the open (open directly, map FileNotFoundException to None —
    * an exists-then-open pair would race the writer's delete), and a
    * created-but-not-yet-written file (a local FS makes `create`d
    * files visible before their content lands; blank content is
    * mid-write, not corruption). Non-blank content is written
    * whole-then-closed by [[applyBatch]] before the file is ever at a
    * readable name, so it parses or the state really is corrupt.
    */
  private def readPointer(fs: FileSystem, p: Path): Option[Long] =
    try {
      val in = fs.open(p)
      val body = try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](64)
        Iterator.continually(in.read(chunk)).takeWhile(_ >= 0)
          .foreach(n => buf.write(chunk, 0, n))
        new String(buf.toByteArray, StandardCharsets.UTF_8).trim
      } finally in.close()
      if (body.isEmpty) None else Some(body.toLong)
    } catch {
      case _: java.io.FileNotFoundException => None
    }

  /** The merge applied to one micro-batch — exposed so the replay
    * contract is unit-testable without a streaming harness.
    */
  def applyBatch(seed: => DataFrame, statePath: String,
                 keyCol: String, tsCol: String, tieCol: String, opCol: String,
                 keepVersions: Int)(batch: DataFrame, batchId: Long): Unit = {
    require(keepVersions >= 2, s"keepVersions must be >= 2 for replay: $keepVersions")
    val spark = batch.sparkSession
    val (fs, root) = StateMaintenance.fsRoot(statePath)
    val prev = versions(fs, root).filter(_ < batchId).lastOption match {
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
    // pointer swap: tmp fully written (readers in the delete->rename
    // window fall back to it), then moved over _LATEST
    val tmp = new Path(root, "_LATEST.tmp")
    val out = fs.create(tmp, true)
    try out.write(batchId.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val latest = new Path(root, "_LATEST")
    fs.delete(latest, false)
    require(fs.rename(tmp, latest),
      s"CdcApplyStream: pointer swap $tmp -> $latest failed")
    val all = versions(fs, root)
    all.dropRight(keepVersions).foreach { v =>
      fs.delete(new Path(root, s"v=$v"), true)
    }
  }

  /** Current materialized snapshot (the newest committed version).
    *
    * The probe pair is RE-PROBED in a short bounded loop: a writer
    * completing the delete-then-rename swap between this reader's
    * `_LATEST` probe and its `_LATEST.tmp` probe makes BOTH probes
    * miss even though a committed pointer existed throughout — one
    * re-probe of `_LATEST` (which the completed swap just populated)
    * resolves it. The loop only spins when state LOOKS committed (a
    * `v=` version dir exists) but neither pointer resolves — the
    * legitimately-empty case (no batch has ever run) throws
    * immediately, unslowed.
    */
  def snapshot(spark: SparkSession, statePath: String): DataFrame = {
    val (fs, root) = StateMaintenance.fsRoot(statePath)
    def probe(): Option[Long] =
      readPointer(fs, new Path(root, "_LATEST"))
        .orElse(readPointer(fs, new Path(root, "_LATEST.tmp")))
    var v = probe()
    var attempts = 0
    while (v.isEmpty && attempts < 20 && versions(fs, root).nonEmpty) {
      Thread.sleep(25)
      v = probe()
      attempts += 1
    }
    val resolved = v.getOrElse(throw new IllegalStateException(
      s"CdcApplyStream: no committed snapshot under $statePath — " +
        "neither _LATEST nor _LATEST.tmp resolves"))
    StateMaintenance.stableRead(spark, s"$statePath/v=$resolved")
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
