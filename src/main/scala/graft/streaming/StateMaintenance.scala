package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance for the streaming twins' batchId-partitioned state — the
  * round-14 named scale seam. The append-only `batch_id=N` layout is
  * what makes replay exactly-once (strict `batch_id < N` reads,
  * overwrite-own-partition writes), but a long-lived stream gains one
  * partition per micro-batch per state table: at a 5-second trigger
  * that is ~17k partitions/day/table, and every probe's `batch_id < N`
  * read must LIST and footer-read all of them — per-batch cost grows
  * with partition COUNT even while data volume stays batch-sized.
  *
  * Two state shapes, two maintenance moves:
  *
  *  - UNION-READ state (index rows, additive count/moment deltas,
  *    emitted ledgers — everything consumed through
  *    [[DedupStream.readState]] or a union-all external accessor):
  *    [[compactState]] folds every `0 <= batch_id < watermark`
  *    partition (plus any previous fold) into the `batch_id=-1`
  *    SENTINEL partition. The sentinel keeps partition depth uniform
  *    (mixed layouts break discovery), and `-1 < N` for every real
  *    batch, so every strict `batch_id < N` read naturally includes
  *    it: readers need NO change. Unlike the sink fold, state rows are
  *    NOT deduplicated — additive deltas from different batches are
  *    distinct contributions even when bit-identical (two batches can
  *    each contribute `(word, n=5)`), whereas sink rows carry unique
  *    mids. Replay safety comes from the WATERMARK RULE below, not
  *    from dedup.
  *
  *  - SNAPSHOT state (each batch overwrites a FULL answer; only the
  *    max batch_id is ever read, via [[DedupStream.latestSnapshot]]):
  *    [[pruneSnapshots]] deletes superseded `batch_id < watermark`
  *    partitions — the [[CdcApplyStream]] retention contract. The
  *    latest snapshot always survives (the watermark clamps to it).
  *
  * EVERY filesystem touch goes through the Hadoop [[FileSystem]] API
  * resolved from the path's own scheme — plain paths, `file:`,
  * `hdfs://`, and `s3a://` state roots all self-maintain. The commit
  * protocol deliberately does NOT rely on atomic directory rename
  * (object stores have none; S3A "rename" is a per-object copy+delete
  * that can be observed half-done). Instead the fold is
  * MANIFEST-COMMITTED:
  *
  *   1. STAGE — the folded rows are written to the hidden
  *      `.fold_tmp/` (partition discovery skips dot-dirs). No live
  *      partition is touched: a crash anywhere in this phase leaves
  *      the table bit-identical to before the fold.
  *   2. COMMIT — a single small `.fold_manifest` file is published
  *      (written inside the staging dir, then renamed up one level).
  *      One object, written whole: a single-file PUT/rename is the
  *      one mutation every production filesystem exposes atomically
  *      enough — the manifest either exists with full content or not
  *      at all. It names the staged data files and the superseded
  *      `batch_id=N` partitions.
  *   3. ROLL FORWARD — superseded sentinel files are deleted, each
  *      staged file is moved into `batch_id=-1/` (per-file,
  *      idempotent: a file already at its destination was moved by a
  *      previous attempt; staged part names carry write-job UUIDs so
  *      generations never collide), the manifest's `drop` partitions
  *      are deleted, the staging dir is removed, and the manifest is
  *      deleted LAST — its absence IS "fold complete".
  *
  * Crash recovery ([[recoverDir]], run ahead of every batch by
  * [[selfMaintaining]]) is therefore two existence probes: manifest
  * present → the fold committed, roll it forward to completion (every
  * step above is idempotent at every crash point); staging present
  * without a manifest → the fold never committed, delete the staging
  * dir — the live partitions were never touched, so there is nothing
  * to restore. Restoring a `drop`-listed partition by hand after the
  * commit would DOUBLE-COUNT every folded delta — which is exactly
  * why recovery is code, not a doc instruction.
  *
  * THE WATERMARK RULE — never fold or prune a batch that an in-flight
  * replay could still rewrite. A `foreachBatch` replay re-runs only
  * batches NOT yet committed in the streaming checkpoint; a replayed
  * batch N (a) re-reads strictly `batch_id < N` and (b) overwrites its
  * own `batch_id=N` partition. Folding a batch that can still replay
  * breaks both: its rows would sit in the sentinel (which every read
  * includes) AND reappear in the recreated live partition —
  * duplicates — and the sentinel would leak batches >= N into the
  * replay's input. With `watermark <= smallest replayable batch id`
  * neither can happen. [[committedWatermark]] derives the safe value
  * from the query's own checkpoint (last committed batch + 1).
  *
  * CONCURRENT EXTERNAL READERS: the stream itself never races its own
  * maintenance ([[selfMaintaining]] folds inside `foreachBatch`, after
  * the step, when no batch is in flight), but an OUT-OF-BAND reader —
  * a dashboard calling `pairs()`/`latest()` while the stream runs —
  * can list the state dir inside the roll-forward or prune window and
  * transiently fail (`FileNotFoundException` on a just-dropped
  * partition) or observe a partial union. Committed stream state is
  * never affected — and the accessors ABSORB the race themselves:
  * every twin's `latest()`/`pairs()`/`sweep()` routes through
  * [[stableRead]] (marker wait + bounded listing retry +
  * relation-scoped `ignoreMissingFiles`), so a dashboard polling a
  * live twin never sees a transient failure. Readers that bypass the
  * accessors and `spark.read.parquet` the state dirs directly take
  * the race back onto themselves.
  */
object StateMaintenance {

  private val TmpName = ".fold_tmp"
  private val ManifestName = ".fold_manifest"
  private val SentinelName = "batch_id=-1"
  private val ManifestHeader = "graft-fold v1"

  /** Resolve a state path to its Hadoop [[FileSystem]] — local for
    * plain paths and `file:` URIs, the scheme's filesystem otherwise.
    * The active session's Hadoop conf carries cluster addresses and
    * object-store credentials; the bare default conf only ever serves
    * local paths in practice.
    */
  private[streaming] def fsRoot(dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    val conf = SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
    (p.getFileSystem(conf), p)
  }

  /** Existence-probe a directory through the path's own filesystem —
    * shared with [[UniMaxStream.allocation]]'s retired-version check so
    * a remote-scheme path probes the REMOTE store, never a same-named
    * local directory.
    */
  private[streaming] def isDir(dir: String): Boolean = {
    val (fs, p) = fsRoot(dir)
    fs.exists(p) && fs.getFileStatus(p).isDirectory
  }

  /** Data files of one directory: not a subdir, not dot- or
    * underscore-prefixed (checksums, `_SUCCESS`, our own markers).
    */
  private def dataFiles(fs: FileSystem, dir: Path): Array[Path] =
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith(".") && !n.startsWith("_")
    }.map(_.getPath)

  private def batchDirs(fs: FileSystem, root: Path): Array[(Long, Path)] =
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
      .map(st => (st.getPath.getName.stripPrefix("batch_id=").toLong,
        st.getPath))

  private def readManifest(fs: FileSystem, man: Path): Seq[String] = {
    val in = fs.open(man)
    val body = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      Iterator.continually(in.read(chunk)).takeWhile(_ >= 0)
        .foreach(n => buf.write(chunk, 0, n))
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    body.split("\n").toSeq.filter(_.nonEmpty)
  }

  /** Read a state dir the way an OUT-OF-BAND reader must: every twin's
    * `latest()`/`pairs()`/`sweep()` accessor routes through here so the
    * maintenance race in the object doc is absorbed by the LIBRARY, not
    * pushed onto every dashboard author. Three layers:
    *
    *   1. MARKER WAIT — while a fold is in flight or committed-but-not-
    *      rolled-forward (`.fold_tmp` or `.fold_manifest` present), the
    *      table is transiently inconsistent by design; wait it out in a
    *      short bounded loop (folds over sliver-sized state complete in
    *      well under the budget). On a HEALTHY dir this is two existence
    *      probes and zero sleeps. If markers persist past the budget
    *      (a stream crashed mid-fold and has not restarted), proceed —
    *      a possibly-partial read beats an accessor that hangs; the
    *      reader must NOT roll the fold forward itself because
    *      [[rollForward]] is idempotent across RETRIES, not safe under
    *      two CONCURRENT executions (both would race the same renames).
    *   2. LISTING RETRY — `spark.read.parquet` lists and footer-reads
    *      eagerly; a partition dropped between the marker probe and the
    *      listing surfaces as FileNotFoundException. Retry the read,
    *      bounded.
    *   3. `ignoreMissingFiles` AS A READ OPTION (relation-scoped, not a
    *      session conf — it survives composition into any caller
    *      query): a file dropped AFTER listing but before the task
    *      opens it is skipped instead of failing the action, which can
    *      fire long after the accessor returned.
    *
    * Committed stream state is never affected by any of this (the
    * stream itself never races its own maintenance); the absorbed
    * failure modes are strictly the external-reader races.
    */
  def stableRead(spark: SparkSession, dir: String,
                 attempts: Int = 40, backoffMs: Long = 50): DataFrame = {
    val (fs, root) = fsRoot(dir)
    val man = new Path(root, ManifestName)
    val tmp = new Path(root, TmpName)
    var waited = 0
    while (waited < attempts && (fs.exists(man) || fs.exists(tmp))) {
      Thread.sleep(backoffMs)
      waited += 1
    }
    def transientMissing(e: Throwable): Boolean =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
        .exists(_.isInstanceOf[java.io.FileNotFoundException])
    var out: Option[DataFrame] = None
    var tries = 0
    while (out.isEmpty) {
      try out = Some(
        spark.read.option("ignoreMissingFiles", "true").parquet(dir))
      catch {
        case e: Throwable if transientMissing(e) && tries < attempts =>
          tries += 1
          Thread.sleep(backoffMs)
      }
    }
    out.get
  }

  /** Publish the fold manifest — THE commit point. The body is written
    * whole into the staging dir (a crash there aborts with the rest of
    * staging), then renamed up to `root/.fold_manifest`: one small
    * object, so on HDFS/local the rename is atomic and on an object
    * store the copy half of copy+delete is a single atomic PUT (a
    * leftover source copy dies with the staging dir on recovery).
    * Exposed `private[streaming]` so the crash specs can reproduce the
    * exact committed-but-not-rolled-forward window.
    */
  private[streaming] def commitManifest(fs: FileSystem, root: Path,
                                        files: Seq[String],
                                        dropDirs: Seq[String]): Unit = {
    val body = (ManifestHeader +: (files.map("file " + _) ++
      dropDirs.map("drop " + _))).mkString("\n")
    val staged = new Path(new Path(root, TmpName), ".MANIFEST")
    val out = fs.create(staged, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    require(fs.rename(staged, new Path(root, ManifestName)),
      s"compactState: committing manifest under $root failed")
  }

  /** Complete a committed fold. Idempotent at every crash point:
    * deleting a superseded file twice is a no-op; a manifest file
    * already at its destination was moved by a previous attempt (its
    * staging copy, if a non-atomic rename left one, is deleted); drop
    * and cleanup deletes are no-ops when re-run. The manifest is
    * deleted LAST, so recovery re-enters here until everything held.
    */
  private def rollForward(fs: FileSystem, root: Path): Unit = {
    val man = new Path(root, ManifestName)
    val tmp = new Path(root, TmpName)
    val sentinel = new Path(root, SentinelName)
    val lines = readManifest(fs, man)
    require(lines.headOption.contains(ManifestHeader),
      s"compactState: unrecognized manifest header in $man: " +
        lines.headOption.getOrElse("<empty>"))
    val keep = lines.collect {
      case s if s.startsWith("file ") => s.stripPrefix("file ")
    }.toSet
    val drop = lines.collect {
      case s if s.startsWith("drop ") => s.stripPrefix("drop ")
    }
    fs.mkdirs(sentinel)
    dataFiles(fs, sentinel).filterNot(p => keep(p.getName))
      .foreach(p => fs.delete(p, false))
    keep.foreach { name =>
      val src = new Path(tmp, name)
      val dst = new Path(sentinel, name)
      if (fs.exists(dst)) { if (fs.exists(src)) fs.delete(src, false) }
      else {
        require(fs.exists(src),
          s"compactState roll-forward: manifest names $name but neither " +
            s"$src nor $dst exists — the staging dir was tampered with " +
            "between commit and completion")
        require(fs.rename(src, dst),
          s"compactState roll-forward: move $src -> $dst failed")
      }
    }
    drop.foreach(n => fs.delete(new Path(root, n), true))
    fs.delete(tmp, true)
    fs.delete(man, false)
  }

  /** Probe-and-repair one state dir for an interrupted fold, keyed on
    * the commit point: manifest present = committed → [[rollForward]]
    * to completion; staging present without a manifest = never
    * committed → delete the staging dir (the live partitions were
    * never touched, so the pre-fold table is already whole).
    * Idempotent and cheap when healthy (two existence checks).
    *
    * @return true when a marker was found and repaired
    */
  private[streaming] def recoverDir(fs: FileSystem, root: Path): Boolean = {
    val man = new Path(root, ManifestName)
    val tmp = new Path(root, TmpName)
    if (fs.exists(man)) { rollForward(fs, root); true }
    else if (fs.exists(tmp)) { fs.delete(tmp, true); true }
    else false
  }

  /** Repair every interrupted fold under a twin's state root. MUST run
    * before a batch READS state, not merely before the next fold: a
    * fold that crashed mid-roll-forward can have deleted some
    * superseded sentinel files while their replacements still sit
    * hidden in `.fold_tmp/` — a replayed batch reading that state
    * would compute wrong results against partial tables and COMMIT
    * them before any later fold-side recovery ran. [[selfMaintaining]]
    * calls this ahead of every step; out-of-band operators restarting
    * a twin by hand should call it (or [[maintain]], which recovers
    * per-dir) before the first external state read.
    *
    * @return number of state dirs that needed repair
    */
  def recover(statePath: String, twin: String): Int = {
    val (foldDirs, _) = shapesOf(twin)
    foldDirs.count { n =>
      val (fs, p) = fsRoot(s"$statePath/$n")
      fs.exists(p) && fs.getFileStatus(p).isDirectory && recoverDir(fs, p)
    }
  }

  /** Fold all `0 <= batch_id < watermark` partitions of one UNION-READ
    * state dir (plus the previous sentinel, if any) into the
    * `batch_id=-1` sentinel, with the manifest-committed protocol in
    * the object doc. Idempotent: a re-run with the same watermark
    * finds no live partition below it and does nothing. Crash recovery
    * is automatic ([[recoverDir]], also run ahead of every batch by
    * [[selfMaintaining]] so no read ever sees a half-rolled table).
    *
    * @param filesPerFold output files for the folded sentinel; 1 is
    *   right for sliver-sized state (digests, band rows, deltas) —
    *   raise it for retained-corpus-sized dirs (e.g. CurateStream
    *   `docs/`) so the fold write stays parallel and downstream scans
    *   of the sentinel keep their split parallelism.
    * @return number of live partitions folded (0 = no-op)
    */
  def compactState(spark: SparkSession, dir: String, watermark: Long,
                   filesPerFold: Int = 1): Int = {
    require(watermark >= 0, s"watermark must be >= 0: $watermark")
    val (fs, root) = fsRoot(dir)
    recoverDir(fs, root)
    val all = batchDirs(fs, root)
    val folded = all.filter { case (id, _) => id >= 0 && id < watermark }
    if (folded.isEmpty) return 0
    val tmp = new Path(root, TmpName)
    // one read spans sentinel + live-below-watermark: -1 < watermark,
    // so a single partition-pruned filter covers both. NO dropDuplicates
    // (see the object doc — delta rows are contributions, not identity).
    val rows = spark.read.parquet(dir)
      .filter(col("batch_id") < watermark)
      .drop("batch_id")
    rows.repartition(filesPerFold).write.mode("overwrite")
      .parquet(tmp.toString)
    commitManifest(fs, root, dataFiles(fs, tmp).map(_.getName).toSeq,
      folded.map { case (id, _) => s"batch_id=$id" }.toSeq)
    rollForward(fs, root)
    folded.length
  }

  /** Delete superseded FULL-SNAPSHOT partitions strictly below the
    * watermark. The newest snapshot is the table's answer
    * ([[DedupStream.latestSnapshot]] reads the max batch_id), so the
    * effective watermark clamps to it — it is never deleted. Snapshot
    * partitions are never read by a replay (a replayed batch derives
    * its snapshot from the DELTA dirs and overwrites `batch_id=N`
    * whether or not it still exists), so the only watermark constraint
    * is keeping the latest — but use the same [[committedWatermark]]
    * anyway: it is always <= max+1 and keeps one mental model. Plain
    * recursive deletes: no commit point needed, because a
    * half-deleted non-max snapshot is never read and the next prune
    * finishes it.
    *
    * @return number of snapshot partitions pruned
    */
  def pruneSnapshots(dir: String, watermark: Long): Int = {
    val (fs, root) = fsRoot(dir)
    val all = batchDirs(fs, root)
    if (all.isEmpty) return 0
    // clamp: the newest snapshot survives any watermark (a watermark of
    // lastCommitted+1 — the committedWatermark — names every committed
    // batch prunable, but the newest one IS the table's answer)
    val effective = math.min(watermark, all.map(_._1).max)
    val doomed = all.filter { case (id, _) => id >= 0 && id < effective }
    doomed.foreach { case (_, p) => fs.delete(p, true) }
    doomed.length
  }

  /** The safe fold/prune watermark for a streaming query: last
    * committed batch id + 1, read from the checkpoint's `commits/`
    * log. Batches below it can never replay under this checkpoint;
    * the one batch that CAN still replay (lastCommitted + 1) stays
    * live. 0 (fold nothing) when no batch has committed yet.
    */
  def committedWatermark(checkpointDir: String): Long = {
    val (fs, root) = fsRoot(checkpointDir)
    val d = new Path(root, "commits")
    if (!fs.exists(d)) return 0L
    val ids = fs.listStatus(d).map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
    if (ids.isEmpty) 0L else ids.max + 1L
  }

  /** Per-twin state-shape registry: which subdirs under a twin's
    * `statePath` are union-read (fold with [[compactState]]) vs
    * full-snapshot (prune with [[pruneSnapshots]]). Derived from each
    * twin's own reads — every `readState` target and union-all
    * accessor is a fold dir; every `latestSnapshot` target is a prune
    * dir.
    */
  val TwinStateShapes: Map[String, (Seq[String], Seq[String])] = Map(
    // twin -> (fold dirs, prune dirs)
    "DedupStream" -> (Seq("docs", "bands", "pairs"), Seq.empty),
    "SimhashStream" -> (Seq("bands", "pairs"), Seq.empty),
    "CurateStream" -> (Seq("fps", "docs", "bands", "evsh", "ledger"),
      Seq.empty),
    "SubstringStream" -> (Seq("windows", "runs"), Seq.empty),
    "SemDedupStream" -> (Seq("vecs", "pairs"), Seq.empty),
    "SemDeconStream" -> (Seq("ev", "out"), Seq.empty),
    "ParagraphDedupStream" -> (Seq("pdig", "out"), Seq.empty),
    "BoilerplateStream" -> (Seq("df", "meta", "out"), Seq.empty),
    "DecontaminateStream" -> (Seq("evsh", "cleaned"), Seq.empty),
    "BloomGateStream" -> (Seq("evsh", "contam"), Seq.empty),
    "CdcChunkStream" -> (Seq("chunks", "ledger"), Seq.empty),
    "SubsampleStream" -> (Seq("counts", "out"), Seq.empty),
    "TokenBudgetStream" -> (Seq("spent", "admitted"), Seq.empty),
    // alloc is VERSIONED point-in-time (allocation() reads one exact
    // batch_id, default max) — folding would union every version under
    // the sentinel and corrupt the max-read; it prunes like a snapshot
    "UniMaxStream" -> (Seq("counts"), Seq("alloc")),
    "PplBucketStream" -> (Seq("refsc", "buckets"), Seq.empty),
    "KnLmStream" -> (Seq("c5", "t4", "t3", "t2", "t1", "c1k", "summary",
      "scores"), Seq.empty),
    "BleuStream" -> (Seq("counts"), Seq("score")),
    "CardinalityStream" -> (Seq("buckets"), Seq("card")),
    "CountMinStream" -> (Seq("sk"), Seq("watch")),
    "HllStream" -> (Seq("regs"), Seq("card")),
    "KmvStream" -> (Seq("mins"), Seq("sketch")),
    "PsiDriftStream" -> (Seq("cur"), Seq("psi")),
    "QuantileStream" -> (Seq("summ"), Seq("q")),
    "BurstinessStream" -> (Seq("moments", "meta"), Seq("vmr")),
    "UnigramKlStream" -> (Seq("counts"), Seq("kl")),
    "KeynessStream" -> (Seq("counts"), Seq("key")),
    "GateRateStream" -> (Seq("counts"), Seq("rates")),
    "KsDriftStream" -> (Seq("counts"), Seq("ks")),
    "ConcentrationStream" -> (Seq("counts"), Seq("conc")),
    "SourceDupStream" -> (Seq("docs", "bands", "pairs", "src"),
      Seq("dup")),
    "GateAttributionStream" -> (Seq("counts"), Seq("attr")),
    "KAnonymityStream" -> (Seq("counts"), Seq("risk")),
    "GateAgreementStream" -> (Seq("counts"), Seq("agree")))

  /** One-call maintenance for a twin's whole state root: fold every
    * union-read subdir, prune every snapshot subdir, both at the same
    * watermark. Subdirs that do not exist yet (a stream that never saw
    * eval rows never creates `evsh/`) are skipped.
    *
    * @return (partitions folded, snapshots pruned)
    */
  def maintain(spark: SparkSession, statePath: String, twin: String,
               watermark: Long, filesPerFold: Int = 1): (Int, Int) = {
    val (foldDirs, pruneDirs) = shapesOf(twin)
    def existing(names: Seq[String]): Seq[String] =
      names.map(n => s"$statePath/$n").filter(isDir)
    val folded = existing(foldDirs)
      .map(compactState(spark, _, watermark, filesPerFold)).sum
    val pruned = existing(pruneDirs).map(pruneSnapshots(_, watermark)).sum
    (folded, pruned)
  }

  private def shapesOf(twin: String): (Seq[String], Seq[String]) =
    TwinStateShapes.getOrElse(twin,
      throw new IllegalArgumentException(
        s"StateMaintenance: unknown twin '$twin' — known: " +
          TwinStateShapes.keys.toSeq.sorted.mkString(", ")))

  /** Wrap a twin's `applyBatch` step so the stream maintains its own
    * state — the one hook every twin's `start()` routes through:
    *
    *   1. [[recover]] BEFORE the step, every batch: no batch can read
    *      state while a crashed fold sits half-rolled-forward (cheap
    *      when healthy — two existence checks per state dir);
    *   2. the twin's own step;
    *   3. every `maintainEvery`-th batch, [[maintain]] at the
    *      watermark the checkpoint's own commits log proves safe
    *      ([[committedWatermark]]). Safe inside foreachBatch: the
    *      current batch has not committed, so the watermark is always
    *      <= it, and no other batch is in flight.
    *
    * `maintainEvery <= 0` disables step 3 (recovery still runs — a
    * stream restarted WITHOUT maintenance after a crash mid-fold must
    * still see whole state). COST: a fold rewrites the folded data, so
    * pick a cadence that amortizes it — hundreds of batches at
    * production trigger rates; 1 is a spec setting. `filesPerFold` is
    * the [[compactState]] knob: leave 1 for sliver-sized state, raise
    * it for retained-corpus-sized dirs (CurateStream `docs/`).
    */
  def selfMaintaining(twin: String, statePath: String,
                      checkpointDir: String, maintainEvery: Int,
                      filesPerFold: Int = 1)
                     (step: (DataFrame, Long) => Unit)
                     : (DataFrame, Long) => Unit = {
    shapesOf(twin) // unknown twin fails at wiring time, not mid-stream
    (batch: DataFrame, batchId: Long) => {
      recover(statePath, twin)
      step(batch, batchId)
      if (maintainEvery > 0 && batchId % maintainEvery == 0) {
        val wm = committedWatermark(checkpointDir)
        if (wm > 0)
          maintain(batch.sparkSession, statePath, twin, wm, filesPerFold)
      }
    }
  }
}
