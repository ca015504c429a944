package graft.streaming

import java.io.File

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
  * Two state shapes, two maintenance moves (both already proven
  * in-repo for other tables):
  *
  *  - UNION-READ state (index rows, additive count/moment deltas,
  *    emitted ledgers — everything consumed through
  *    [[DedupStream.readState]] or a union-all external accessor):
  *    [[compactState]] folds every `0 <= batch_id < watermark`
  *    partition (plus any previous fold) into the `batch_id=-1`
  *    SENTINEL partition — the [[Pump.compact]] contract. The sentinel
  *    keeps partition depth uniform (mixed layouts break discovery),
  *    and `-1 < N` for every real batch, so every strict `batch_id < N`
  *    read naturally includes it: readers need NO change. Unlike the
  *    sink fold, state rows are NOT deduplicated — additive deltas
  *    from different batches are distinct contributions even when
  *    bit-identical (two batches can each contribute `(word, n=5)`),
  *    whereas sink rows carry unique mids. Replay safety comes from
  *    the WATERMARK RULE below, not from dedup.
  *
  *  - SNAPSHOT state (each batch overwrites a FULL answer; only the
  *    max batch_id is ever read, via [[DedupStream.latestSnapshot]]):
  *    [[pruneSnapshots]] deletes superseded `batch_id < watermark`
  *    partitions — the [[CdcApplyStream]] retention contract. The
  *    latest snapshot always survives (the watermark clamps to it).
  *
  * THE WATERMARK RULE — never fold or prune a batch that an in-flight
  * replay could still rewrite. A `foreachBatch` replay re-runs only
  * batches NOT yet committed in the streaming checkpoint; a replayed
  * batch N (a) re-reads strictly `batch_id < N` and (b) overwrites its
  * own `batch_id=N` partition. Folding a batch that can still replay
  * breaks both: its rows would sit in the sentinel (which every read
  * includes) AND reappear in the recreated live partition — duplicates
  * — and the sentinel would leak batches >= N into the replay's input.
  * With `watermark <= smallest replayable batch id` neither can
  * happen: the sentinel is a strict subset of `batch_id < N` for every
  * replayable N, and no folded partition is ever rewritten.
  * [[committedWatermark]] derives the safe value from the query's own
  * checkpoint (last committed batch + 1). Like [[Pump.compact]], run
  * maintenance from a schedule BETWEEN micro-batches (or with the
  * stream paused): the swap has a brief window where a concurrent
  * reader would see the table mid-rename.
  */
object StateMaintenance {

  private def rm(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
  }

  /** Resolve a state path to a LOCAL directory, loudly. The fold/prune
    * commit protocol is built on atomic local renames (`File.renameTo`);
    * on an `hdfs://` or `s3a://` path `File` operations would silently
    * see an empty directory — maintenance would no-op forever while
    * partition counts grow unbounded, and existence probes would
    * spuriously fail. Until the protocol goes through Hadoop
    * `FileSystem` (object stores have no atomic rename, so that port
    * needs a different commit point anyway), reject remote schemes at
    * the door. Plain paths and `file:` URIs are accepted.
    */
  private[streaming] def localRoot(dir: String): File = {
    if (dir.startsWith("file:")) new File(new java.net.URI(dir))
    else {
      require(!dir.matches("^[A-Za-z][A-Za-z0-9+.\\-]*://.*"),
        s"StateMaintenance: '$dir' has a remote scheme — the rename-" +
          "based fold/prune commit requires a local filesystem (plain " +
          "path or file: URI); remote state needs a FileSystem-native " +
          "commit protocol, not a silent no-op")
      new File(dir)
    }
  }

  /** Probe-and-repair one state dir for an interrupted fold, keyed on
    * the commit point exactly as [[compactState]]'s doc describes:
    * `.compact_tmp` present = not committed → restore the moved-away
    * originals and drop the incomplete fold; tmp absent but
    * `.compact_old` present = committed → discard the superseded
    * originals (restoring them would double-count). Idempotent and
    * cheap when healthy (two existence checks).
    *
    * @return true when a marker was found and repaired
    */
  private[streaming] def recoverDir(root: File): Boolean = {
    val tmp = new File(root, ".compact_tmp")
    val bak = new File(root, ".compact_old")
    if (tmp.exists()) {
      Option(bak.listFiles()).getOrElse(Array.empty).foreach { p =>
        require(p.renameTo(new File(root, p.getName)),
          s"compactState recovery: restore $p failed")
      }
      rm(tmp); rm(bak); true
    } else if (bak.exists()) { rm(bak); true }
    else false
  }

  /** Repair every interrupted fold under a twin's state root. MUST run
    * before a batch READS state, not merely before the next fold: a
    * fold that died in its move-away window leaves live partitions
    * hidden inside dot-prefixed dirs that partition discovery skips —
    * a replayed batch reading that state would compute wrong results
    * against near-empty tables and COMMIT them before any later
    * fold-side recovery ran. [[selfMaintaining]] calls this ahead of
    * every step; out-of-band operators restarting a twin by hand
    * should call it (or [[maintain]], which recovers per-dir) before
    * the first external state read.
    *
    * @return number of state dirs that needed repair
    */
  def recover(statePath: String, twin: String): Int = {
    val (foldDirs, _) = shapesOf(twin)
    foldDirs.map(n => new File(localRoot(statePath), n))
      .filter(_.isDirectory).count(recoverDir)
  }

  private def batchDirs(dir: File): Array[(Long, File)] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(f => (f.getName.stripPrefix("batch_id=").toLong, f))

  /** Fold all `0 <= batch_id < watermark` partitions of one UNION-READ
    * state dir (plus the previous sentinel, if any) into the
    * `batch_id=-1` sentinel. Idempotent: a re-run with the same
    * watermark finds no live partition below it and does nothing.
    *
    * CRASH RECOVERY IS AUTOMATIC ([[recoverDir]], also run ahead of
    * every batch by [[selfMaintaining]] so no read ever sees a
    * half-moved table), keyed on the COMMIT POINT — the atomic rename
    * of `.compact_tmp` to `batch_id=-1`:
    *   - `.compact_tmp` still present => the commit never happened;
    *     every original partition is intact under the root or
    *     `.compact_old` (they were only MOVED), so the moved ones are
    *     restored, the incomplete fold dropped, and this run folds
    *     fresh. This covers crashes during the tmp write, during the
    *     move-away phase, and just before the rename.
    *   - `.compact_tmp` absent but `.compact_old` present => the
    *     commit happened and only the cleanup was interrupted;
    *     `.compact_old` holds nothing but superseded originals (their
    *     rows already live in the new sentinel) and is deleted.
    *     Restoring it by hand would DOUBLE-COUNT every folded delta —
    *     which is exactly why recovery is code, not a doc instruction.
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
    val root = localRoot(dir)
    recoverDir(root)
    val tmp = new File(root, ".compact_tmp")
    val bak = new File(root, ".compact_old")
    val all = batchDirs(root)
    val folded = all.filter { case (id, _) => id >= 0 && id < watermark }
    if (folded.isEmpty) return 0
    val sentinel = all.find(_._1 == -1L).map(_._2)
    // one read spans sentinel + live-below-watermark: -1 < watermark,
    // so a single partition-pruned filter covers both. NO dropDuplicates
    // (see the object doc — delta rows are contributions, not identity).
    val rows = spark.read.parquet(dir)
      .filter(col("batch_id") < watermark)
      .drop("batch_id")
    rows.repartition(filesPerFold).write.mode("overwrite")
      .parquet(tmp.getPath)
    require(bak.mkdirs(), s"compactState: mkdir $bak failed")
    (sentinel.toSeq ++ folded.map(_._2)).foreach { p =>
      require(p.renameTo(new File(bak, p.getName)),
        s"compactState: rename away $p failed")
    }
    require(tmp.renameTo(new File(root, "batch_id=-1")),
      s"compactState: rename in $tmp failed")
    rm(bak)
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
    * anyway: it is always <= max+1 and keeps one mental model.
    *
    * @return number of snapshot partitions pruned
    */
  def pruneSnapshots(dir: String, watermark: Long): Int = {
    val all = batchDirs(localRoot(dir))
    if (all.isEmpty) return 0
    // clamp: the newest snapshot survives any watermark (a watermark of
    // lastCommitted+1 — the committedWatermark — names every committed
    // batch prunable, but the newest one IS the table's answer)
    val effective = math.min(watermark, all.map(_._1).max)
    val doomed = all.filter { case (id, _) => id >= 0 && id < effective }
    doomed.foreach { case (_, f) => rm(f) }
    doomed.length
  }

  /** The safe fold/prune watermark for a streaming query: last
    * committed batch id + 1, read from the checkpoint's `commits/`
    * log. Batches below it can never replay under this checkpoint;
    * the one batch that CAN still replay (lastCommitted + 1) stays
    * live. 0 (fold nothing) when no batch has committed yet.
    */
  def committedWatermark(checkpointDir: String): Long = {
    val d = new File(localRoot(checkpointDir), "commits")
    val ids = Option(d.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.forall(_.isDigit)).map(_.toLong)
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
    "GateAttributionStream" -> (Seq("counts"), Seq("attr")))

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
      names.map(n => s"$statePath/$n")
        .filter(p => localRoot(p).isDirectory)
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
    *      state while a crashed fold still hides partitions in its
    *      move-away window (cheap when healthy — two existence checks
    *      per state dir).
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
