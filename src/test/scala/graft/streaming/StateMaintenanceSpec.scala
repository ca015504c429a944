package graft.streaming

import java.io.File

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The streaming-state compaction/retention contract (the round-14
  * scale seam): folding `batch_id < watermark` partitions into the
  * `batch_id=-1` sentinel changes NOTHING a probe, a snapshot, or a
  * replay can observe — it only bounds partition count.
  */
class StateMaintenanceSpec extends SparkSpec {

  import spark.implicits._

  // the DedupStreamSpec fixtures: 40-token texts differing only in the
  // last token near-dup at jaccard ~0.949; distinctText never collides
  private def text(tail: String): String =
    (1 to 39).map(i => s"tok$i").mkString(" ") + " " + tail
  private def distinctText(seed: Int): String =
    (1 to 40).map(i => s"other${seed}_$i").mkString(" ")

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def parts(dir: String): Set[String] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("batch_id=")).toSet

  private def pairsSet(statePath: String): Set[(Long, Long)] =
    DedupStream.pairs(spark, statePath)
      .select("d1", "d2").as[(Long, Long)].collect().toSet

  private def b0 = docs(1L -> text("tailA"), 2L -> text("tailB"),
    3L -> distinctText(1))
  private def b1 = docs(4L -> text("tailC"), 5L -> distinctText(2))
  private def b2 = docs(6L -> distinctText(3), 7L -> text("tailD"))
  private def b3 = docs(8L -> text("tailE"), 9L -> distinctText(4))

  private def dedupApply(statePath: String) =
    DedupStream.applyBatch(statePath, "doc_id", "text", 16, 4, 0.8) _

  test("index-state fold: sentinel-only layout, probe and pairs equality") {
    val control = tmpDir("sm-dedup-control")
    val folded = tmpDir("sm-dedup-folded")
    for (p <- Seq(control, folded)) {
      val apply = dedupApply(p)
      apply(b0, 0L); apply(b1, 1L); apply(b2, 2L)
    }
    val before = pairsSet(folded)
    val (nFold, nPrune) =
      StateMaintenance.maintain(spark, folded, "DedupStream", 3L)
    assert(nFold === 9) // docs, bands, pairs x 3 batches
    assert(nPrune === 0)
    for (d <- Seq("docs", "bands", "pairs"))
      assert(parts(s"$folded/$d") === Set("batch_id=-1"), d)
    assert(pairsSet(folded) === before)
    assert(pairsSet(folded) === pairsSet(control))
    // the NEXT batch probes the folded state and the live state alike
    dedupApply(control)(b3, 3L)
    dedupApply(folded)(b3, 3L)
    assert(pairsSet(folded) === pairsSet(control))
    assert(pairsSet(folded).contains((1L, 8L))) // cross-fold near-dup found
  }

  test("replay idempotence across a fold: the live batch rewrites itself") {
    val control = tmpDir("sm-replay-control")
    val folded = tmpDir("sm-replay-folded")
    for (p <- Seq(control, folded)) {
      val apply = dedupApply(p)
      apply(b0, 0L); apply(b1, 1L); apply(b2, 2L); apply(b3, 3L)
    }
    // batches 0..2 committed, batch 3 still replayable -> watermark 3
    StateMaintenance.maintain(spark, folded, "DedupStream", 3L)
    assert(parts(s"$folded/docs") === Set("batch_id=-1", "batch_id=3"))
    // at-least-once: batch 3 replays AFTER the fold — identical inputs
    // (sentinel = exactly batches < 3), identical outputs
    dedupApply(folded)(b3, 3L)
    assert(pairsSet(folded) === pairsSet(control))
    // and the stream continues over the mixed layout
    val b4 = docs(10L -> text("tailF"), 11L -> distinctText(5))
    dedupApply(control)(b4, 4L)
    dedupApply(folded)(b4, 4L)
    assert(pairsSet(folded) === pairsSet(control))
  }

  test("re-fold absorbs the existing sentinel; second run is a no-op") {
    val control = tmpDir("sm-refold-control")
    val folded = tmpDir("sm-refold-folded")
    for (p <- Seq(control, folded)) {
      val apply = dedupApply(p); apply(b0, 0L); apply(b1, 1L)
    }
    StateMaintenance.maintain(spark, folded, "DedupStream", 2L)
    for (p <- Seq(control, folded)) {
      val apply = dedupApply(p); apply(b2, 2L); apply(b3, 3L)
    }
    StateMaintenance.maintain(spark, folded, "DedupStream", 4L)
    for (d <- Seq("docs", "bands", "pairs"))
      assert(parts(s"$folded/$d") === Set("batch_id=-1"), d)
    assert(pairsSet(folded) === pairsSet(control))
    // idempotent: nothing below the watermark is live anymore
    assert(StateMaintenance.compactState(spark, s"$folded/docs", 4L) === 0)
    assert(pairsSet(folded) === pairsSet(control))
  }

  test("fold preserves bit-identical delta rows from different batches") {
    val statePath = tmpDir("sm-kl")
    val apply = UnigramKlStream.applyBatch(statePath, "grp", "text") _
    val batch = Seq(("en", "a a b"), ("fr", "x y a")).toDF("grp", "text")
    // two batches with IDENTICAL content -> identical (grp, w, c) delta
    // rows; a fold that deduplicated would halve the counts
    apply(batch, 0L); apply(batch, 1L)
    val before = UnigramKlStream.latest(spark, statePath)
      .as[(String, Long, Long, Long)].collect().toSet
    val (nFold, nPrune) =
      StateMaintenance.maintain(spark, statePath, "UnigramKlStream", 2L)
    assert(nFold === 2) // counts x 2 batches
    assert(nPrune === 1) // kl snapshot 0; snapshot 1 survives (clamp)
    assert(parts(s"$statePath/counts") === Set("batch_id=-1"))
    assert(parts(s"$statePath/kl") === Set("batch_id=1"))
    assert(UnigramKlStream.latest(spark, statePath)
      .as[(String, Long, Long, Long)].collect().toSet === before)
    // next batch accumulates ON TOP of the folded counts and still
    // equals the batch operator over everything ingested
    val batch2 = Seq(("en", "b b c"), (null: String, "zz")).toDF("grp", "text")
    apply(batch2, 2L)
    val expected = graft.ops.CorpusStats
      .unigramKl(batch.union(batch).union(batch2), "grp", "text")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(UnigramKlStream.latest(spark, statePath)
      .as[(String, Long, Long, Long)].collect().toSet === expected)
  }

  test("snapshot prune keeps the latest answer; the stream continues") {
    val control = tmpDir("sm-hll-control")
    val pruned = tmpDir("sm-hll-pruned")
    def batchOf(ids: Range) = ids.map(i => ("g" + (i % 2), "v" + i))
      .toDF("grp", "v")
    for (p <- Seq(control, pruned)) {
      val apply = HllStream.applyBatch(p, "grp", "v", 2) _
      apply(batchOf(0 until 40), 0L)
      apply(batchOf(30 until 80), 1L)
      apply(batchOf(70 until 120), 2L)
    }
    def latest(p: String) = HllStream.latest(spark, p)
      .as[(String, Long, Double)].collect().toSet
    val before = latest(pruned)
    val (nFold, nPrune) =
      StateMaintenance.maintain(spark, pruned, "HllStream", 3L)
    assert(nFold === 3) // regs x 3
    assert(nPrune === 2) // card 0, 1; 2 survives the clamp
    assert(parts(s"$pruned/card") === Set("batch_id=2"))
    assert(latest(pruned) === before)
    for (p <- Seq(control, pruned))
      HllStream.applyBatch(p, "grp", "v", 2)(batchOf(110 until 150), 3L)
    assert(latest(pruned) === latest(control))
  }

  // Hadoop FS handle for crash-window simulation — the same resolution
  // the protocol itself uses (LocalFileSystem for these plain paths)
  private def hfs(dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  // reproduce compactState's STAGE phase by hand (fold batches < wm of
  // one dir into .fold_tmp) and return the staged data-file names —
  // the building block for simulating crashes at exact protocol points
  private def stageFold(dir: String, wm: Long, files: Int): Seq[String] = {
    spark.read.parquet(dir)
      .filter($"batch_id" < wm).drop("batch_id")
      .repartition(files).write.mode("overwrite")
      .parquet(s"$dir/.fold_tmp")
    new File(s"$dir/.fold_tmp").listFiles()
      .map(_.getName).filter(n => !n.startsWith(".") && !n.startsWith("_"))
      .toSeq
  }

  test("crash BEFORE the manifest commit auto-recovers: staging is " +
    "discarded, the untouched originals fold fresh") {
    val control = tmpDir("sm-crash-control")
    val crashed = tmpDir("sm-crash-pre")
    for (p <- Seq(control, crashed)) {
      val apply = dedupApply(p); apply(b0, 0L); apply(b1, 1L)
    }
    // crash window: staging written (even a garbage half-write), no
    // manifest — the commit never happened, so the live partitions are
    // still the whole truth and staging is junk to drop
    val docs = s"$crashed/docs"
    stageFold(docs, 2L, files = 1)
    assert(new File(s"$docs/.fold_tmp").exists())
    StateMaintenance.maintain(spark, crashed, "DedupStream", 2L)
    for (d <- Seq("docs", "bands", "pairs"))
      assert(parts(s"$crashed/$d") === Set("batch_id=-1"), d)
    assert(!new File(s"$docs/.fold_tmp").exists())
    assert(pairsSet(crashed) === pairsSet(control))
    dedupApply(control)(b2, 2L)
    dedupApply(crashed)(b2, 2L)
    assert(pairsSet(crashed) === pairsSet(control))
  }

  test("crash AFTER the manifest commit auto-recovers by rolling " +
    "FORWARD: staged files land, drop-listed originals are deleted, " +
    "never restored (no double-count)") {
    val control = tmpDir("sm-crash2-control")
    val crashed = tmpDir("sm-crash2-post")
    for (p <- Seq(control, crashed)) {
      val apply = dedupApply(p); apply(b0, 0L); apply(b1, 1L)
    }
    // crash window: the manifest IS published (the commit point) but
    // the roll-forward never ran — originals still live, replacements
    // still hidden in staging
    val docs = s"$crashed/docs"
    val staged = stageFold(docs, 2L, files = 1)
    val (fs, root) = hfs(docs)
    StateMaintenance.commitManifest(fs, root, staged,
      Seq("batch_id=0", "batch_id=1"))
    assert(new File(s"$docs/.fold_manifest").exists())
    StateMaintenance.maintain(spark, crashed, "DedupStream", 2L)
    for (d <- Seq("docs", "bands", "pairs"))
      assert(parts(s"$crashed/$d") === Set("batch_id=-1"), d)
    assert(!new File(s"$docs/.fold_manifest").exists())
    assert(!new File(s"$docs/.fold_tmp").exists())
    assert(pairsSet(crashed) === pairsSet(control))
    dedupApply(control)(b2, 2L)
    dedupApply(crashed)(b2, 2L)
    assert(pairsSet(crashed) === pairsSet(control))
  }

  test("fold crashed mid-roll-forward: the wrapped step recovers " +
    "BEFORE its state reads, so the batch never sees a partial table") {
    val control = tmpDir("sm-prestep-control")
    val crashed = tmpDir("sm-prestep-crashed")
    for (p <- Seq(control, crashed)) {
      val apply = dedupApply(p); apply(b0, 0L); apply(b1, 1L)
    }
    // crash window: committed fold died half-rolled-forward — one
    // staged file already moved into the sentinel, one still hidden in
    // staging, batch_id=0 already dropped. An unrecovered read would
    // see HALF the folded docs and miss cross-batch near-dups (then
    // commit that wrong answer forever).
    val docs = s"$crashed/docs"
    val staged = stageFold(docs, 2L, files = 2)
    assert(staged.size === 2)
    val (fs, root) = hfs(docs)
    StateMaintenance.commitManifest(fs, root, staged,
      Seq("batch_id=0", "batch_id=1"))
    assert(new File(s"$docs/batch_id=-1").mkdirs())
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$docs/.fold_tmp/${staged.head}"),
      new org.apache.hadoop.fs.Path(s"$docs/batch_id=-1/${staged.head}")))
    fs.delete(new org.apache.hadoop.fs.Path(s"$docs/batch_id=0"), true)
    // the self-maintaining wrapper (maintainEvery=0: recovery still
    // runs) executes the NEXT batch — b3 holds a near-dup of doc 1,
    // findable only if the roll-forward completed before the read
    val ckpt = tmpDir("sm-prestep-ckpt")
    val wrapped = StateMaintenance.selfMaintaining("DedupStream",
      crashed, ckpt, maintainEvery = 0)(dedupApply(crashed))
    wrapped(b3, 2L)
    dedupApply(control)(b3, 2L)
    assert(pairsSet(crashed) === pairsSet(control))
    assert(pairsSet(crashed).contains((1L, 8L)))
    assert(!new File(s"$docs/.fold_tmp").exists())
    assert(!new File(s"$docs/.fold_manifest").exists())
  }

  test("an all-empty fold still publishes a readable sentinel (the " +
    "empty-write file is the manifest's one entry)") {
    val state = tmpDir("sm-empty")
    val docs = s"$state/docs"
    val like = Seq.empty[(Long, String)].toDF("doc_id", "text")
    like.write.parquet(s"$docs/batch_id=0")
    like.write.parquet(s"$docs/batch_id=1")
    assert(StateMaintenance.compactState(spark, docs, 2L) === 2)
    assert(parts(docs) === Set("batch_id=-1"))
    // schema survives (SPARK-23271 writes one empty file), reads are 0-row
    val folded = spark.read.parquet(docs)
    assert(folded.count() === 0L)
    assert(folded.columns.toSet === Set("doc_id", "text", "batch_id"))
  }

  test("re-recovery is idempotent: rolling forward twice changes nothing") {
    val control = tmpDir("sm-idem-control")
    val crashed = tmpDir("sm-idem-crashed")
    for (p <- Seq(control, crashed)) {
      val apply = dedupApply(p); apply(b0, 0L); apply(b1, 1L)
    }
    val docs = s"$crashed/docs"
    val staged = stageFold(docs, 2L, files = 1)
    val (fs, root) = hfs(docs)
    StateMaintenance.commitManifest(fs, root, staged,
      Seq("batch_id=0", "batch_id=1"))
    assert(StateMaintenance.recover(crashed, "DedupStream") === 1)
    val after = spark.read.parquet(docs).count()
    // a second recover finds healthy dirs (two existence probes, no-op)
    assert(StateMaintenance.recover(crashed, "DedupStream") === 0)
    assert(spark.read.parquet(docs).count() === after)
    assert(parts(docs) === Set("batch_id=-1"))
  }

  test("scheme-ful file:// state paths fold through the path's own " +
    "Hadoop FileSystem") {
    val control = tmpDir("sm-scheme-control")
    val local = tmpDir("sm-scheme")
    for (p <- Seq(control, local)) {
      val apply = dedupApply(p); apply(b0, 0L); apply(b1, 1L)
    }
    // same directory, addressed through an explicit file:// URI — the
    // whole fold protocol (stage, manifest commit, roll-forward) runs
    // through LocalFileSystem resolved FROM THE PATH, the exact code
    // path an hdfs:// or s3a:// state root takes on a cluster
    val (nFold, _) =
      StateMaintenance.maintain(spark, s"file://$local", "DedupStream", 2L)
    assert(nFold === 6) // docs, bands, pairs x 2 batches
    for (d <- Seq("docs", "bands", "pairs"))
      assert(parts(s"$local/$d") === Set("batch_id=-1"), d)
    assert(pairsSet(local) === pairsSet(control))
    dedupApply(control)(b2, 2L)
    dedupApply(local)(b2, 2L)
    assert(pairsSet(local) === pairsSet(control))
    // unknown twins fail at WIRING time, before any stream starts
    intercept[IllegalArgumentException] {
      StateMaintenance.selfMaintaining("NoSuchStream", local, local, 1)(
        (_, _) => ())
    }
  }

  test("committedWatermark reads the checkpoint commits log") {
    val ckpt = tmpDir("sm-ckpt")
    assert(StateMaintenance.committedWatermark(ckpt) === 0L)
    val commits = new File(ckpt, "commits")
    assert(commits.mkdirs())
    for (n <- Seq("0", "1", "2", ".tmp-noise", "metadata"))
      new File(commits, n).createNewFile()
    assert(StateMaintenance.committedWatermark(ckpt) === 3L)
  }

  test("self-maintaining CurateStream: maintainEvery folds committed " +
    "batches from inside the stream, ledger identical to unmaintained") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ledgerSet(p: String): Set[(Long, String)] =
      CurateStream.ledger(spark, p, "doc_id")
        .select("doc_id", "verdict").as[(Long, String)].collect().toSet
    def drive(maintainEvery: Int): (String, Set[(Long, String)]) = {
      val state = tmpDir(s"sm-auto-$maintainEvery")
      val ckpt = tmpDir(s"sm-auto-ckpt-$maintainEvery")
      val in = MemoryStream[(Long, String, Boolean)]
      def drain(): Unit = {
        val q = CurateStream.start(in.toDF()
            .toDF("doc_id", "text", "is_eval"), state, "doc_id", "text",
          "is_eval", 0.5, 0.2, ckpt, maintainEvery = maintainEvery)
        assert(q.awaitTermination(60000), "query did not terminate")
      }
      in.addData((1L, text("tailA"), false), (2L, text("tailB"), false))
      drain() // batch 0: nothing committed yet -> watermark 0, no fold
      in.addData((3L, text("tailC"), false), (4L, distinctText(1), false))
      drain() // batch 1: commits={0} -> watermark 1 folds batch 0
      (state, ledgerSet(state))
    }
    val (maintained, gotM) = drive(1)
    val (plain, gotP) = drive(0)
    assert(gotM === gotP)
    assert(gotM.contains((3L, "near_dup"))) // cross-batch probe intact
    // the maintained run folded batch 0 into the sentinel mid-stream
    assert(parts(s"$maintained/ledger") === Set("batch_id=-1", "batch_id=1"))
    assert(parts(s"$plain/ledger") === Set("batch_id=0", "batch_id=1"))
  }

  test("CurateStream: the five-table state folds, ledger and probe intact") {
    val control = tmpDir("sm-curate-control")
    val folded = tmpDir("sm-curate-folded")
    def apply(p: String) = CurateStream.applyBatch(p, "doc_id", "text",
      "is_eval", 0.5, 0.2) _
    def rows(r: (Long, String, Boolean)*): DataFrame =
      r.toDF("doc_id", "text", "is_eval")
    val c0 = rows((100L, distinctText(10), true),
      (1L, text("tailA"), false), (2L, text("tailB"), false),
      (3L, distinctText(1), false))
    val c1 = rows((4L, text("tailC"), false),
      (5L, distinctText(1), false), // exact dup of doc 3
      (6L, Seq.fill(30)("a").mkString(" "), false)) // gate reject
    val c2 = rows((7L, text("tailD"), false), (8L, distinctText(6), false))
    for (p <- Seq(control, folded)) {
      apply(p)(c0, 0L); apply(p)(c1, 1L)
    }
    def ledgerSet(p: String): Set[(Long, String)] =
      CurateStream.ledger(spark, p, "doc_id")
        .select("doc_id", "verdict").as[(Long, String)].collect().toSet
    val before = ledgerSet(folded)
    assert(before.contains((5L, "exact_dup")))
    assert(before.contains((4L, "near_dup")))
    assert(before.contains((6L, "gate")))
    StateMaintenance.maintain(spark, folded, "CurateStream", 2L)
    for (d <- Seq("fps", "docs", "bands", "evsh", "ledger"))
      assert(parts(s"$folded/$d") === Set("batch_id=-1"), d)
    assert(ledgerSet(folded) === before)
    // next batch probes folded fingerprints, bands, and eval shingles
    for (p <- Seq(control, folded)) apply(p)(c2, 2L)
    assert(ledgerSet(folded) === ledgerSet(control))
    assert(ledgerSet(folded).contains((7L, "near_dup")))
  }
}
