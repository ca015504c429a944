package graft.streaming

import java.io.File
import java.util.concurrent.atomic.AtomicReference

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** The external-reader contract (round-17 verdict item 2, absorbed in
  * round 18): every twin accessor routes through
  * [[StateMaintenance.stableRead]], so an out-of-band reader polling a
  * live twin NEVER sees a transient failure from concurrent
  * maintenance — the race is absorbed by the library, not documented
  * onto the dashboard author.
  */
class StableReadSpec extends SparkSpec {

  import spark.implicits._

  private def writeBatch(dir: String, id: Long, rows: Seq[Long]): Unit =
    rows.toDF("n").write.mode("overwrite").parquet(s"$dir/batch_id=$id")

  test("ignoreMissingFiles is load-bearing: a file dropped after " +
    "listing is skipped, not fatal — and the plain read does fail") {
    val dir = tmpDir("stable-imf")
    (1L to 400L).toDF("n").repartition(4).write.mode("overwrite")
      .parquet(dir)
    def someDataFile(): File =
      new File(dir).listFiles().filter(f => f.isFile &&
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head

    // control: the vanilla read lists eagerly; dropping a listed file
    // before the action fails the query (this is the race the
    // accessors used to push onto callers)
    val plain = spark.read.parquet(dir)
    assert(someDataFile().delete())
    intercept[Exception] { plain.count() }

    // stableRead: same drop pattern, the action survives (the option
    // is RELATION-scoped so it travels with the frame into any caller
    // composition — no session conf involved)
    val dir2 = tmpDir("stable-imf2")
    (1L to 400L).toDF("n").repartition(4).write.mode("overwrite")
      .parquet(dir2)
    val stable = StateMaintenance.stableRead(spark, dir2)
    val doomed = new File(dir2).listFiles().filter(f => f.isFile &&
      f.getName.startsWith("part-")).head
    assert(doomed.delete())
    val n = stable.count()
    assert(n < 400L) // the dropped file's rows are skipped, not fatal
  }

  test("marker wait: a committed-but-unrolled fold is waited out, and " +
    "the read that follows sees the WHOLE folded table") {
    val dir = tmpDir("stable-marker")
    writeBatch(dir, 0L, 1L to 10L)
    writeBatch(dir, 1L, 11L to 20L)
    // reproduce the committed-but-not-rolled-forward window by hand:
    // stage the fold, publish the manifest, do NOT roll forward
    val (fs, root) = StateMaintenance.fsRoot(dir)
    val tmp = new Path(root, ".fold_tmp")
    spark.read.parquet(dir).filter($"batch_id" < 2).drop("batch_id")
      .repartition(1).write.mode("overwrite").parquet(tmp.toString)
    val staged = fs.listStatus(tmp).map(_.getPath.getName)
      .filter(n => !n.startsWith(".") && !n.startsWith("_")).toSeq
    StateMaintenance.commitManifest(fs, root, staged,
      Seq("batch_id=0", "batch_id=1"))
    // a maintenance thread completes the fold shortly after
    val t = new Thread(() => {
      Thread.sleep(600)
      StateMaintenance.recoverDir(fs, root)
    })
    t.start()
    val got = StateMaintenance.stableRead(spark, dir)
    t.join()
    // the read waited: by the time it returned, no marker remained
    assert(!fs.exists(new Path(root, ".fold_manifest")))
    assert(got.drop("batch_id").as[Long].collect().sorted
      === (1L to 20L).toArray)
    // and the fold really happened (sentinel-only layout)
    assert(new File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("batch_id=")).toSet === Set("batch_id=-1"))
  }

  test("accessor loop never surfaces a transient failure while folds " +
    "run concurrently (the verdict's done-condition)") {
    val dir = tmpDir("stable-race")
    writeBatch(dir, 0L, 1L to 50L)
    val writerFailure = new AtomicReference[Throwable](null)
    val writer = new Thread(() => {
      try {
        var next = 1L
        while (next <= 8L) {
          writeBatch(dir, next, (next * 50L + 1L) to (next * 50L + 50L))
          StateMaintenance.compactState(spark, dir, next + 1L)
          next += 1L
        }
      } catch { case e: Throwable => writerFailure.set(e) }
    })
    writer.start()
    var reads = 0
    while (writer.isAlive) {
      // must never throw — marker wait + retry + ignoreMissingFiles
      val c = StateMaintenance.stableRead(spark, dir).count()
      assert(c <= 450L)
      reads += 1
    }
    writer.join()
    assert(writerFailure.get() === null, String.valueOf(writerFailure.get()))
    assert(reads > 0)
    assert(StateMaintenance.stableRead(spark, dir).count() === 450L)
  }

  test("CdcApplyStream.snapshot re-probes across the swap window: " +
    "pointers missing but a version committed resolves once the " +
    "writer's swap lands") {
    val dir = tmpDir("stable-cdc-window")
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$dir/v=0")
    val (fs, root) = StateMaintenance.fsRoot(dir)
    // neither pointer exists yet — exactly the both-probes-miss window
    val t = new Thread(() => {
      Thread.sleep(150)
      val out = fs.create(new Path(root, "_LATEST"), true)
      try out.write("0".getBytes("UTF-8")) finally out.close()
    })
    t.start()
    val snap = CdcApplyStream.snapshot(spark, dir)
    t.join()
    assert(snap.count() === 1L)
  }

  test("CdcApplyStream.snapshot genuinely-empty state throws at once " +
    "(no retry tax on the legitimate no-batch-yet case)") {
    val dir = tmpDir("stable-cdc-empty")
    val t0 = System.nanoTime()
    intercept[IllegalStateException] {
      CdcApplyStream.snapshot(spark, dir)
    }
    assert((System.nanoTime() - t0) / 1e6 < 400.0)
  }

  test("CdcApplyStream.snapshot under a hammering pointer swap: " +
    "a concurrent reader always resolves a committed version") {
    val dir = tmpDir("stable-cdc-hammer")
    Seq((1L, "seed")).toDF("k", "v").write.parquet(s"$dir/v=0")
    val (fs, root) = StateMaintenance.fsRoot(dir)
    def writePointer(name: String, v: Long): Unit = {
      val out = fs.create(new Path(root, name), true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    }
    writePointer("_LATEST", 0L)
    val writerFailure = new AtomicReference[Throwable](null)
    val writer = new Thread(() => {
      try {
        (1L to 12L).foreach { v =>
          Seq((v, s"row$v")).toDF("k", "v").write.parquet(s"$dir/v=$v")
          // the exact applyBatch swap: tmp whole, delete, rename
          writePointer("_LATEST.tmp", v)
          fs.delete(new Path(root, "_LATEST"), false)
          assert(fs.rename(new Path(root, "_LATEST.tmp"),
            new Path(root, "_LATEST")))
          Thread.sleep(10)
        }
      } catch { case e: Throwable => writerFailure.set(e) }
    })
    writer.start()
    var reads = 0
    while (writer.isAlive) {
      val rows = CdcApplyStream.snapshot(spark, dir).collect()
      assert(rows.length === 1) // every version is a 1-row table
      reads += 1
    }
    writer.join()
    assert(writerFailure.get() === null, String.valueOf(writerFailure.get()))
    assert(reads > 0)
  }
}
