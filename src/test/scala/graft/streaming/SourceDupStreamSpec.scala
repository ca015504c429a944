package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X139 streaming form: online per-source near-dup participation —
  * every batch's snapshot equals the batch operator (sourceDupRate
  * with the pairs the batch LSH would find) over everything seen so
  * far; replay idempotent; state folds mid-stream.
  */
class SourceDupStreamSpec extends SparkSpec {

  import spark.implicits._

  // the DedupStreamSpec fixtures: tail-variant texts near-dup at
  // jaccard ~0.949; distinctText never collides
  private def text(tail: String): String =
    (1 to 39).map(i => s"tok$i").mkString(" ") + " " + tail
  private def distinctText(seed: Int): String =
    (1 to 40).map(i => s"other${seed}_$i").mkString(" ")

  // crawlA self-copies from batch 0; crawlB starts clean and catches
  // a cross-batch near-dup in batch 1; a null source pins the kernel's
  // x131 rule through the streaming seam
  private val batch0: Seq[(Long, String, String)] = Seq(
    (1L, text("tailA"), "crawlA"), (2L, distinctText(1), "crawlB"),
    (3L, text("tailB"), "crawlA"), (7L, distinctText(4), null))
  private val batch1: Seq[(Long, String, String)] = Seq(
    (4L, text("tailC"), "crawlB"), (5L, distinctText(2), "crawlB"))
  private val batch2: Seq[(Long, String, String)] = Seq(
    (6L, distinctText(3), "crawlC"))

  private def run(statePath: String, rows: Seq[(Long, String, String)],
                  batchId: Long): Unit =
    SourceDupStream.applyBatch(statePath, "doc_id", "text", "source")(
      rows.toDF("doc_id", "text", "source"), batchId)

  private def snap(statePath: String): Seq[(String, Long, Long, Long)] =
    SourceDupStream.latest(spark, statePath)
      .orderBy("src").as[(String, Long, Long, Long)].collect().toSeq

  private def batchOp(rows: Seq[(Long, String, String)])
      : Seq[(String, Long, Long, Long)] = {
    val docs = rows.toDF("doc_id", "text", "source")
    graft.ops.Dedup.sourceDupRate(docs,
        graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text",
          16, 4, 0.8).select("d1", "d2"), "doc_id", "source")
      .orderBy("src").as[(String, Long, Long, Long)].collect().toSeq
  }

  test("every batch's snapshot equals the batch operator over all " +
    "docs so far; the self-copying source's dup_ppm jumps") {
    val state = tmpDir("sdr-snap")
    run(state, batch0, 0L)
    val s0 = snap(state)
    assert(s0 === batchOp(batch0))
    val by0 = s0.map(r => r._1 -> r._4).toMap
    assert(by0("crawlA") === 1000000L) // both members of the pair
    assert(by0("crawlB") === 0L)
    assert(!by0.contains(null)) // x131: the null-source doc is excluded
    run(state, batch1, 1L)
    val s1 = snap(state)
    assert(s1 === batchOp(batch0 ++ batch1))
    // doc 4 near-dups the CROSS-BATCH family of docs 1/3
    val by1 = s1.map(r => r._1 -> r._4).toMap
    assert(by1("crawlB") === 333333L) // 1 of 3 docs participates
    run(state, batch2, 2L)
    assert(snap(state) === batchOp(batch0 ++ batch1 ++ batch2))
  }

  test("replaying a batch rewrites identical partitions (exactly-once)") {
    val state = tmpDir("sdr-replay")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    run(state, batch1, 1L) // at-least-once
    assert(snap(state) === before)
  }

  test("state maintenance: the four delta dirs fold, dup snapshots " +
    "prune, the stream continues over the folded index") {
    val state = tmpDir("sdr-maint")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    val (nFold, nPrune) =
      StateMaintenance.maintain(spark, state, "SourceDupStream", 2L)
    assert(nFold === 8) // docs, bands, pairs, src x 2 batches
    assert(nPrune === 1) // dup snapshot 0; snapshot 1 survives
    assert(snap(state) === before)
    // a near-dup of the FOLDED family is still caught post-fold
    val b2 = batch2 :+ ((8L, text("tailD"), "crawlC"))
    run(state, b2, 2L)
    assert(snap(state) === batchOp(batch0 ++ batch1 ++ b2))
    assert(snap(state).map(r => r._1 -> r._4).toMap
      .apply("crawlC") === 500000L)
  }

  test("end-to-end through a self-maintaining streaming query") {
    implicit val sqlCtx = spark.sqlContext
    val state = tmpDir("sdr-e2e")
    val ckpt = tmpDir("sdr-ckpt")
    val in = MemoryStream[(Long, String, String)]
    for (b <- Seq(batch0, batch1, batch2)) {
      in.addData(b)
      val q = SourceDupStream.start(in.toDF()
          .toDF("doc_id", "text", "source"), state, "doc_id", "text",
        "source", ckpt, maintainEvery = 1)
      assert(q.awaitTermination(60000), "query did not terminate")
    }
    assert(snap(state) === batchOp(batch0 ++ batch1 ++ batch2))
    // the stream folded its own state mid-run
    assert(new java.io.File(s"$state/src/batch_id=-1").isDirectory)
  }
}
