package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** X127 streaming form: online word-frequency subsampling — one batch
  * reduces to the batch operator, frequencies accumulate across
  * batches point-in-time, and a replayed batch is idempotent.
  */
class SubsampleStreamSpec extends SparkSpec {

  import spark.implicits._

  private val TPpm = 100000L // t = 0.1: the flood word below damps hard
  private val Seed = "ss"

  // doc 1 floods "the" (30 occurrences of ~40 tokens); docs 2-3 are
  // rare-word-only (every count 1-2 -> r >= 1 -> p = 1 -> kept whole)
  private def flood(n: Int) = (1 to n).map(_ => "the").mkString(" ")
  private val batch0 = Seq(
    (1L, flood(30) + " alpha beta gamma delta epsilon"),
    (2L, "zeta eta theta iota"),
    (3L, "kappa lambda mu"))
  private val batch1 = Seq(
    (4L, flood(20) + " nu xi"),
    (5L, "omicron pi rho"))

  private def run(statePath: String, rows: Seq[(Long, String)],
                  batchId: Long): Unit =
    SubsampleStream.applyBatch(statePath, "doc_id", "text", TPpm, Seed)(
      rows.toDF("doc_id", "text"), batchId)

  private def out(statePath: String) =
    SubsampleStream.ledger(spark, statePath)
      .select("doc_id", "n_tokens", "n_kept", "sub_text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq

  private def batchOp(rows: Seq[(Long, String)]) =
    graft.ops.Sample.freqSubsample(rows.toDF("doc_id", "text"),
      "doc_id", "text", TPpm, Seed)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq

  test("a single batch equals the batch operator exactly") {
    val state = tmpDir("sub-single")
    run(state, batch0, 0L)
    val expected = batchOp(batch0)
    // the flood word actually dropped occurrences on both paths
    assert(expected.head._3 < expected.head._2)
    assert(out(state) === expected)
  }

  test("rare-word batches pass through whole (p = 1 exactly)") {
    val state = tmpDir("sub-rare")
    run(state, batch0.drop(1), 0L)
    assert(out(state) === Seq(
      (2L, 4L, 4L, "zeta eta theta iota"),
      (3L, 3L, 3L, "kappa lambda mu")))
  }

  test("frequencies accumulate point-in-time: batch 1 is sampled " +
    "against batch-0 AND batch-1 counts; batch 0's ledger is fixed") {
    val state = tmpDir("sub-cross")
    run(state, batch0, 0L)
    val ledger0 = out(state)
    run(state, batch1, 1L)
    // batch 1's expected rows: the shared kernel driven by the counts
    // of batches 0+1 — pins the state read + additive merge
    val toks1 = graft.ops.Sample.tokenize(
      batch1.toDF("doc_id", "text"), "doc_id", "text")
    val accCounts = graft.ops.Sample.tokenize(
      (batch0 ++ batch1).toDF("doc_id", "text"), "doc_id", "text")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val expected1 = graft.ops.Sample.subsampleTokens(toks1, "doc_id",
      accCounts, TPpm, Seed)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    // and it must DIFFER from sampling batch 1 in isolation ("the" is
    // far more frequent in the accumulated corpus)
    assert(expected1 !== batchOp(batch1))
    assert(out(state) === ledger0 ++ expected1)
  }

  test("replaying a batch rewrites identical partitions (exactly-once)") {
    val state = tmpDir("sub-replay")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = out(state)
    run(state, batch1, 1L) // at-least-once
    assert(out(state) === before)
  }

  test("end-to-end through a streaming query over MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val state = tmpDir("sub-e2e")
    val in = MemoryStream[(Long, String)]
    in.addData(batch0: _*)
    val q = SubsampleStream.start(in.toDF().toDF("doc_id", "text"),
      state, "doc_id", "text", TPpm, Seed, tmpDir("sub-ckpt"))
    assert(q.awaitTermination(60000), "streaming query did not terminate")
    assert(out(state) === batchOp(batch0))
  }
}
