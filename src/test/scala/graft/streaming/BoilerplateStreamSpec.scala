package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** X128 streaming form: online line-frequency boilerplate removal —
  * one batch reduces to the batch operator, frequencies accumulate
  * across batches point-in-time, and a replayed batch is idempotent.
  */
class BoilerplateStreamSpec extends SparkSpec {

  import spark.implicits._

  private val Ppm = 600000L // removal at df >= 60% of docs seen so far

  private def run(statePath: String, rows: Seq[(Long, String)],
                  batchId: Long): Unit =
    BoilerplateStream.applyBatch(statePath, "doc_id", "text", Ppm)(
      rows.toDF("doc_id", "text"), batchId)

  private def out(statePath: String) =
    BoilerplateStream.ledger(spark, statePath)
      .select("doc_id", "n_lines", "n_removed", "cleaned")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq

  test("a single batch equals the batch operator exactly") {
    val rows = Seq((1L, "x\nFOOT"), (2L, "FOOT\ny"), (3L, "z"))
    val state = tmpDir("boiler-single")
    run(state, rows, 0L)
    val expected = graft.ops.Boilerplate
      .removeFrequentLines(rows.toDF("doc_id", "text"), "doc_id", "text", Ppm)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    // df(FOOT) = 2/3 >= 60% -> removed on both paths
    assert(expected.map(_._3).sum === 2L)
    assert(out(state) === expected)
  }

  test("frequencies accumulate point-in-time: a line crossing the " +
    "threshold cleans LATER batches, never the emitted ledger") {
    val state = tmpDir("boiler-cross")
    // batch 0: df(FOOT) = 1/2 = 50% < 60% -> kept
    run(state, Seq((1L, "x\nFOOT"), (2L, "y")), 0L)
    assert(out(state) === Seq((1L, 2L, 0L, "x\nFOOT"), (2L, 1L, 0L, "y")))
    // batch 1: accumulated df(FOOT) = 3/4 = 75% >= 60% -> removed from
    // batch 1's docs; batch 0's ledger rows stay as emitted
    run(state, Seq((3L, "FOOT\nz"), (4L, "FOOT")), 1L)
    assert(out(state) === Seq(
      (1L, 2L, 0L, "x\nFOOT"), (2L, 1L, 0L, "y"),
      (3L, 2L, 1L, "z"), (4L, 1L, 1L, "")))
  }

  test("replaying a batch rewrites identical partitions (exactly-once)") {
    val state = tmpDir("boiler-replay")
    run(state, Seq((1L, "x\nFOOT"), (2L, "y")), 0L)
    run(state, Seq((3L, "FOOT\nz"), (4L, "FOOT")), 1L)
    val before = out(state)
    run(state, Seq((3L, "FOOT\nz"), (4L, "FOOT")), 1L) // at-least-once
    assert(out(state) === before)
    // state did not double-count: a 5th doc still sees df(FOOT) = 3/5
    run(state, Seq((5L, "FOOT\nw")), 2L)
    assert(out(state).last === (5L, 2L, 1L, "w"))
  }

  test("end-to-end through a streaming query over MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val state = tmpDir("boiler-e2e")
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "x\nFOOT"), (2L, "FOOT\ny"), (3L, "z"))
    val q = BoilerplateStream.start(in.toDF().toDF("doc_id", "text"),
      state, "doc_id", "text", Ppm, tmpDir("boiler-ckpt"))
    assert(q.awaitTermination(60000), "streaming query did not terminate")
    assert(out(state).map(_._3).sum === 2L)
  }
}
