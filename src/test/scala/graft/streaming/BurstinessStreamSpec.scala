package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X130 streaming form: online word-dispersion moments — every batch's
  * snapshot equals the batch operator over everything seen so far
  * (full snapshot equality, not just per-batch rows), and a replayed
  * batch is idempotent.
  */
class BurstinessStreamSpec extends SparkSpec {

  import spark.implicits._

  private val batch0 = Seq((1L, "a a b b b b c"), (2L, "a a c"))
  private val batch1 = Seq((3L, "c"), (4L, "c"),
    (5L, null.asInstanceOf[String]))

  private def run(statePath: String, rows: Seq[(Long, String)],
                  batchId: Long): Unit =
    BurstinessStream.applyBatch(statePath, "doc_id", "text", minDf = 1L)(
      rows.toDF("doc_id", "text"), batchId)

  private def snap(statePath: String) =
    BurstinessStream.latest(spark, statePath)
      .orderBy("w").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  private def batchOp(rows: Seq[(Long, String)]) =
    graft.ops.CorpusStats.burstiness(rows.toDF("doc_id", "text"),
      "doc_id", "text", minDf = 1L)
      .orderBy("w").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("every batch's snapshot equals the batch operator over all " +
    "documents so far (moments merge by addition)") {
    val state = tmpDir("burst-snap")
    run(state, batch0, 0L)
    assert(snap(state) === batchOp(batch0))
    run(state, batch1, 1L)
    // the CorpusStatsSpec hand fixture: a -> 1e6, b -> 3e6, c -> 0
    val full = batchOp(batch0 ++ batch1)
    assert(snap(state) === full)
    assert(full === Seq(
      ("a", 2L, 4L, 1000000L),
      ("b", 1L, 4L, 3000000L),
      ("c", 4L, 4L, 0L)))
  }

  test("replaying a batch rewrites identical partitions (exactly-once)") {
    val state = tmpDir("burst-replay")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    run(state, batch1, 1L) // at-least-once
    assert(snap(state) === before)
  }

  test("end-to-end through a streaming query over MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val state = tmpDir("burst-e2e")
    val in = MemoryStream[(Long, String)]
    in.addData(batch0: _*)
    val q = BurstinessStream.start(in.toDF().toDF("doc_id", "text"),
      state, "doc_id", "text", 1L, tmpDir("burst-ckpt"))
    assert(q.awaitTermination(60000), "streaming query did not terminate")
    assert(snap(state) === batchOp(batch0))
  }
}
