package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X131 streaming form: online per-group KL against the pooled corpus
  * — every batch's snapshot equals the batch operator over everything
  * seen so far, and a replayed batch is idempotent.
  */
class UnigramKlStreamSpec extends SparkSpec {

  import spark.implicits._

  // the CorpusStatsSpec hand fixture split across two batches
  private val batch0 = Seq(("g1", "a a b"))
  private val batch1 = Seq(("g2", "a c"), ("g2", null.asInstanceOf[String]),
    (null.asInstanceOf[String], "z z"))

  private def run(statePath: String, rows: Seq[(String, String)],
                  batchId: Long): Unit =
    UnigramKlStream.applyBatch(statePath, "lang", "text")(
      rows.toDF("lang", "text"), batchId)

  private def snap(statePath: String) =
    UnigramKlStream.latest(spark, statePath)
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  private def batchOp(rows: Seq[(String, String)]) =
    graft.ops.CorpusStats.unigramKl(rows.toDF("lang", "text"),
      "lang", "text")
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("every batch's snapshot equals the batch operator over all " +
    "documents so far (counts merge by addition; nulls excluded)") {
    val state = tmpDir("kl-snap")
    run(state, batch0, 0L)
    // single group against itself: exactly zero
    assert(snap(state) === Seq(("g1", 3L, 2L, 0L)))
    run(state, batch1, 1L)
    // the hand fixture: g1 -> 240516, g2 -> 366984 (null lang/text out)
    val full = batchOp(batch0 ++ batch1)
    assert(snap(state) === full)
    assert(full === Seq(("g1", 3L, 2L, 240516L), ("g2", 2L, 2L, 366984L)))
  }

  test("replaying a batch rewrites identical partitions (exactly-once)") {
    val state = tmpDir("kl-replay")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    run(state, batch1, 1L) // at-least-once
    assert(snap(state) === before)
  }

  test("end-to-end through a streaming query over MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val state = tmpDir("kl-e2e")
    val in = MemoryStream[(String, String)]
    in.addData(batch0 ++ batch1.take(1): _*)
    val q = UnigramKlStream.start(in.toDF().toDF("lang", "text"),
      state, "lang", "text", tmpDir("kl-ckpt"))
    assert(q.awaitTermination(60000), "streaming query did not terminate")
    assert(snap(state) === batchOp(batch0 ++ batch1.take(1)))
  }
}
