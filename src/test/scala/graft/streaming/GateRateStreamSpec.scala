package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** X133 streaming form: online Wilson-bounded gate pass rates — every
  * batch's snapshot equals the batch operator over everything seen so
  * far, and a replayed batch is idempotent.
  */
class GateRateStreamSpec extends SparkSpec {

  import spark.implicits._

  // gate at (0.5, 0.2): distinct-token texts pass, "a a a ..." fails
  private def good(seed: Int): String =
    (1 to 10).map(i => s"w${seed}_$i").mkString(" ")
  private val bad = Seq.fill(10)("a").mkString(" ")

  private val batch0 = Seq(("s1", good(1)), ("s1", bad), ("s2", good(2)))
  private val batch1 = Seq(("s1", good(3)), ("s2", bad), ("s2", bad),
    ("s3", good(4)))

  private def run(statePath: String, rows: Seq[(String, String)],
                  batchId: Long): Unit =
    GateRateStream.applyBatch(statePath, "source", "text", 0.5, 0.2)(
      rows.toDF("source", "text"), batchId)

  private def snap(statePath: String) =
    GateRateStream.latest(spark, statePath)
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq

  private def batchOp(rows: Seq[(String, String)]) =
    graft.ops.Eval.wilsonRates(
      graft.ops.Curate.gateSignals(rows.toDF("source", "text"), "text")
        .withColumn("hit", graft.ops.Curate.gatePass(0.5, 0.2)),
      "source", "hit")
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq

  test("every batch's snapshot equals the batch operator over all " +
    "documents so far (counts merge by addition)") {
    val state = tmpDir("rate-snap")
    run(state, batch0, 0L)
    assert(snap(state) === batchOp(batch0))
    run(state, batch1, 1L)
    val got = snap(state)
    assert(got === batchOp(batch0 ++ batch1))
    // the hand counts: s1 2/3 pass, s2 1/3, s3 1/1 — bounds bracket
    assert(got.map(g => (g._1, g._2, g._3)) ===
      Seq(("s1", 3L, 2L), ("s2", 3L, 1L), ("s3", 1L, 1L)))
    got.foreach { g =>
      assert(g._5 <= g._4 && g._4 <= g._6, g)
      assert(g._5 >= 0.0 && g._6 <= 1.0, g)
    }
  }

  test("replaying a batch rewrites identical partitions (exactly-once)") {
    val state = tmpDir("rate-replay")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    run(state, batch1, 1L) // at-least-once
    assert(snap(state) === before)
  }

  test("state maintenance: counts fold, rate snapshots prune, the " +
    "stream continues") {
    val state = tmpDir("rate-maint")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    val (nFold, nPrune) =
      StateMaintenance.maintain(spark, state, "GateRateStream", 2L)
    assert(nFold === 2 && nPrune === 1)
    assert(snap(state) === before)
    run(state, Seq(("s3", bad)), 2L)
    assert(snap(state) === batchOp(batch0 ++ batch1 ++ Seq(("s3", bad))))
  }

  test("end-to-end through a streaming query over MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val state = tmpDir("rate-e2e")
    val in = MemoryStream[(String, String)]
    in.addData(batch0: _*)
    val q = GateRateStream.start(in.toDF().toDF("source", "text"),
      state, "source", "text", 0.5, 0.2, tmpDir("rate-ckpt"))
    assert(q.awaitTermination(60000), "streaming query did not terminate")
    assert(snap(state) === batchOp(batch0))
  }
}
