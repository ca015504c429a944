package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X144 streaming form: online per-source gate-rule attribution —
  * every batch's snapshot equals the batch operator over everything
  * seen so far; replay idempotent; state folds mid-stream.
  */
class GateAttributionStreamSpec extends SparkSpec {

  import spark.implicits._

  private val good = (1 to 8).map(i => s"t$i").mkString(" ")
  private val repetitive = Seq.fill(8)("w").mkString(" ")

  // batch 0: source a healthy; batch 1: a starts shipping 1-token
  // fragments — too_short jumps while b stays clean
  private val batch0: Seq[(String, String)] = Seq(
    ("a", good), ("a", good + " t9"), ("b", good),
    (null.asInstanceOf[String], "dropped"))
  private val batch1: Seq[(String, String)] = Seq(
    ("a", "x"), ("a", "y"), ("a", repetitive), ("b", good + " t10"))

  private def run(statePath: String, rows: Seq[(String, String)],
                  batchId: Long): Unit =
    GateAttributionStream.applyBatch(statePath, "source", "text",
      0.5, 0.2)(rows.toDF("source", "text"), batchId)

  private def snap(statePath: String) =
    GateAttributionStream.latest(spark, statePath)
      .orderBy("src").collect().map(_.toSeq).toSeq

  private def batchOp(rows: Seq[(String, String)]) =
    graft.ops.Curate.gateAttribution(rows.toDF("source", "text"),
        "source", "text", 0.5, 0.2)
      .orderBy("src").collect().map(_.toSeq).toSeq

  test("every batch's snapshot equals the batch operator over all " +
    "docs so far; the degrading source's rule lane jumps") {
    val state = tmpDir("gas-snap")
    run(state, batch0, 0L)
    assert(snap(state) === batchOp(batch0))
    run(state, batch1, 1L)
    val s1 = snap(state)
    assert(s1 === batchOp(batch0 ++ batch1))
    val a = s1.find(_.head == "a").get
    // a: 5 docs, 2 too_short, 1 low_quality, 1 repetitive (the same
    // doc trips both quality rules), 3 failed
    assert(a === Seq("a", 5L, 2L, 1L, 1L, 3L, 600000L))
    assert(s1.find(_.head == "b").get ===
      Seq("b", 2L, 0L, 0L, 0L, 0L, 0L))
  }

  test("replaying a batch rewrites identical partitions (exactly-once)") {
    val state = tmpDir("gas-replay")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    run(state, batch1, 1L) // at-least-once
    assert(snap(state) === before)
  }

  test("state maintenance: counts fold, attr snapshots prune, the " +
    "stream continues on the folded ledger") {
    val state = tmpDir("gas-maint")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    val (nFold, nPrune) = StateMaintenance.maintain(spark, state,
      "GateAttributionStream", 2L)
    assert(nFold === 2 && nPrune === 1)
    assert(snap(state) === before)
    run(state, Seq(("c", good)), 2L)
    assert(snap(state) === batchOp(batch0 ++ batch1 :+ (("c", good))))
  }

  test("end-to-end through a self-maintaining streaming query") {
    implicit val sqlCtx = spark.sqlContext
    val state = tmpDir("gas-e2e")
    val ckpt = tmpDir("gas-ckpt")
    val in = MemoryStream[(String, String)]
    for (b <- Seq(batch0, batch1)) {
      in.addData(b)
      val q = GateAttributionStream.start(in.toDF()
          .toDF("source", "text"), state, "source", "text", 0.5, 0.2,
        ckpt, maintainEvery = 1)
      assert(q.awaitTermination(60000), "query did not terminate")
    }
    assert(snap(state) === batchOp(batch0 ++ batch1))
    assert(new java.io.File(s"$state/counts/batch_id=-1").isDirectory)
  }
}
