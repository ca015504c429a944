package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X154 streaming form: online inter-gate agreement — every batch's
  * snapshot equals the batch operator over everything seen so far;
  * replay idempotent; state folds mid-stream.
  */
class GateAgreementStreamSpec extends SparkSpec {

  import spark.implicits._

  // (source, text, aug) — A = curate gate on text, B = PII-clean on aug
  private val batch0: Seq[(String, String, String)] = Seq(
    ("a", "a b c d", "clean"),            // A pass, B pass
    ("a", "a a a a", "ip 1.2.3.4 x"),     // A fail, B fail
    ("b", "p q r", "also clean"),         // A pass, B pass
    (null.asInstanceOf[String], "x y", "z")) // excluded
  private val batch1: Seq[(String, String, String)] = Seq(
    ("a", "e f g h", "mail x@y.io ok"),   // A pass, B fail
    ("b", "b b b b", "fine"),             // A fail, B pass
    ("c", null, null),                    // both fail closed
    ("c", "m n o", "c 415-555-0199 z"))   // A pass, B fail

  private def run(statePath: String,
                  rows: Seq[(String, String, String)],
                  batchId: Long): Unit =
    GateAgreementStream.applyBatch(statePath, "source", "text", "aug",
      0.5, 0.2)(rows.toDF("source", "text", "aug"), batchId)

  private def snap(statePath: String) =
    GateAgreementStream.latest(spark, statePath)
      .orderBy("src").collect().map(_.toSeq).toSeq

  private def batchOp(rows: Seq[(String, String, String)]) =
    graft.ops.Agreement.gatePiiAgreement(
        rows.toDF("source", "text", "aug"), "source", "text", "aug",
        0.5, 0.2)
      .orderBy("src").collect().map(_.toSeq).toSeq

  test("every batch's snapshot equals the batch operator over all " +
    "docs so far; the derived kappa/McNemar lanes re-derive, never " +
    "accumulate") {
    val state = tmpDir("gagr-snap")
    run(state, batch0, 0L)
    assert(snap(state) === batchOp(batch0))
    run(state, batch1, 1L)
    val s1 = snap(state)
    assert(s1 === batchOp(batch0 ++ batch1))
    // a: n=3 a1=2 b1=1 n11=1 -> agree 2/3, pe_num = 2+2 = 4:
    // kappa = (9*2/3... = (3*2-4)*1e6/(9-4) = 400000
    assert(s1.find(_.head == "a").get === Seq("a", 3L, 2L, 1L, 1L,
      1L, 0L, 666666L, 444444L, 400000L, 1000000L))
  }

  test("replaying a batch rewrites identical partitions (exactly-once)") {
    val state = tmpDir("gagr-replay")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    run(state, batch1, 1L) // at-least-once
    assert(snap(state) === before)
  }

  test("state maintenance: counts fold, agree snapshots prune, the " +
    "stream continues on the folded ledger") {
    val state = tmpDir("gagr-maint")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    val (nFold, nPrune) = StateMaintenance.maintain(spark, state,
      "GateAgreementStream", 2L)
    assert(nFold === 2 && nPrune === 1)
    assert(snap(state) === before)
    val more = Seq(("d", "q r s t", "clean tail"))
    run(state, more, 2L)
    assert(snap(state) === batchOp(batch0 ++ batch1 ++ more))
  }

  test("end-to-end through a self-maintaining streaming query") {
    implicit val sqlCtx = spark.sqlContext
    val state = tmpDir("gagr-e2e")
    val ckpt = tmpDir("gagr-ckpt")
    val in = MemoryStream[(String, String, String)]
    for (b <- Seq(batch0, batch1)) {
      in.addData(b)
      val q = GateAgreementStream.start(in.toDF()
          .toDF("source", "text", "aug"), state, "source", "text",
        "aug", 0.5, 0.2, ckpt, maintainEvery = 1)
      assert(q.awaitTermination(60000), "query did not terminate")
    }
    assert(snap(state) === batchOp(batch0 ++ batch1))
    assert(new java.io.File(s"$state/counts/batch_id=-1").isDirectory)
  }
}
