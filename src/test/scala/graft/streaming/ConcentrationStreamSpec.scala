package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X138 streaming form: online composition concentration — every
  * batch's 1-row snapshot equals the batch operator over everything
  * seen so far, and a replayed batch is idempotent.
  */
class ConcentrationStreamSpec extends SparkSpec {

  import spark.implicits._

  private val batch0 = (1 to 4).flatMap(s => Seq.fill(3)(s"src$s"))
    .map(Tuple1(_))
  private val batch1 = Seq.fill(12)("src1").map(Tuple1(_)) ++
    Seq(Tuple1(null: String))

  private def run(statePath: String, rows: Seq[Tuple1[String]],
                  batchId: Long): Unit =
    ConcentrationStream.applyBatch(statePath, "source")(
      rows.toDF("source"), batchId)

  private def snap(statePath: String) =
    ConcentrationStream.latest(spark, statePath).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  private def batchOp(rows: Seq[Tuple1[String]]) =
    graft.ops.Report.sourceConcentration(rows.toDF("source"), "source")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  test("every batch's snapshot equals the batch operator; dominance " +
    "shows as an HHI/top-share jump") {
    val state = tmpDir("conc-snap")
    run(state, batch0, 0L)
    val s0 = snap(state)
    assert(s0 === batchOp(batch0))
    assert(s0 === Seq((4L, 12L, 250000L, 0L, 250000L))) // even corpus
    run(state, batch1, 1L)
    val s1 = snap(state)
    assert(s1 === batchOp(batch0 ++ batch1))
    // src1 now holds 15/24: concentration and inequality both jump
    assert(s1.head._3 > 250000L && s1.head._4 > 0L)
    assert(s1.head._5 === 625000L)
  }

  test("replaying a batch rewrites identical partitions (exactly-once)") {
    val state = tmpDir("conc-replay")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    run(state, batch1, 1L) // at-least-once
    assert(snap(state) === before)
  }

  test("state maintenance: counts fold, conc snapshots prune, the " +
    "stream continues") {
    val state = tmpDir("conc-maint")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    val (nFold, nPrune) =
      StateMaintenance.maintain(spark, state, "ConcentrationStream", 2L)
    assert(nFold === 2 && nPrune === 1)
    assert(snap(state) === before)
    run(state, Seq(Tuple1("src9")), 2L)
    assert(snap(state) === batchOp(batch0 ++ batch1 ++ Seq(Tuple1("src9"))))
  }

  test("end-to-end through a streaming query over MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val state = tmpDir("conc-e2e")
    val in = MemoryStream[String]
    in.addData(batch0.map(_._1): _*)
    val q = ConcentrationStream.start(in.toDF().toDF("source"),
      state, "source", tmpDir("conc-ckpt"))
    assert(q.awaitTermination(60000), "streaming query did not terminate")
    assert(snap(state) === batchOp(batch0))
  }
}
