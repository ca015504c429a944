package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X132 streaming form: online Dunning keyness — every batch's
  * snapshot equals the batch operator over everything seen so far
  * (full snapshot equality through the shared keynessOf kernel), and a
  * replayed batch is idempotent.
  */
class KeynessStreamSpec extends SparkSpec {

  import spark.implicits._

  private val batch0 = Seq(("g1", "a a b"))
  private val batch1 = Seq(("g2", "a c"), ("g2", null.asInstanceOf[String]),
    (null.asInstanceOf[String], "z z"))

  private def run(statePath: String, rows: Seq[(String, String)],
                  batchId: Long): Unit =
    KeynessStream.applyBatch(statePath, "lang", "text", minCount = 1L)(
      rows.toDF("lang", "text"), batchId)

  private def snap(statePath: String) =
    KeynessStream.latest(spark, statePath)
      .orderBy("grp", "w").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq

  private def batchOp(rows: Seq[(String, String)]) =
    graft.ops.CorpusStats.dunningKeyness(rows.toDF("lang", "text"),
      "lang", "text", minCount = 1L)
      .orderBy("grp", "w").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq

  test("every batch's snapshot equals the batch operator over all " +
    "documents so far (single-group batch 0 collapses to zero G2)") {
    val state = tmpDir("key-snap")
    run(state, batch0, 0L)
    assert(snap(state) === batchOp(batch0))
    assert(snap(state).forall(_._5 === 0L)) // single group: all ln(1)
    run(state, batch1, 1L)
    assert(snap(state) === batchOp(batch0 ++ batch1))
    assert(snap(state).exists(_._5 > 0L)) // two groups: real contrast
  }

  test("replaying a batch rewrites identical partitions (exactly-once)") {
    val state = tmpDir("key-replay")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    run(state, batch1, 1L) // at-least-once
    assert(snap(state) === before)
  }

  test("state maintenance: counts fold, key snapshots prune, the " +
    "stream continues on the folded state") {
    val state = tmpDir("key-maint")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    val (nFold, nPrune) =
      StateMaintenance.maintain(spark, state, "KeynessStream", 2L)
    assert(nFold === 2 && nPrune === 1)
    assert(snap(state) === before)
    val batch2 = Seq(("g1", "c c"))
    run(state, batch2, 2L)
    assert(snap(state) === batchOp(batch0 ++ batch1 ++ batch2))
  }

  test("end-to-end through a streaming query over MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val state = tmpDir("key-e2e")
    val in = MemoryStream[(String, String)]
    in.addData(batch0 ++ batch1.take(1): _*)
    val q = KeynessStream.start(in.toDF().toDF("lang", "text"),
      state, "lang", "text", 1L, tmpDir("key-ckpt"))
    assert(q.awaitTermination(60000), "streaming query did not terminate")
    assert(snap(state) === batchOp(batch0 ++ batch1.take(1)))
  }
}
