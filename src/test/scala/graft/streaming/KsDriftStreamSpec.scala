package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X137 streaming form: online KS drift against the accumulated pool —
  * every batch's snapshot equals the batch operator over everything
  * seen so far, and a replayed batch is idempotent.
  */
class KsDriftStreamSpec extends SparkSpec {

  import spark.implicits._

  private val batch0 = (1 to 8).map(i => ("s1", (i % 4 + 1).toLong)) ++
    (1 to 8).map(i => ("s2", (i % 4 + 1).toLong))
  private val batch1 = (1 to 8).map(i => ("s2", (i % 4 + 21).toLong)) ++
    Seq(("s3", 2L))

  private def run(statePath: String, rows: Seq[(String, Long)],
                  batchId: Long): Unit =
    KsDriftStream.applyBatch(statePath, "grp", "v")(
      rows.toDF("grp", "v"), batchId)

  private def snap(statePath: String) =
    KsDriftStream.latest(spark, statePath)
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

  private def batchOp(rows: Seq[(String, Long)]) =
    graft.ops.CorpusStats.ksDrift(rows.toDF("grp", "v"), "grp", "v")
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

  test("every batch's snapshot equals the batch operator over all " +
    "rows so far; drift emerges as a slice walks away from the pool") {
    val state = tmpDir("ks-snap")
    run(state, batch0, 0L)
    val s0 = snap(state)
    assert(s0 === batchOp(batch0))
    // identical slices: both mirror the pool exactly
    assert(s0.forall(_._3 === 0L))
    run(state, batch1, 1L)
    val s1 = snap(state)
    assert(s1 === batchOp(batch0 ++ batch1))
    // once the pool grows a high tail, BOTH slices drift from the
    // mixture; the pure-low slice s1 sits FARTHER from the pooled
    // mixture than s2, which itself became a 50/50 mix
    val byG = s1.map(r => r._1 -> r._3).toMap
    assert(byG("s2") > 0L && byG("s1") > 0L)
    assert(byG("s1") > byG("s2"))
  }

  test("replaying a batch rewrites identical partitions (exactly-once)") {
    val state = tmpDir("ks-replay")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    run(state, batch1, 1L) // at-least-once
    assert(snap(state) === before)
  }

  test("state maintenance: counts fold, ks snapshots prune, the " +
    "stream continues") {
    val state = tmpDir("ks-maint")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    val (nFold, nPrune) =
      StateMaintenance.maintain(spark, state, "KsDriftStream", 2L)
    assert(nFold === 2 && nPrune === 1)
    assert(snap(state) === before)
    run(state, Seq(("s3", 40L), ("s3", 41L)), 2L)
    assert(snap(state) ===
      batchOp(batch0 ++ batch1 ++ Seq(("s3", 40L), ("s3", 41L))))
  }

  test("end-to-end through a streaming query over MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val state = tmpDir("ks-e2e")
    val in = MemoryStream[(String, Long)]
    in.addData(batch0: _*)
    val q = KsDriftStream.start(in.toDF().toDF("grp", "v"),
      state, "grp", "v", tmpDir("ks-ckpt"))
    assert(q.awaitTermination(60000), "streaming query did not terminate")
    assert(snap(state) === batchOp(batch0))
  }
}
