package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X29 streaming MERGE: upsert/delete semantics across micro-batches and
  * the replay-idempotence contract (re-running a batch with the same
  * batchId leaves the snapshot bit-identical).
  */
class CdcApplyStreamSpec extends SparkSpec {

  import spark.implicits._

  private def df(rows: (String, String, Int, Long, String)*): DataFrame =
    rows.toDF("k", "attr", "ts", "tie", "op")

  private def state(statePath: String): Set[(String, String, Int, Long)] =
    CdcApplyStream.snapshot(spark, statePath)
      .as[(String, String, Int, Long)].collect().toSet

  test("upserts, inserts and deletes apply across micro-batches") {
    val statePath = tmpDir("cdc-apply-state")
    val ckpt = tmpDir("cdc-apply-ckpt")
    val seed = df(("k1", "A", 0, 0L, "U"), ("k2", "B", 0, 0L, "U"))

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String, Int, Long, String)]
    in.addData(
      ("k2", "B2", 10, 1L, "U"), // update existing key
      ("k3", "C", 10, 2L, "U")) // insert new key
    val q1 = CdcApplyStream.start(
      in.toDF().toDF("k", "attr", "ts", "tie", "op"), seed, statePath,
      "k", "ts", "tie", "op", ckpt)
    q1.awaitTermination(60000)
    assert(state(statePath) === Set(
      ("k1", "A", 0, 0L), ("k2", "B2", 10, 1L), ("k3", "C", 10, 2L)))

    in.addData(
      ("k1", "gone", 20, 3L, "D"), // delete
      ("k3", "C2", 20, 4L, "U")) // update the batch-1 insert
    val q2 = CdcApplyStream.start(
      in.toDF().toDF("k", "attr", "ts", "tie", "op"), seed, statePath,
      "k", "ts", "tie", "op", ckpt)
    q2.awaitTermination(60000)
    assert(state(statePath) === Set(
      ("k2", "B2", 10, 1L), ("k3", "C2", 20, 4L)))
  }

  test("replaying a batch with the same batchId is idempotent") {
    val statePath = tmpDir("cdc-replay-state")
    val seed = df(("k1", "A", 0, 0L, "U"))
    val apply = CdcApplyStream.applyBatch(
      seed, statePath, "k", "ts", "tie", "op", keepVersions = 2) _

    apply(df(("k2", "B", 10, 1L, "U")), 0L)
    apply(df(("k1", "gone", 20, 2L, "D"), ("k3", "C", 20, 3L, "U")), 1L)
    val afterFirst = state(statePath)
    assert(afterFirst === Set(("k2", "B", 10, 1L), ("k3", "C", 20, 3L)))

    // at-least-once: the same micro-batch arrives again after a failure
    apply(df(("k1", "gone", 20, 2L, "D"), ("k3", "C", 20, 3L, "U")), 1L)
    assert(state(statePath) === afterFirst)
  }

  test("a delete arriving before an older upsert wins by (ts, tie)") {
    val statePath = tmpDir("cdc-order-state")
    val seed = df(("k1", "A", 0, 0L, "U"))
    val apply = CdcApplyStream.applyBatch(
      seed, statePath, "k", "ts", "tie", "op", keepVersions = 2) _
    // one batch carrying a late upsert (ts=5) and a newer delete (ts=9)
    apply(df(("k1", "late", 5, 1L, "U"), ("k1", "x", 9, 2L, "D")), 0L)
    assert(state(statePath) === Set.empty)
  }
}
