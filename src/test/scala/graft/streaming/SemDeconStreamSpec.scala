package graft.streaming

import graft.SparkSpec
import graft.ops.SemDedup
import org.apache.spark.sql.DataFrame

/** X117 streaming form: batch N equals batch-mode decon against eval
  * 0..N, cold start emits the sentinel, state appends novel eval ids
  * once, replay idempotent, end-to-end through the engine.
  */
class SemDeconStreamSpec extends SparkSpec {
  import spark.implicits._

  private val tau = 900000L

  private def df(rows: (Long, Seq[Float], Boolean)*): DataFrame =
    rows.toDF("vec_id", "embedding", "is_eval")

  private def outMap(statePath: String): Map[Long, (Long, Any, String)] =
    SemDeconStream.verdicts(spark, statePath, "vec_id").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2),
          r.getString(3)))).toMap

  test("cold start: no eval seen -> sentinel keep; later batches gate " +
    "against accumulated eval, equal to the batch operator") {
    val statePath = tmpDir("sd-acc")
    val apply = SemDeconStream.applyBatch(statePath, "vec_id",
      "embedding", "is_eval", tau) _
    // batch 0: corpus only
    apply(df((1L, Seq(1f, 0f), false)), 0L)
    assert(outMap(statePath)(1L) ===
      ((SemDedup.NoEvalSentinelPpm, null, "keep")))
    // batch 1: an eval vector arrives WITH a duplicate corpus vector —
    // own-batch eval must gate it (the point-in-time contract)
    apply(df((100L, Seq(1f, 0f), true), (2L, Seq(1f, 0f), false),
      (3L, Seq(0f, 1f), false)), 1L)
    val out = outMap(statePath)
    assert(out(2L) === ((1000000L, 100L, "drop")))
    assert(out(3L) === ((0L, 100L, "keep")))
    // batch 2: corpus only — still gated against batch-1 eval, and the
    // emission equals the batch operator on (corpus2, eval 0..2)
    apply(df((4L, Seq(1f, 0.01f), false)), 2L)
    val want = SemDedup.semanticDecon(
        Seq((4L, Seq(1f, 0.01f))).toDF("vec_id", "embedding"),
        Seq((100L, Seq(1f, 0f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", tau)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(outMap(statePath)(4L) === want(4L))
  }

  test("state appends a novel eval id once; replay idempotent") {
    val statePath = tmpDir("sd-replay")
    val apply = SemDeconStream.applyBatch(statePath, "vec_id",
      "embedding", "is_eval", tau) _
    apply(df((100L, Seq(1f, 0f), true), (100L, Seq(1f, 0f), true)), 0L)
    val n0 = spark.read.parquet(s"$statePath/ev").count()
    assert(n0 === 1L) // within-batch duplicate eval row admitted once
    apply(df((100L, Seq(1f, 0f), true), (1L, Seq(0f, 1f), false)), 1L)
    assert(spark.read.parquet(s"$statePath/ev").count() === n0)
    // replay batch 1: identical prior, identical partitions
    apply(df((100L, Seq(1f, 0f), true), (1L, Seq(0f, 1f), false)), 1L)
    assert(spark.read.parquet(s"$statePath/ev").count() === n0)
    assert(outMap(statePath)(1L)._3 === "keep")
  }

  test("end to end through the streaming engine") {
    val statePath = tmpDir("sd-e2e")
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float], Boolean)](spark)
    src.addData((100L, Seq(1f, 1f), true), (1L, Seq(1f, 1f), false),
      (2L, Seq(-1f, 1f), false))
    val q = SemDeconStream.start(
      src.toDF().toDF("vec_id", "embedding", "is_eval"), statePath,
      "vec_id", "embedding", "is_eval", tau, tmpDir("sd-ckpt"))
    q.awaitTermination(60000)
    val out = outMap(statePath)
    assert(out(1L)._3 === "drop" && out(2L)._3 === "keep")
  }
}
