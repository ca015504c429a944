package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X36 streaming form: cross-batch semantic near-dups emerge as the
  * corpus grows, probing stays confined to the batch's clusters,
  * already-emitted pairs never re-emit, and a replayed batch is
  * idempotent.
  */
class SemDedupStreamSpec extends SparkSpec {

  import spark.implicits._

  private val cents = Array(Array(1000, 0), Array(0, 1000))
  private val tau = 0.999

  private def df(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def allPairs(statePath: String): Set[(Long, Long)] =
    SemDedupStream.pairs(spark, statePath)
      .select("d1", "d2").as[(Long, Long)].collect().toSet

  test("pairs accumulate across batches without re-emission; replay is idempotent") {
    val statePath = tmpDir("semdedup-stream-state")
    val apply = SemDedupStream.applyBatch(
      statePath, "vec_id", "embedding", cents, tau) _

    // batch 0: 1 and 2 are same-cluster near-identical (cos ~0.99998);
    // 3 sits in the other cluster
    apply(df(1L -> Seq(0.75f, 0.625f), 2L -> Seq(0.74f, 0.62f),
      3L -> Seq(0.1f, 0.9f)), 0L)
    assert(allPairs(statePath) === Set((1L, 2L)))

    // batch 1: 4 duplicates the batch-0 vectors -> only new cross pairs
    apply(df(4L -> Seq(0.75f, 0.625f)), 1L)
    assert(allPairs(statePath) === Set((1L, 2L), (1L, 4L), (2L, 4L)))

    // at-least-once: replaying batch 1 changes nothing
    apply(df(4L -> Seq(0.75f, 0.625f)), 1L)
    assert(allPairs(statePath) === Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("probing is cluster-confined: a boundary-straddling near-dup is not emitted") {
    // cos((760,740), (740,760)) = 0.999644 >= tau, but the mirrored
    // vectors quantize into DIFFERENT coarse clusters — the published
    // algorithm's recall trade, same as SemDedupSpec's boundary case
    val statePath = tmpDir("semdedup-stream-boundary")
    val apply = SemDedupStream.applyBatch(
      statePath, "vec_id", "embedding", cents, tau) _
    apply(df(10L -> Seq(0.76f, 0.74f), 11L -> Seq(0.74f, 0.76f)), 0L)
    assert(allPairs(statePath) === Set.empty)
  }

  test("end-to-end through a streaming query over MemoryStream") {
    val statePath = tmpDir("semdedup-stream-e2e")
    val ckpt = tmpDir("semdedup-stream-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    in.addData(20L -> Seq(0.75f, 0.625f), 21L -> Seq(0.1f, 0.9f))
    val q1 = SemDedupStream.start(in.toDF().toDF("vec_id", "embedding"),
      statePath, "vec_id", "embedding", ckpt, cents, tau)
    q1.awaitTermination(60000)
    assert(allPairs(statePath) === Set.empty)

    in.addData(22L -> Seq(0.74f, 0.62f))
    val q2 = SemDedupStream.start(in.toDF().toDF("vec_id", "embedding"),
      statePath, "vec_id", "embedding", ckpt, cents, tau)
    q2.awaitTermination(60000)
    assert(allPairs(statePath) === Set((20L, 22L)))
  }
}
