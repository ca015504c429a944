package graft.streaming

import graft.SparkSpec
import graft.ops.UniMax
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X66 streaming form: the emitted allocation after any batch equals
  * the batch operator over the union of everything arrived — exact,
  * not point-in-time — plus replay idempotence, history versioning,
  * and a MemoryStream end-to-end pass.
  */
class UniMaxStreamSpec extends SparkSpec {
  import spark.implicits._

  private val B = 40L
  private val E = 2L

  private def df(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "lang", "text")

  private def allocMap(statePath: String,
                       at: Option[Long] = None): Map[String, (Boolean, Long)] =
    UniMaxStream.allocation(spark, statePath, at)
      .as[(String, Long, Boolean, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap

  private def batchAlloc(batches: Seq[(Long, String, String)]*): Map[String, (Boolean, Long)] =
    UniMax.allocate(
        UniMax.tokenCounts(df(batches.flatten: _*), "lang", "text"),
        "lang", B, E)
      .as[(String, Long, Boolean, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap

  private val b0 = Seq(
    (1L, "a", "w1 w2 w3"), (2L, "a", "w1 w2 w3"),
    (3L, "b", "v1 v2 v3 v4 v5"), (4L, "b", "v1 v2 v3 v4 v5"))
  private val b1 = Seq(
    (5L, "b", "v1 v2 v3 v4 v5 v6 v7 v8"),
    (6L, "c", "u1 u2"))

  test("one batch equals the batch operator; the next re-allocates over " +
    "the union; replay is idempotent; history stays queryable") {
    val statePath = tmpDir("unimax-stream")
    val apply = UniMaxStream.applyBatch(statePath, "lang", "text", B, E) _

    apply(df(b0: _*), 0L)
    assert(allocMap(statePath) === batchAlloc(b0))

    apply(df(b1: _*), 1L)
    assert(allocMap(statePath) === batchAlloc(b0, b1))
    // a language first seen in batch 1 participates
    assert(allocMap(statePath).contains("c"))

    // replay of batch 1: identical ledger, identical allocation
    apply(df(b1: _*), 1L)
    assert(allocMap(statePath) === batchAlloc(b0, b1))

    // the batch-0 snapshot is still exactly the batch-0 allocation
    assert(allocMap(statePath, Some(0L)) === batchAlloc(b0))
  }

  test("end-to-end through a streaming query over MemoryStream") {
    val statePath = tmpDir("unimax-e2e")
    val ckpt = tmpDir("unimax-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    in.addData(b0: _*)
    val q1 = UniMaxStream.start(in.toDF().toDF("doc_id", "lang", "text"),
      statePath, "lang", "text", ckpt, B, E)
    q1.awaitTermination(60000)
    assert(allocMap(statePath) === batchAlloc(b0))

    in.addData(b1: _*)
    val q2 = UniMaxStream.start(in.toDF().toDF("doc_id", "lang", "text"),
      statePath, "lang", "text", ckpt, B, E)
    q2.awaitTermination(60000)
    assert(allocMap(statePath) === batchAlloc(b0, b1))
  }
}
