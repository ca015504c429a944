package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X41 streaming form: shared runs emerge as the corpus grows with
  * exact offsets, older pairs never rematch, replay is idempotent.
  */
class SubstringStreamSpec extends SparkSpec {

  import spark.implicits._

  private val P = (0 until 10).map(i => s"p$i").mkString(" ")

  private def df(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  private def allRuns(statePath: String): Set[(Long, Long, Int, Int, Long)] =
    SubstringStream.runs(spark, statePath)
      .as[(Long, Long, Int, Int, Long)].collect().toSet

  test("cross-batch runs carry exact offsets; no rematch; replay idempotent") {
    val statePath = tmpDir("substr-stream-state")
    val apply = SubstringStream.applyBatch(
      statePath, "doc_id", "text", 3, 5, None) _

    // batch 0: docs 1/2 share P in-batch (doc1 at 3, doc2 at 2)
    apply(df(1L -> s"u0 u1 u2 $P v0 v1", 2L -> s"w0 w1 $P x0",
      3L -> "z0 z1 z2 z3 z4"), 0L)
    assert(allRuns(statePath) === Set((1L, 2L, 3, 2, 10L)))

    // batch 1: doc 4 carries P at position 1 -> two new cross runs with
    // exact offsets; the (1,2) run is NOT re-emitted
    apply(df(4L -> s"y0 $P"), 1L)
    assert(allRuns(statePath) === Set(
      (1L, 2L, 3, 2, 10L), (1L, 4L, 3, 1, 10L), (2L, 4L, 2, 1, 10L)))

    // at-least-once: replaying batch 1 changes nothing
    apply(df(4L -> s"y0 $P"), 1L)
    assert(allRuns(statePath) === Set(
      (1L, 2L, 3, 2, 10L), (1L, 4L, 3, 1, 10L), (2L, 4L, 2, 1, 10L)))
  }

  test("batch equals the batch-mode operator when everything is one batch") {
    val docs = Seq(1L -> s"u0 u1 u2 $P v0 v1", 2L -> s"w0 w1 $P x0",
      5L -> s"a0 $P $P")
    val statePath = tmpDir("substr-stream-eq")
    SubstringStream.applyBatch(statePath, "doc_id", "text", 3, 5, None)(
      df(docs: _*), 0L)
    val batch = graft.ops.Dedup.substringRuns(df(docs: _*), "doc_id", "text",
        k = 3, minSpan = 5)
      .as[(Long, Long, Int, Int, Long)].collect().toSet
    assert(allRuns(statePath) === batch)
  }

  test("maxWindowFreq is point-in-time: crossing the cap mid-stream " +
    "suppresses new runs but never retracts emitted ones") {
    val statePath = tmpDir("substr-stream-cap")
    val apply = SubstringStream.applyBatch(
      statePath, "doc_id", "text", 3, 5, Some(3)) _

    // batch 0: P occurs twice corpus-wide (<= cap 3) -> run emitted
    apply(df(1L -> s"u0 u1 u2 $P v0 v1", 2L -> s"w0 w1 $P x0"), 0L)
    assert(allRuns(statePath) === Set((1L, 2L, 3, 2, 10L)))

    // batch 1: two more copies push every P-window hash to 4 > cap ->
    // hot at THIS batch, so no new runs on P; the batch-0 run stays
    apply(df(6L -> s"a0 $P", 7L -> s"b0 b1 b2 $P"), 1L)
    assert(allRuns(statePath) === Set((1L, 2L, 3, 2, 10L)))

    // batch-mode over the same FINAL corpus sees P as hot from the start
    // and emits nothing: the accumulated stream output is a deliberate
    // SUPERSET (point-in-time cap — see the SubstringStream docstring)
    val batch = graft.ops.Dedup.substringRuns(
      df(1L -> s"u0 u1 u2 $P v0 v1", 2L -> s"w0 w1 $P x0",
        6L -> s"a0 $P", 7L -> s"b0 b1 b2 $P"),
      "doc_id", "text", k = 3, minSpan = 5, maxWindowFreq = Some(3))
      .as[(Long, Long, Int, Int, Long)].collect().toSet
    assert(batch === Set.empty)
  }

  test("end-to-end through a streaming query over MemoryStream") {
    val statePath = tmpDir("substr-stream-e2e")
    val ckpt = tmpDir("substr-stream-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    in.addData(10L -> s"m0 $P m1")
    val q1 = SubstringStream.start(in.toDF().toDF("doc_id", "text"),
      statePath, "doc_id", "text", ckpt, k = 3, minSpan = 5)
    q1.awaitTermination(60000)
    assert(allRuns(statePath) === Set.empty)

    in.addData(11L -> s"n0 n1 $P")
    val q2 = SubstringStream.start(in.toDF().toDF("doc_id", "text"),
      statePath, "doc_id", "text", ckpt, k = 3, minSpan = 5)
    q2.awaitTermination(60000)
    assert(allRuns(statePath) === Set((10L, 11L, 1, 2, 10L)))
  }
}
