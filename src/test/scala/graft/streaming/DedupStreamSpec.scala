package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X30 streaming form: cross-batch near-dup pairs emerge as the corpus
  * grows, already-emitted pairs never re-emit, and a replayed batch is
  * idempotent.
  */
class DedupStreamSpec extends SparkSpec {

  import spark.implicits._

  // 40-token texts differing only in the last token: 37 shared 3-shingles
  // of 38 each -> jaccard 37/39 ~ 0.949 >= 0.8
  private def text(tail: String): String =
    (1 to 39).map(i => s"tok$i").mkString(" ") + " " + tail
  private def distinctText(seed: Int): String =
    (1 to 40).map(i => s"other${seed}_$i").mkString(" ")

  private def df(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  private def allPairs(statePath: String): Set[(Long, Long)] =
    DedupStream.pairs(spark, statePath)
      .select("d1", "d2").as[(Long, Long)].collect().toSet

  test("pairs accumulate across batches without re-emission; replay is idempotent") {
    val statePath = tmpDir("dedup-stream-state")
    val apply = DedupStream.applyBatch(
      statePath, "doc_id", "text", 16, 4, 0.8) _

    // batch 0: one in-batch near-dup pair (1,2); 3 is unrelated
    apply(df(1L -> text("tailA"), 2L -> text("tailB"), 3L -> distinctText(1)), 0L)
    assert(allPairs(statePath) === Set((1L, 2L)))

    // batch 1: doc 4 near-dups the batch-0 docs -> ONLY the new cross
    // pairs emit; (1,2) is not re-emitted
    apply(df(4L -> text("tailC"), 5L -> distinctText(2)), 1L)
    assert(allPairs(statePath) === Set((1L, 2L), (1L, 4L), (2L, 4L)))

    // at-least-once: batch 1 replays after a failure — nothing changes
    apply(df(4L -> text("tailC"), 5L -> distinctText(2)), 1L)
    assert(allPairs(statePath) === Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("end-to-end through a streaming query over MemoryStream") {
    val statePath = tmpDir("dedup-stream-e2e")
    val ckpt = tmpDir("dedup-stream-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    in.addData(10L -> text("tailX"), 11L -> distinctText(3))
    val q1 = DedupStream.start(in.toDF().toDF("doc_id", "text"), statePath,
      "doc_id", "text", ckpt)
    q1.awaitTermination(60000)
    assert(allPairs(statePath) === Set.empty)

    in.addData(12L -> text("tailY"))
    val q2 = DedupStream.start(in.toDF().toDF("doc_id", "text"), statePath,
      "doc_id", "text", ckpt)
    q2.awaitTermination(60000)
    assert(allPairs(statePath) === Set((10L, 12L)))
  }
}
