package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.DataFrame

/** X79 streaming form: batch-split invariance (pairs over any batch
  * split equal the batch operator on the union, each pair exactly
  * once), signature-only state, replay idempotence, end-to-end engine
  * run.
  */
class SimhashStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = (0 until 40).map(t => s"tok${t % 17} w$t").mkString(" ")
  // 1 and 2 near-identical (distance small); 3 unrelated
  private val docs = Seq(
    1L -> s"$base alpha beta gamma",
    2L -> s"$base alpha beta delta",
    3L -> (0 until 40).map(t => s"zz${t * 7 % 23} q$t").mkString(" "))

  private def df(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  private def emitted(statePath: String): Set[(Long, Long, Long)] =
    SimhashStream.pairs(spark, statePath)
      .as[(Long, Long, Long)].collect().toSet

  private def batchRef(rows: Seq[(Long, String)], maxDist: Int): Set[(Long, Long, Long)] =
    Dedup.hammingPairs(
        Dedup.simhash64(Dedup.shingleTable(rows.toDF("doc_id", "text"),
          "doc_id", "text", 3), "doc_id"), "doc_id", maxDist)
      .as[(Long, Long, Long)].collect().toSet

  // wide radius so the constructed near-dup pair is guaranteed in range
  private val d = 7

  test("any batch split emits the batch operator's pairs, each once") {
    val ref = batchRef(docs, d)
    assert(ref.exists(p => p._1 == 1L && p._2 == 2L), s"fixture: $ref")
    // single batch
    val sp1 = tmpDir("sh-single")
    SimhashStream.applyBatch(sp1, "doc_id", "text", 3, d)(df(docs: _*), 0L)
    assert(emitted(sp1) === ref)
    // split: the near-dup pair lands in batch 1 (when doc 2 arrives)
    val sp2 = tmpDir("sh-split")
    val apply = SimhashStream.applyBatch(sp2, "doc_id", "text", 3, d) _
    apply(df(docs(0)), 0L)
    assert(emitted(sp2) === Set.empty)
    apply(df(docs(1), docs(2)), 1L)
    assert(emitted(sp2) === ref)
  }

  test("state is the banded signature index, no text retained") {
    val sp = tmpDir("sh-state")
    SimhashStream.applyBatch(sp, "doc_id", "text", 3, d)(df(docs: _*), 0L)
    val bands = spark.read.parquet(s"$sp/bands")
    assert(bands.columns.toSet ===
      Set("doc_id", "simhash", "band", "key", "batch_id"))
    assert(bands.count() === docs.size.toLong * (d + 1))
  }

  test("replay idempotent") {
    val sp = tmpDir("sh-replay")
    val apply = SimhashStream.applyBatch(sp, "doc_id", "text", 3, d) _
    apply(df(docs(0)), 0L)
    apply(df(docs(1)), 1L)
    val once = emitted(sp)
    apply(df(docs(1)), 1L) // replay: identical prior index, same output
    assert(emitted(sp) === once)
  }

  test("end to end through the streaming engine") {
    val sp = tmpDir("sh-e2e")
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    src.addData(docs: _*)
    val q = SimhashStream.start(src.toDF().toDF("doc_id", "text"), sp,
      "doc_id", "text", tmpDir("sh-ckpt"), n = 3, maxDist = d)
    q.awaitTermination(60000)
    assert(emitted(sp) === batchRef(docs, d))
  }
}
