package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.DataFrame

/** X60 streaming form: single batch equals the batch operator,
  * eval shingles accumulate point-in-time (no retro re-cleaning),
  * novelty-only state, replay idempotent.
  */
class DecontaminateStreamSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String, Boolean)*): DataFrame =
    rows.toDF("doc_id", "text", "is_eval")

  private def emitted(statePath: String): Set[(Long, String, Long)] =
    DecontaminateStream.cleaned(spark, statePath, "doc_id")
      .as[(Long, String, Long)].collect().toSet

  private val quote = "e1 e2 e3 e4 e5 e6 e7 e8"

  test("a single mixed batch equals the batch operator exactly") {
    val statePath = tmpDir("dc-stream-single")
    val b0 = Seq(
      (100L, s"$quote e9", true),
      (10L, s"a b c $quote x y", false),
      (11L, "totally clean text here", false))
    DecontaminateStream.applyBatch(statePath, "doc_id", "text", "is_eval",
      n = 8)(df(b0: _*), 0L)
    val batch = Dedup.decontaminate(
        Seq((10L, s"a b c $quote x y"), (11L, "totally clean text here"))
          .toDF("doc_id", "text"),
        Seq((100L, s"$quote e9")).toDF("doc_id", "text"),
        "doc_id", "text", n = 8)
      .as[(Long, String, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(emitted(statePath) === batch)
  }

  test("the eval set accumulates point-in-time; no retro re-cleaning") {
    val statePath = tmpDir("dc-stream-multi")
    val apply = DecontaminateStream.applyBatch(
      statePath, "doc_id", "text", "is_eval", 8) _
    // batch 0: the contaminated doc arrives BEFORE its eval quote
    apply(df((10L, s"a b $quote", false)), 0L)
    assert(emitted(statePath) === Set((10L, s"a b $quote", 0L)))
    // batch 1 brings the quote as eval + the same text again as 11
    apply(df((100L, quote, true), (11L, s"a b $quote", false)), 1L)
    val after1 = emitted(statePath)
    // 10 stays as emitted (append-only); 11 is cleaned
    assert(after1 === Set(
      (10L, s"a b $quote", 0L), (11L, "a b", 8L)))
    // batch 2: corpus-only batch still sees the accumulated shingles
    apply(df((12L, s"$quote tail words", false)), 2L)
    assert(emitted(statePath).contains((12L, "tail words", 8L)))
  }

  test("state appends novel shingles only; replay idempotent") {
    val statePath = tmpDir("dc-stream-novel")
    val apply = DecontaminateStream.applyBatch(
      statePath, "doc_id", "text", "is_eval", 8) _
    apply(df((100L, quote, true)), 0L)
    val n0 = spark.read.parquet(s"$statePath/evsh").count()
    assert(n0 === 1L) // exactly the quote's single 8-shingle
    // the identical eval doc again: nothing novel to append
    apply(df((101L, quote, true)), 1L)
    assert(spark.read.parquet(s"$statePath/evsh").count() === n0)
    // replay of batch 1: identical prior state, identical partitions
    apply(df((101L, quote, true)), 1L)
    assert(spark.read.parquet(s"$statePath/evsh").count() === n0)
  }
}
