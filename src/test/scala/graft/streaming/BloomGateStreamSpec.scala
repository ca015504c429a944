package graft.streaming

import graft.SparkSpec
import graft.ops.Bloom
import org.apache.spark.sql.DataFrame

/** X74 streaming form: single batch equals the batch operator, the eval
  * set accumulates point-in-time, novelty-only pair state, replay
  * idempotent, and an end-to-end run through the real streaming engine.
  */
class BloomGateStreamSpec extends SparkSpec {
  import spark.implicits._

  private val (m, k) = (1 << 12, 4)
  private val quote = "e1 e2 e3 e4 e5 e6 e7 e8"

  private def df(rows: (Long, String, Boolean)*): DataFrame =
    rows.toDF("doc_id", "text", "is_eval")

  private def emitted(statePath: String): Set[(Long, Long)] =
    BloomGateStream.scores(spark, statePath, "doc_id")
      .as[(Long, Long)].collect().toSet

  test("a single mixed batch equals the batch operator exactly") {
    val statePath = tmpDir("bg-single")
    val corpus = Seq((10L, s"a b c $quote x y"), (11L, "clean words only here"))
    val ev = Seq((100L, s"$quote e9"))
    BloomGateStream.applyBatch(statePath, "doc_id", "text", "is_eval",
      n = 8, m = m, k = k)(
      df((ev.map { case (i, t) => (i, t, true) } ++
        corpus.map { case (i, t) => (i, t, false) }): _*), 0L)
    val batch = Bloom.contamination(corpus.toDF("doc_id", "text"),
        ev.toDF("doc_id", "text"), "doc_id", "text", n = 8, m = m, k = k)
      .as[(Long, Long)].collect().toSet
    assert(batch === Set((10L, 1L), (11L, 0L)))
    assert(emitted(statePath) === batch)
  }

  test("the eval set accumulates point-in-time; no retro re-scoring") {
    val statePath = tmpDir("bg-multi")
    val apply = BloomGateStream.applyBatch(
      statePath, "doc_id", "text", "is_eval", 8, m, k) _
    // batch 0: the contaminated doc arrives BEFORE its eval quote
    apply(df((10L, s"a b $quote", false)), 0L)
    assert(emitted(statePath) === Set((10L, 0L)))
    // batch 1 brings the quote as eval + the same text again as 11
    apply(df((100L, quote, true), (11L, s"a b $quote", false)), 1L)
    assert(emitted(statePath) === Set((10L, 0L), (11L, 1L)))
    // batch 2: a second eval doc with the same quote -> count rises to 2
    apply(df((101L, s"$quote tail", true),
      (12L, s"prefix $quote suffix", false)), 2L)
    assert(emitted(statePath) === Set((10L, 0L), (11L, 1L), (12L, 2L)))
  }

  test("state appends novel (eval_id, shingle) pairs only; replay idempotent") {
    val statePath = tmpDir("bg-novel")
    val apply = BloomGateStream.applyBatch(
      statePath, "doc_id", "text", "is_eval", 8, m, k) _
    apply(df((100L, quote, true)), 0L)
    val n0 = spark.read.parquet(s"$statePath/evsh").count()
    assert(n0 === 1L) // the quote's single 8-shingle under one eval id
    // same text under a NEW eval id IS novel (distinct-doc counting)
    apply(df((101L, quote, true)), 1L)
    assert(spark.read.parquet(s"$statePath/evsh").count() === n0 + 1)
    // replay of batch 1: identical prior state, identical partitions
    apply(df((101L, quote, true)), 1L)
    assert(spark.read.parquet(s"$statePath/evsh").count() === n0 + 1)
    // an at-least-once source duplicating an eval row WITHIN one batch
    // must not duplicate state pairs (delta-internal distinct)
    apply(df((102L, quote, true), (102L, quote, true)), 2L)
    assert(spark.read.parquet(s"$statePath/evsh").count() === n0 + 2)
  }

  test("a corpus row duplicated within a batch scores exactly once") {
    val statePath = tmpDir("bg-corpus-dup")
    BloomGateStream.applyBatch(statePath, "doc_id", "text", "is_eval",
      8, m, k)(
      df((100L, quote, true), (10L, s"a $quote", false),
        (10L, s"a $quote", false)), 0L)
    val rows = BloomGateStream.scores(spark, statePath, "doc_id").collect()
    assert(rows.length === 1)
    assert(emitted(statePath) === Set((10L, 1L)))
  }

  test("a null eval flag raises instead of silently vanishing") {
    val statePath = tmpDir("bg-null-flag")
    val bad = Seq((10L, "some text", null.asInstanceOf[java.lang.Boolean]))
      .toDF("doc_id", "text", "is_eval")
    val e = intercept[Exception] {
      BloomGateStream.applyBatch(statePath, "doc_id", "text", "is_eval",
        8, m, k)(bad, 0L)
    }
    assert(e.getMessage.contains("null eval flag"))
  }

  test("end to end through the streaming engine") {
    val statePath = tmpDir("bg-e2e")
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Boolean)](spark)
    src.addData((100L, quote, true), (10L, s"a b $quote", false),
      (11L, "clean corpus text", false))
    val q = BloomGateStream.start(
      src.toDF().toDF("doc_id", "text", "is_eval"), statePath,
      "doc_id", "text", "is_eval", 8, m, k, tmpDir("bg-ckpt"))
    q.awaitTermination(60000)
    assert(emitted(statePath) === Set((10L, 1L), (11L, 0L)))
  }
}
