package graft.streaming

import graft.SparkSpec
import graft.ops.KneserNey
import org.apache.spark.sql.DataFrame

/** X56 streaming form: single batch equals the batch operator,
  * point-in-time thresholds (cumulative reference through each batch,
  * no re-bucketing), NULL-bucket warm-up before the first reference
  * row, replay idempotent, and the KnLmStream composition.
  */
class PplBucketStreamSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, Long, Boolean)*): DataFrame =
    rows.toDF("doc_id", "avg_p_fix", "is_ref")

  private def emitted(statePath: String): Set[(Long, Long, String)] =
    PplBucketStream.buckets(spark, statePath, "doc_id")
      .as[(Long, Long, String)].collect().toSet

  private def batchMode(scored: DataFrame,
                        refIds: Seq[Long]): Set[(Long, Long, String)] =
    KneserNey.perplexityBuckets(
        scored.select("doc_id", "avg_p_fix"),
        refIds.toDF("doc_id"), "doc_id")
      .as[(Long, Long, String)].collect().toSet

  // 9 reference docs (scores 10..90), 3 extra corpus docs
  private val b0 = Seq[(Long, Long, Boolean)](
    (1L, 90L, true), (2L, 80L, true), (3L, 70L, true),
    (4L, 60L, true), (5L, 50L, true), (6L, 40L, true),
    (7L, 30L, true), (8L, 20L, true), (9L, 10L, true),
    (10L, 85L, false), (11L, 45L, false), (12L, 5L, false))

  test("a single batch equals the batch operator exactly") {
    val statePath = tmpDir("ppl-stream-single")
    PplBucketStream.applyBatch(statePath, "doc_id", "is_ref")(
      df(b0: _*), 0L)
    val expected = batchMode(df(b0: _*), (1L to 9L))
    assert(expected.nonEmpty)
    assert(emitted(statePath) === expected)
  }

  test("thresholds are point-in-time: cumulative refs, no re-bucketing") {
    val statePath = tmpDir("ppl-stream-multi")
    val apply = PplBucketStream.applyBatch(statePath, "doc_id", "is_ref") _
    apply(df(b0: _*), 0L)
    val after0 = emitted(statePath)
    // batch 1 brings three new LOW-scoring reference docs — the tertile
    // cuts move down, so its corpus doc buckets differently than it
    // would have under batch 0's thresholds
    val b1 = Seq[(Long, Long, Boolean)](
      (13L, 4L, true), (14L, 3L, true), (15L, 2L, true),
      (16L, 30L, false))
    apply(df(b1: _*), 1L)
    val after1 = emitted(statePath)
    // batch 0's emissions are untouched (append-only, never re-bucketed)
    assert(after0.subsetOf(after1))
    // batch 1 equals batch mode over the UNION of batches 0..1
    // restricted to its own rows (the KnLmStream point-in-time shape)
    val b1Ids = b1.map(_._1).toSet
    val expected1 = batchMode(df(b0 ++ b1: _*),
      (1L to 9L) ++ (13L to 15L)).filter(r => b1Ids(r._1))
    assert(after1 -- after0 === expected1)
    // and the drift is visible: under batch 0's cuts (t1=70, t2=40)
    // score 30 is 'tail'; the three low reference scores pull the
    // cumulative cuts down to (60, 20), so doc 16 buckets 'middle'
    val by = after1.map(r => r._1 -> r._3).toMap
    assert(by(16L) === "middle")
  }

  test("warm-up before the first reference row emits NULL buckets") {
    val statePath = tmpDir("ppl-stream-warmup")
    val apply = PplBucketStream.applyBatch(statePath, "doc_id", "is_ref") _
    apply(df((20L, 55L, false), (21L, 15L, false)), 0L)
    val rows0 = PplBucketStream.buckets(spark, statePath, "doc_id")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(rows0 === Set((20L, 55L, None), (21L, 15L, None)))
    // references arrive in batch 1: it buckets, batch 0 stays NULL
    apply(df(b0: _*), 1L)
    val rows1 = PplBucketStream.buckets(spark, statePath, "doc_id")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(rows1.filter(_._3.isEmpty) ===
      Set((20L, 55L, None), (21L, 15L, None)))
    assert(rows1.count(_._3.nonEmpty) === b0.size)
  }

  test("at-least-once replay rewrites identical partitions") {
    val statePath = tmpDir("ppl-stream-replay")
    val apply = PplBucketStream.applyBatch(statePath, "doc_id", "is_ref") _
    apply(df(b0: _*), 0L)
    val b1 = Seq[(Long, Long, Boolean)]((13L, 4L, true), (16L, 45L, false))
    apply(df(b1: _*), 1L)
    val once = emitted(statePath)
    apply(df(b1: _*), 1L) // replay: prior ledger identical (batch_id < 1)
    assert(emitted(statePath) === once)
  }

  test("composes with KnLmStream: online scores in, online buckets out") {
    val knState = tmpDir("ppl-stream-kn")
    val bkState = tmpDir("ppl-stream-bk")
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat sat again on it"),
      (2L, "the cat sat on the mat and the dog sat on the log"),
      (3L, "a completely different sentence with other words entirely"),
      (4L, "the cat sat on the mat exactly like the reference text"))
      .toDF("doc_id", "text")
    KnLmStream.applyBatch(knState, "doc_id", "text")(docs, 0L)
    // reference slice = docs 1..2; scores come from the online scorer
    val scored = KnLmStream.scores(spark, knState, "doc_id")
      .select($"doc_id", $"avg_p_fix", ($"doc_id" <= 2L).as("is_ref"))
    PplBucketStream.applyBatch(bkState, "doc_id", "is_ref")(scored, 0L)
    val expected = batchMode(scored, Seq(1L, 2L))
    assert(expected.nonEmpty)
    assert(emitted(bkState) === expected)
  }
}
