package graft.streaming

import graft.SparkSpec
import graft.engine.Tables
import graft.ops.KneserNey
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X52 streaming form: each batch's emitted scores are bit-identical to
  * the batch operator trained on every document seen so far including
  * the batch itself; the model state carries statistics, not text; and
  * replay is idempotent.
  */
class KnLmStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val texts = Tables.documents(spark, "/root/testdata/sf0.001")
    .select("text").as[String].collect().take(6).toSeq

  private def df(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def scoreSet(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.select("doc_id", "n_ngrams", "n_unseen", "sum_p_fix", "avg_p_fix")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("per-batch scores equal the batch operator over corpus-so-far; replay idempotent") {
    val statePath = tmpDir("knlm-stream")
    val apply = KnLmStream.applyBatch(statePath, "doc_id", "text") _

    val b0 = Seq(1L -> texts(0), 2L -> texts(1), 3L -> texts(2))
    val b1 = Seq(4L -> texts(3), 5L -> texts(4), 6L -> texts(5))

    // batch 0: model == batch 0 alone
    apply(df(b0: _*), 0L)
    val expect0 = scoreSet(KneserNey.score(df(b0: _*), df(b0: _*),
      "doc_id", "text"))
    assert(scoreSet(KnLmStream.scores(spark, statePath, "doc_id")) === expect0)

    // batch 1: its scores use the model over batches 0+1; batch 0's
    // emissions are point-in-time and stay as they were
    apply(df(b1: _*), 1L)
    val expect1 = scoreSet(KneserNey.score(df(b1: _*),
      df((b0 ++ b1): _*), "doc_id", "text"))
    assert(scoreSet(KnLmStream.scores(spark, statePath, "doc_id")) ===
      expect0 ++ expect1)

    // at-least-once: replaying batch 1 rewrites identical partitions
    apply(df(b1: _*), 1L)
    assert(scoreSet(KnLmStream.scores(spark, statePath, "doc_id")) ===
      expect0 ++ expect1)
  }

  test("a repeated document re-scores HIGHER later: the model learned it") {
    val statePath = tmpDir("knlm-stream-learn")
    val apply = KnLmStream.applyBatch(statePath, "doc_id", "text") _
    apply(df(1L -> texts(0), 2L -> texts(1)), 0L)
    apply(df(3L -> texts(0)), 1L) // same content as doc 1, one batch later
    val got = KnLmStream.scores(spark, statePath, "doc_id")
      .select("doc_id", "avg_p_fix").as[(Long, Long)].collect().toMap
    assert(got(3L) > got(1L),
      "the second copy is scored under a model that has seen the text")
  }

  test("end-to-end through a streaming query over MemoryStream") {
    val statePath = tmpDir("knlm-e2e")
    val ckpt = tmpDir("knlm-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    in.addData(10L -> texts(0), 11L -> texts(1))
    val q1 = KnLmStream.start(in.toDF().toDF("doc_id", "text"), statePath,
      "doc_id", "text", ckpt)
    q1.awaitTermination(60000)
    assert(KnLmStream.scores(spark, statePath, "doc_id").count() === 2L)

    in.addData(12L -> texts(2))
    val q2 = KnLmStream.start(in.toDF().toDF("doc_id", "text"), statePath,
      "doc_id", "text", ckpt)
    q2.awaitTermination(60000)
    assert(KnLmStream.scores(spark, statePath, "doc_id").count() === 3L)
  }
}
