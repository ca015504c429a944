package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X116 streaming form: the online curation pipeline — one batch
  * reduces to the composed batch stages, state accumulates without
  * revisiting the retained corpus, and a replayed batch is idempotent.
  */
class CurateStreamSpec extends SparkSpec {

  import spark.implicits._

  test("chunk + featureHash run per micro-batch over a MemoryStream") {
    // the stateless curation operators compose with Structured
    // Streaming unchanged: chunking is a pure generator projection and
    // feature hashing aggregates only within a foreachBatch batch
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    in.addData(1L -> "a b c d e f", 2L -> "x y")
    val out = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long)]()
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("curate-chunk-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val chunks = graft.ops.Curate.chunk(batch, "doc_id", "text",
          size = 4, stride = 2)
        val feats = graft.ops.TextAnalysis.featureHash(batch, "doc_id",
          "text", dim = 16)
        chunks.groupBy("doc_id").count().collect().foreach { r =>
          val fh = feats.filter(feats("doc_id") === r.getLong(0)).count()
          out.put(r.getLong(0), (r.getLong(1), fh))
        }
        ()
      }
      .start()
    assert(q.awaitTermination(60000), "streaming query did not terminate")
    // doc 1: 6 tokens, stride 2 -> starts 0,2,4 = 3 chunks; doc 2: 1 chunk
    assert(out.get(1L)._1 === 3L)
    assert(out.get(2L)._1 === 1L)
    // feature rows are bounded by distinct tokens (no cross-batch state)
    assert(out.get(1L)._2 >= 1L && out.get(1L)._2 <= 6L)
    assert(out.get(2L)._2 >= 1L && out.get(2L)._2 <= 2L)
  }

  // 40-token texts differing only in the last token (jaccard ~0.949
  // >= 0.8 — the DedupStreamSpec fixture); distinct texts share nothing
  private def text(tail: String): String =
    (1 to 39).map(i => s"tok$i").mkString(" ") + " " + tail
  private def distinctText(seed: Int): String =
    (1 to 40).map(i => s"other${seed}_$i").mkString(" ")
  // one token repeated: quality 1/40, dup_ngram_ratio ~1 -> gate drop
  private val lowQ = (1 to 40).map(_ => "spam").mkString(" ")
  private val evalText = (1 to 12).map(i => s"ev$i").mkString(" ")
  // carries eval's ev1..ev8 run (an 8-shingle hit), otherwise unique
  private def contaminated(seed: Int): String =
    (1 to 15).map(i => s"c${seed}_$i").mkString(" ") + " " +
      (1 to 8).map(i => s"ev$i").mkString(" ") + " " +
      (1 to 15).map(i => s"d${seed}_$i").mkString(" ")

  private def df(rows: (Long, String, Boolean)*): DataFrame =
    rows.toDF("doc_id", "text", "is_eval")

  private def verdicts(statePath: String): Map[Long, String] =
    CurateStream.ledger(spark, statePath, "doc_id")
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap

  private val applyArgs = (statePath: String) => CurateStream.applyBatch(
    statePath, "doc_id", "text", "is_eval",
    qualityMin = 0.5, dupMax = 0.2) _

  test("one batch composes gate -> exact -> near -> decon exactly; " +
    "the ledger is dense") {
    val statePath = tmpDir("curate-stream-one")
    applyArgs(statePath)(df(
      (1L, text("tailA"), false),
      (2L, text("tailB"), false),     // near-dup of 1 -> d2 drops
      (3L, distinctText(1), false),
      (4L, distinctText(1), false),   // exact dup of 3
      (5L, lowQ, false),              // gate drop
      (6L, contaminated(1), false),   // shares ev1..ev8 with eval
      (100L, evalText, true)), 0L)
    assert(verdicts(statePath) === Map(
      1L -> "kept", 2L -> "near_dup", 3L -> "kept", 4L -> "exact_dup",
      5L -> "gate", 6L -> "decon", 100L -> "eval"))
  }

  test("state accumulates: retained docs never revisit, arriving dups " +
    "drop, decon uses earlier batches' eval; replay is idempotent") {
    val statePath = tmpDir("curate-stream-acc")
    val apply = applyArgs(statePath)
    apply(df((1L, text("tailA"), false), (100L, evalText, true)), 0L)
    assert(verdicts(statePath) === Map(1L -> "kept", 100L -> "eval"))

    apply(df(
      (2L, text("tailB"), false),      // near-dup of RETAINED 1 -> 2 drops
      (3L, text("tailA"), false),      // exact dup of retained 1
      (6L, contaminated(2), false),    // batch-0 eval shingles still gate
      (7L, distinctText(3), false)), 1L)
    val want = Map(1L -> "kept", 100L -> "eval", 2L -> "near_dup",
      3L -> "exact_dup", 6L -> "decon", 7L -> "kept")
    assert(verdicts(statePath) === want) // 1 and 100 unchanged

    // at-least-once replay of batch 1: identical ledger, nothing doubled
    apply(df(
      (2L, text("tailB"), false), (3L, text("tailA"), false),
      (6L, contaminated(2), false), (7L, distinctText(3), false)), 1L)
    assert(verdicts(statePath) === want)
    assert(CurateStream.ledger(spark, statePath, "doc_id").count() === 6L)
  }

  test("end-to-end through a streaming query over MemoryStream") {
    val statePath = tmpDir("curate-stream-e2e")
    val ckpt = tmpDir("curate-stream-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Boolean)]
    in.addData((10L, text("tailX"), false), (100L, evalText, true))
    val q1 = CurateStream.start(
      in.toDF().toDF("doc_id", "text", "is_eval"), statePath,
      "doc_id", "text", "is_eval", 0.5, 0.2, ckpt)
    q1.awaitTermination(60000)
    assert(verdicts(statePath) === Map(10L -> "kept", 100L -> "eval"))

    in.addData((11L, text("tailY"), false), (12L, contaminated(9), false))
    val q2 = CurateStream.start(
      in.toDF().toDF("doc_id", "text", "is_eval"), statePath,
      "doc_id", "text", "is_eval", 0.5, 0.2, ckpt)
    q2.awaitTermination(60000)
    assert(verdicts(statePath) === Map(10L -> "kept", 100L -> "eval",
      11L -> "near_dup", 12L -> "decon"))
  }
}
