package graft.streaming

import graft.SparkSpec
import graft.ops.{C4, Dolma}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** X87 streaming form: single batch equals the batch span=1 dedup, the
  * admitted set accumulates point-in-time (first stream occurrence
  * wins, later batches excise), digest-only novel state, replay
  * idempotent, and an end-to-end run through the real streaming engine.
  */
class ParagraphDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val (m, k) = (1 << 12, 4)

  private def df(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "page")

  private def emitted(statePath: String): Map[Long, (Long, Long, String)] =
    ParagraphDedupStream.cleaned(spark, statePath, "doc_id")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("a single batch equals batch-mode span=1 dedup exactly") {
    val statePath = tmpDir("pd-single")
    val rows = Seq((1L, "p1\np2\np1"), (2L, "p2\np3"), (3L, "p3\np3"))
    ParagraphDedupStream.applyBatch(statePath, "doc_id", "page", m, k)(
      df(rows: _*), 0L)
    val batch = C4.spanDedup(rows.toDF("doc_id", "page"),
        "doc_id", "page", span = 1)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // doc 3 empties: p3's first occurrence is (doc 2, idx 2), so BOTH
    // of doc 3's copies are later occurrences
    assert(batch === Map(
      1L -> (3L, 1L, "p1\np2"), 2L -> (2L, 1L, "p3"), 3L -> (2L, 2L, "")))
    assert(emitted(statePath) === batch)
  }

  test("paragraphs admitted earlier excise later batches; " +
    "emissions are never re-cut") {
    val statePath = tmpDir("pd-multi")
    val apply = ParagraphDedupStream.applyBatch(
      statePath, "doc_id", "page", m, k) _
    apply(df((1L, "p1\np2")), 0L)
    assert(emitted(statePath) === Map(1L -> (2L, 0L, "p1\np2")))
    // batch 1: p2 was admitted in batch 0 -> excised; p4 is new
    apply(df((2L, "p2\np4")), 1L)
    assert(emitted(statePath) === Map(
      1L -> (2L, 0L, "p1\np2"), 2L -> (2L, 1L, "p4")))
    // batch 2: everything already admitted -> the doc empties
    apply(df((3L, "p4\np1")), 2L)
    assert(emitted(statePath)(3L) === ((2L, 2L, "")))
    // batch 2 equals batch-mode decontaminate against batches 0..1
    val prior = Dolma.paragraphDigests(
      df((1L, "p1\np2"), (2L, "p4")), "doc_id", "page").select(col("d"))
    val ref = Dolma.paragraphDecontaminateAgainst(df((3L, "p4\np1")),
        prior, "doc_id", "page", m, k)
      .as[(Long, Long, Long, String)].collect().head
    assert((ref._2, ref._3, ref._4) === emitted(statePath)(3L))
  }

  test("state admits novel digests only; replay is idempotent") {
    val statePath = tmpDir("pd-novel")
    val apply = ParagraphDedupStream.applyBatch(
      statePath, "doc_id", "page", m, k) _
    apply(df((1L, "p1\np2\np1")), 0L)
    // p1 admitted once despite two occurrences
    assert(spark.read.parquet(s"$statePath/pdig").count() === 2L)
    // an already-admitted paragraph adds no state
    apply(df((2L, "p2\np9")), 1L)
    assert(spark.read.parquet(s"$statePath/pdig").count() === 3L)
    // replay of batch 1: identical prior state, identical partitions
    apply(df((2L, "p2\np9")), 1L)
    assert(spark.read.parquet(s"$statePath/pdig").count() === 3L)
    assert(emitted(statePath)(2L) === ((2L, 1L, "p9")))
  }

  test("a document duplicated within a batch is cut and admitted once") {
    val statePath = tmpDir("pd-dup")
    ParagraphDedupStream.applyBatch(statePath, "doc_id", "page", m, k)(
      df((1L, "p1\np2"), (1L, "p1\np2")), 0L)
    val rows = ParagraphDedupStream.cleaned(spark, statePath, "doc_id")
      .collect()
    assert(rows.length === 1)
    assert(emitted(statePath)(1L) === ((2L, 0L, "p1\np2")))
    assert(spark.read.parquet(s"$statePath/pdig").count() === 2L)
  }

  test("end to end through the streaming engine") {
    val statePath = tmpDir("pd-e2e")
    val src = tmpDir("pd-src")
    df((1L, "p1\np2"), (2L, "p2\np3")).write.mode("overwrite").parquet(src)
    val q = ParagraphDedupStream.start(
      spark.readStream.schema("doc_id LONG, page STRING").parquet(src),
      statePath, "doc_id", "page", m, k, tmpDir("pd-ckpt"))
    q.awaitTermination(60000)
    val out = emitted(statePath)
    assert(out(1L)._1 === 2L)
    assert(out.values.map(_._2).sum === 1L, // exactly one dup stream-wide
      s"one duplicate paragraph must drop: $out")
  }
}
