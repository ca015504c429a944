package graft.streaming

import graft.SparkSpec
import graft.engine.Tables
import graft.ops.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X49/X50 streaming form: the accumulated chunk table and ledger
  * reconstruct the batch operators exactly, cross-batch duplicates are
  * flagged via prior-copy counts, and replay is idempotent.
  */
class CdcChunkStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Kb = 8
  private val Zeros = 1

  // real corpus texts give real (md5-driven) chunk boundaries
  private lazy val texts = Tables.documents(spark, "/root/testdata/sf0.001")
    .select("text").as[String].collect().take(3).toSeq

  private def blobs(rows: (Long, String)*): DataFrame =
    Multimodal.attachBlob(rows.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "blob")

  private def chunkSet(df: DataFrame): Set[(Long, Int, Int, Int, String)] =
    df.select("doc_id", "chunk_idx", "start", "clen", "chunk_md5")
      .as[(Long, Int, Int, Int, String)].collect().toSet

  test("accumulated state reconstructs the batch operators; cross-batch " +
    "dups flagged; replay idempotent") {
    val statePath = tmpDir("cdc-chunk-stream")
    val apply = CdcChunkStream.applyBatch(
      statePath, "doc_id", "blob", Kb, Zeros) _

    // batch 0: two distinct docs; batch 1: doc 3 duplicates doc 1's
    // content byte-for-byte, doc 4 is fresh
    apply(blobs(1L -> texts(0), 2L -> texts(1)), 0L)
    apply(blobs(3L -> texts(0), 4L -> texts(2)), 1L)

    val allDocs = blobs(1L -> texts(0), 2L -> texts(1),
      3L -> texts(0), 4L -> texts(2))
    val batchChunks = Multimodal.cdcChunks(allDocs, "doc_id", "blob",
      Kb, Zeros)

    // 1) accumulated chunk table == batch-mode chunking of the corpus
    assert(chunkSet(CdcChunkStream.chunks(spark, statePath, "doc_id")) ===
      chunkSet(batchChunks))

    // 2) doc 3's chunks are exact copies of doc 1's: every one of its
    // hashes must carry n_prior_copies > 0 in the batch-1 ledger
    val doc1Hashes = chunkSet(batchChunks).filter(_._1 == 1L).map(_._5)
    val flagged = CdcChunkStream.ledger(spark, statePath)
      .filter(col("n_prior_copies") > 0)
      .select("chunk_md5").as[String].collect().toSet
    assert(doc1Hashes.nonEmpty)
    assert(doc1Hashes.subsetOf(flagged))

    // 3) per-hash ledger sums reconstruct the batch dedup ledger
    val fromLedger = CdcChunkStream.ledger(spark, statePath)
      .groupBy("chunk_md5")
      .agg(sum("n_new_copies").as("n_copies"), sum("n_new_docs").as("n_docs"))
      .filter(col("n_copies") > 1)
      .as[(String, Long, Long)].collect().toSet
    val fromBatch = Multimodal.chunkDedup(batchChunks, "doc_id")
      .select("chunk_md5", "n_copies", "n_docs")
      .as[(String, Long, Long)].collect().toSet
    assert(fromLedger === fromBatch)

    // 4) at-least-once: replaying batch 1 changes nothing
    apply(blobs(3L -> texts(0), 4L -> texts(2)), 1L)
    assert(chunkSet(CdcChunkStream.chunks(spark, statePath, "doc_id")) ===
      chunkSet(batchChunks))
    assert(CdcChunkStream.ledger(spark, statePath)
      .groupBy("chunk_md5")
      .agg(sum("n_new_copies").as("n_copies"), sum("n_new_docs").as("n_docs"))
      .filter(col("n_copies") > 1)
      .as[(String, Long, Long)].collect().toSet === fromBatch)
  }

  test("end-to-end through a streaming query over MemoryStream") {
    val statePath = tmpDir("cdc-chunk-e2e")
    val ckpt = tmpDir("cdc-chunk-ckpt")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    in.addData(10L -> texts(0))
    val src = Multimodal.attachBlob(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "blob")
    val q1 = CdcChunkStream.start(src, statePath, "doc_id", "blob", ckpt,
      Kb, Zeros)
    q1.awaitTermination(60000)
    assert(CdcChunkStream.ledger(spark, statePath)
      .filter(col("n_prior_copies") > 0).count() === 0L)

    in.addData(11L -> texts(0)) // byte-identical content arrives later
    val q2 = CdcChunkStream.start(src, statePath, "doc_id", "blob", ckpt,
      Kb, Zeros)
    q2.awaitTermination(60000)
    val flagged = CdcChunkStream.ledger(spark, statePath)
      .filter(col("n_prior_copies") > 0).count()
    assert(flagged > 0L, "cross-batch duplicate chunks must be flagged")
  }
}
