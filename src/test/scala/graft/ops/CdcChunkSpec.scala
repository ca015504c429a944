package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** X49/X50 content-defined chunking invariants beyond the DuckDB
  * oracle: exact tiling, the shift-resilience property that justifies
  * content-defined boundaries, short-blob handling, and the dedup
  * ledger.
  */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(docs: Seq[(Long, String)]): DataFrame =
    Multimodal.cdcChunks(
      Multimodal.attachBlob(docs.toDF("doc_id", "text"), "doc_id", "text"),
      "doc_id", "blob", kb = 8, hexZeros = 1)

  private def rows(docs: Seq[(Long, String)]): Seq[(Long, Int, Int, Int, String)] =
    chunks(docs).orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4))).toSeq

  private val longText = (1 to 40).map(i => s"tok$i").mkString(" ")

  test("chunks tile the blob exactly: contiguous 1-based spans summing to len") {
    val got = rows(Seq(1L -> longText)).map(r => (r._2, r._3, r._4))
    assert(got.head._2 === 1) // first chunk starts at byte 1
    got.sliding(2).foreach {
      case Seq((_, s1, l1), (_, s2, _)) => assert(s2 === s1 + l1)
      case _ =>
    }
    assert(got.map(_._3).sum === longText.length)
    assert(got.size > 2, s"expected several chunks, got ${got.size}")
  }

  test("shift resilience: a prefix insertion changes only the first chunk") {
    // the defining CDC property (LBFS): boundaries depend on local
    // window content, so after an insertion every later boundary —
    // and therefore every later chunk hash — re-aligns
    val a = rows(Seq(1L -> longText)).map(_._5)
    val b = rows(Seq(1L -> s"zzzz $longText")).map(_._5)
    assert(a.drop(1).toSet.subsetOf(b.toSet),
      "post-insertion chunks failed to re-align")
    assert(!b.contains(a.head)) // the shifted first chunk differs
  }

  test("a blob shorter than the window is one whole-blob chunk") {
    val got = rows(Seq(1L -> "tiny"))
    assert(got === Seq((1L, 0, 1, 4, got.head._5)))
  }

  test("the dedup ledger counts identical chunks across documents") {
    val ck = chunks(Seq(1L -> longText, 2L -> longText))
    val perDoc = ck.filter("doc_id = 1").count()
    val distinctHashes = ck.filter("doc_id = 1")
      .select("chunk_md5").distinct().count()
    val led = Multimodal.chunkDedup(ck, "doc_id")
      .as[(String, Long, Long)].collect().toSeq
    // identical docs: every distinct hash appears in both, copies double
    assert(led.size === distinctHashes.toInt)
    assert(led.forall(_._3 === 2L)) // n_docs = 2 for every hash
    assert(led.map(_._2).sum === 2 * perDoc) // total copies = both chunk sets
  }
}
