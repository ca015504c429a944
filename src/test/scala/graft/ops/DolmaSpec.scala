package graft.ops

import graft.SparkSpec

/** X87 batch gate: the bloom-gated decontamination equals the exact
  * (ungated) reference, dense bookkeeping, and the empty-reference
  * edge.
  */
class DolmaSpec extends SparkSpec {

  import spark.implicits._

  private val (m, k) = (1 << 12, 4)

  test("gate + verify equals the exact join (lossless), dense over docs") {
    val docs = Seq((1L, "a\nb\nc"), (2L, "b\nd"), (3L, "x\ny"))
      .toDF("doc_id", "page")
    val ref = Seq((100L, "b\nz"), (101L, "c")).toDF("doc_id", "page")
    val got = Dolma.paragraphDecontaminate(docs, ref, "doc_id", "page", m, k)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === Map(
      1L -> (3L, 2L, "a"),    // b and c both in ref
      2L -> (2L, 1L, "d"),
      3L -> (2L, 0L, "x\ny"))) // clean doc still reported
  }

  test("an empty reference removes nothing") {
    val docs = Seq((1L, "a\nb")).toDF("doc_id", "page")
    val ref = Seq.empty[(Long, String)].toDF("doc_id", "page")
    val got = Dolma.paragraphDecontaminate(docs, ref, "doc_id", "page", m, k)
      .as[(Long, Long, Long, String)].collect().head
    assert(got === ((1L, 2L, 0L, "a\nb")))
  }

  test("repeated in-doc copies of a referenced paragraph all drop") {
    val docs = Seq((1L, "b\na\nb\nb")).toDF("doc_id", "page")
    val ref = Seq((100L, "b")).toDF("doc_id", "page")
    val got = Dolma.paragraphDecontaminate(docs, ref, "doc_id", "page", m, k)
      .as[(Long, Long, Long, String)].collect().head
    assert(got === ((1L, 4L, 3L, "a")))
  }

  test("bitmap size derives from reference cardinality, capped loudly") {
    // minimum respected for small refs
    assert(Dolma.derivedBits(1 << 12, 10) === (1 << 12))
    // grows at BitsPerKey bits per digest, word-rounded
    assert(Dolma.derivedBits(64, 1000) === (1000 * Dolma.BitsPerKey + 63) / 64 * 64)
    // hard cap at the driver-artifact bound
    assert(Dolma.derivedBits(64, 1L << 40) === Bloom.MaxBits)
    // below the cap the derived geometry keeps the gate selective...
    assert(Dolma.bloomFpRate(Dolma.derivedBits(64, 1000000), 4, 1000000)
      < 0.02)
    // ...and a corpus-scale prior release saturates it past MaxFpRate,
    // which is exactly when the gate is skipped for the exact semi join
    assert(Dolma.bloomFpRate(Bloom.MaxBits, 4, 20000000L)
      > Dolma.MaxFpRate)
    // empty reference: fully selective, never skipped
    assert(Dolma.bloomFpRate(Dolma.derivedBits(64, 0), 4, 0) === 0.0)
  }
}
