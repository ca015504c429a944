package graft.ops

import graft.SparkSpec

class EditVerifySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // 3 edits from 1
    (3L, "completely unrelated text about spark plans"),
    (4L, ""),
    (5L, "")).toDF("doc_id", "text")

  private def cands(ps: (Long, Long)*) = ps.toDF("d1", "d2")

  test("distance, max_len and exact-integer similarity per candidate") {
    val r = Dedup.editVerify(docs, cands(1L -> 2L, 1L -> 3L),
        "doc_id", "text", 900000L)
      .orderBy("d1", "d2").collect()
    assert(r(0).getLong(2) === 3)  // dog -> cat
    assert(r(0).getLong(3) === 43)
    assert(r(0).getLong(4) === (43L - 3L) * 1000000L / 43L)
    assert(r(0).getBoolean(5))
    assert(!r(1).getBoolean(5))    // unrelated pair rejected
  }

  test("two empty texts are a perfect match, not a division by zero") {
    val r = Dedup.editVerify(docs, cands(4L -> 5L), "doc_id", "text", 900000L)
      .collect()
    assert(r.head.getLong(2) === 0 && r.head.getLong(3) === 0)
    assert(r.head.getLong(4) === 1000000L && r.head.getBoolean(5))
  }

  test("threshold is inclusive and range-checked") {
    val simPpm = (43L - 3L) * 1000000L / 43L
    val at = Dedup.editVerify(docs, cands(1L -> 2L), "doc_id", "text", simPpm)
      .collect().head
    assert(at.getBoolean(5))
    val above = Dedup.editVerify(docs, cands(1L -> 2L), "doc_id", "text",
      simPpm + 1).collect().head
    assert(!above.getBoolean(5))
    intercept[IllegalArgumentException] {
      Dedup.editVerify(docs, cands(1L -> 2L), "doc_id", "text", 1000001L)
    }
  }

  test("only candidate pairs are scored — output is candidate-sized") {
    val r = Dedup.editVerify(docs, cands(1L -> 2L), "doc_id", "text", 0L)
    assert(r.count() === 1)
  }

  test("loose 2-sig bands recall strictly more candidates than 4-sig") {
    val sigs = Dedup.docSignatures(docs.filter($"text" =!= ""),
      "doc_id", "text", numSigs = 16)
    val loose = Dedup.lshCandidates(sigs, "doc_id", 16, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tight = Dedup.lshCandidates(sigs, "doc_id", 16, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.subsetOf(loose))
  }
}
