package graft.ops

import graft.SparkSpec

/** X162 minhash fidelity + x163 vocabulary overlap: exact-duplicate
  * fidelity row, self-consistency of the error lanes on a near-dup
  * pair, and hand-counted vocabulary Jaccards with the zero-overlap
  * grid row.
  */
class FidelityOverlapSpec extends SparkSpec {

  import spark.implicits._

  private val template = (1 to 40).map(i => s"tok$i").mkString(" ")

  test("minhashFidelity: an exact duplicate is the only candidate " +
    "pair -> one row at full agreement with zero error") {
    val docs = Seq(
      1L -> template,
      2L -> template, // exact duplicate of 1
      3L -> (1 to 40).map(i => s"aaa$i").mkString(" "),
      4L -> (1 to 40).map(i => s"bbb$i").mkString(" ")
    ).toDF("doc_id", "text")
    val got = Dedup.minhashFidelity(docs, "doc_id", "text", 16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === Seq((16L, 1000000L, 1L, 1000000L, 0L, 0L)))
  }

  test("minhashFidelity: a near-duplicate's row is self-consistent " +
    "with the exact set Jaccard computed independently") {
    val variant = (1 to 39).map(i => s"tok$i").mkString(" ") + " CHANGED"
    val docs = Seq(1L -> template, 2L -> variant)
      .toDF("doc_id", "text")
    val rows = Dedup.minhashFidelity(docs, "doc_id", "text", 16, 4)
      .collect()
    assert(rows.length === 1, "the variant must collide in >= 1 band")
    val r = rows.head
    val (nAgree, est, nPairs, avgJac, avgErr, maxErr) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    // independent truth: 3-shingle sets of the two texts
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val (s1, s2) = (sh(template), sh(variant))
    val jac = BigDecimal(s1.intersect(s2).size.toDouble /
      s1.union(s2).size).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val jacMicro = math.round(jac.toDouble * 1000000)
    assert(nPairs === 1L && avgJac === jacMicro)
    assert(est === nAgree * 1000000L / 16)
    assert(avgErr === math.abs(est - jacMicro) && maxErr === avgErr)
    assert(nAgree >= 1L && nAgree < 16L,
      "one changed shingle must break at least one lane")
  }

  test("vocabOverlap: hand-counted type Jaccards, the zero-overlap " +
    "grid row, and the null exclusions") {
    val docs = Seq(
      ("A", "a b c"), ("A", "c d"),
      ("B", "c d e"),
      ("C", "x"),
      (null, "ignored"), ("A", null)
    ).toDF("source", "text")
    val got = CorpusStats.vocabOverlap(docs, "source", "text")
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === Seq(
      ("A", "B", 4L, 3L, 2L, 400000L), // {c,d} of {a,b,c,d,e}
      ("A", "C", 4L, 1L, 0L, 0L),
      ("B", "C", 3L, 1L, 0L, 0L)))
  }
}
