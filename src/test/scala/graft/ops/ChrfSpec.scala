package graft.ops

import graft.SparkSpec

class ChrfSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: (String, Long, String, String)*) =
    rows.toDF("grp", "pid", "hyp", "ref")

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("identical strings score exactly 1 at every order") {
    val r = Chrf.corpusChrf(pairs(("g", 1L, "abcdef gh", "abcdef gh")),
      "grp", "pid", "hyp", "ref").collect().head
    assert(r.getAs[Double]("chrf") === 1.0)
    assert(r.getAs[Long]("m6") === 3) // 8 chars despaced -> 3 six-grams
  }

  test("hand-worked asymmetric pair: counts, means, beta=2 weighting") {
    val r = Chrf.corpusChrf(pairs(("g", 1L, "ab", "abcd")),
      "grp", "pid", "hyp", "ref", maxN = 2).collect().head
    assert(r.getAs[Long]("m1") === 2 && r.getAs[Long]("h1") === 2
      && r.getAs[Long]("r1") === 4)
    assert(r.getAs[Long]("m2") === 1 && r.getAs[Long]("h2") === 1
      && r.getAs[Long]("r2") === 3)
    val p = (2.0 / 2 + 1.0 / 1) / 2
    val rr = (2.0 / 4 + 1.0 / 3) / 2
    assert(r.getAs[Double]("chrf") === round6(5 * p * rr / (4 * p + rr)))
  }

  test("spaces are removed before gramming") {
    val r = Chrf.corpusChrf(pairs(("g", 1L, "a b c", "abc")),
      "grp", "pid", "hyp", "ref", maxN = 2).collect().head
    assert(r.getAs[Double]("chrf") === 1.0)
  }

  test("clipping is per pair") {
    val r = Chrf.corpusChrf(pairs(("g", 1L, "aa", "a")),
      "grp", "pid", "hyp", "ref", maxN = 1).collect().head
    assert(r.getAs[Long]("m1") === 1 && r.getAs[Long]("h1") === 2)
  }

  test("orders beyond the text length drop from the means (effective order)") {
    val r = Chrf.corpusChrf(pairs(("g", 1L, "a", "a")),
      "grp", "pid", "hyp", "ref", maxN = 2).collect().head
    assert(r.getAs[Long]("h2") === 0 && r.getAs[Long]("r2") === 0)
    assert(r.getAs[Double]("chrf") === 1.0) // only order 1 contributes
  }

  test("disjoint strings score 0 with exact zero matches") {
    val r = Chrf.corpusChrf(pairs(("g", 1L, "xy", "pq")),
      "grp", "pid", "hyp", "ref", maxN = 2).collect().head
    assert(r.getAs[Long]("m1") === 0 && r.getAs[Long]("m2") === 0)
    assert(r.getAs[Double]("chrf") === 0.0)
  }

  test("supplementary-plane text grams at CODEPOINT grain (the BMP seam, " +
    "pinned): an astral char is one gram, never two surrogate halves") {
    // 𝄞 (U+1D11E) and 😀 (U+1F600) are outside the BMP — two UTF-16
    // units each. If Spark's split("") ever produced surrogate halves,
    // the identical pair below would still score 1 (halves match
    // halves) but the gram COUNTS would double — so the pin is on the
    // exact integer lanes, where a UTF-16-unit engine cannot hide.
    val r = Chrf.corpusChrf(pairs(("g", 1L, "a𝄞b", "a𝄞b")),
      "grp", "pid", "hyp", "ref", maxN = 2).collect().head
    assert(r.getAs[Long]("h1") === 3 && r.getAs[Long]("m1") === 3,
      "astral char must count as ONE unigram")
    assert(r.getAs[Long]("h2") === 2 && r.getAs[Long]("m2") === 2)
    assert(r.getAs[Double]("chrf") === 1.0)
    // and a cross-plane near-miss: hyp swaps the astral char — the
    // shared mass is exactly the 'a'/'b' unigrams, nothing fractional
    val d = Chrf.corpusChrf(pairs(("g", 1L, "a😀b", "a𝄞b")),
      "grp", "pid", "hyp", "ref", maxN = 1).collect().head
    assert(d.getAs[Long]("m1") === 2 && d.getAs[Long]("h1") === 3
      && d.getAs[Long]("r1") === 3)
  }

  test("recall weighting: beta=2 rewards covering the reference") {
    // same P+R mass, different split: high-recall pair must outscore
    val hiRecall = Chrf.corpusChrf(pairs(("g", 1L, "abcdxyzw", "abcd")),
      "grp", "pid", "hyp", "ref", maxN = 1).collect().head.getAs[Double]("chrf")
    val hiPrec = Chrf.corpusChrf(pairs(("g", 1L, "abcd", "abcdxyzw")),
      "grp", "pid", "hyp", "ref", maxN = 1).collect().head.getAs[Double]("chrf")
    assert(hiRecall > hiPrec)
  }
}
