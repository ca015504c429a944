package graft.ops

import graft.SparkSpec

class BleuSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: (String, Long, String, String)*) =
    rows.toDF("grp", "pid", "hyp", "ref")

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("identical hyp and ref scores exactly 1") {
    val r = Bleu.corpusBleu(pairs(("g", 1L, "a b c d e", "a b c d e")),
      "grp", "pid", "hyp", "ref").collect().head
    assert(r.getAs[Double]("bleu") === 1.0)
  }

  test("clipped counts match the paper's worked shape; zero m4 zeroes BLEU-4") {
    val p = pairs(("g", 1L, "the cat the cat on the mat", "the cat is on the mat"))
    val r4 = Bleu.corpusBleu(p, "grp", "pid", "hyp", "ref", maxN = 4)
      .collect().head
    // hand-derived: m1=5/7 (the clipped to 2), m2=3/6, m3=1/5, m4=0/4
    assert(r4.getAs[Long]("m1") === 5 && r4.getAs[Long]("t1") === 7)
    assert(r4.getAs[Long]("m2") === 3 && r4.getAs[Long]("t2") === 6)
    assert(r4.getAs[Long]("m3") === 1 && r4.getAs[Long]("t3") === 5)
    assert(r4.getAs[Long]("m4") === 0 && r4.getAs[Long]("t4") === 4)
    assert(r4.getAs[Double]("bleu") === 0.0) // unsmoothed: any p_n = 0

    val r3 = Bleu.corpusBleu(p, "grp", "pid", "hyp", "ref", maxN = 3)
      .collect().head
    val expected = round6(math.exp(
      (math.log(5.0 / 7) + math.log(3.0 / 6) + math.log(1.0 / 5)) / 3))
    assert(r3.getAs[Double]("bleu") === expected) // c=7 > r=6: BP = 1
  }

  test("empty hypothesis or reference contributes zero counts, not a phantom token") {
    // split('', ' ') = [""] — without the length filter an empty side
    // would carry t1=1, c=1 and a matchable "" unigram
    val r = Bleu.corpusBleu(
      pairs(("g", 1L, "", "a b"), ("g", 2L, "a", ""), ("g", 3L, "a b", "a b")),
      "grp", "pid", "hyp", "ref", maxN = 2).collect().head
    // pair 1: c += 0; pair 2: c += 1, m1 += 0 ("" ref holds no grams);
    // pair 3: c += 2, m1 += 2, m2 += 1
    assert(r.getAs[Long]("c") === 3 && r.getAs[Long]("r") === 4)
    assert(r.getAs[Long]("m1") === 2 && r.getAs[Long]("t1") === 3)
    assert(r.getAs[Long]("m2") === 1 && r.getAs[Long]("t2") === 1)
  }

  test("brevity penalty: short hyp with perfect precision") {
    val r = Bleu.corpusBleu(pairs(("g", 1L, "a b", "a b c d")),
      "grp", "pid", "hyp", "ref", maxN = 2).collect().head
    assert(r.getAs[Long]("c") === 2 && r.getAs[Long]("r") === 4)
    assert(r.getAs[Double]("bleu") === round6(math.exp(1.0 - 4.0 / 2)))
  }

  test("clipping is per pair, not per corpus") {
    val r = Bleu.corpusBleu(
      pairs(("g", 1L, "a a", "a"), ("g", 2L, "a", "a a")),
      "grp", "pid", "hyp", "ref", maxN = 1).collect().head
    // per-pair: min(2,1) + min(1,2) = 2 of 3; global clipping would say 3
    assert(r.getAs[Long]("m1") === 2 && r.getAs[Long]("t1") === 3)
    assert(r.getAs[Double]("bleu") === round6(2.0 / 3))
  }

  test("disjoint texts score 0 and keep exact zero counts") {
    val r = Bleu.corpusBleu(pairs(("g", 1L, "x y z", "p q r")),
      "grp", "pid", "hyp", "ref", maxN = 2).collect().head
    assert(r.getAs[Long]("m1") === 0 && r.getAs[Long]("m2") === 0)
    assert(r.getAs[Double]("bleu") === 0.0)
  }

  test("maxN is range-checked") {
    intercept[IllegalArgumentException] {
      Bleu.corpusBleu(pairs(("g", 1L, "a", "a")), "grp", "pid", "hyp", "ref",
        maxN = 0)
    }
  }
}
