package graft.ops

import graft.SparkSpec

class BleuPairedSpec extends SparkSpec {
  import spark.implicits._

  private def triples(rows: (String, Long, String, String, String)*) =
    rows.toDF("grp", "pid", "hyp_a", "hyp_b", "ref")

  test("a clearly better system wins every resample and flags significant") {
    val ps = (1L to 50L).map(i => ("g", i,
      s"w$i the cat sat", // A: near-perfect
      "q r s t",          // B: disjoint
      s"w$i the cat lay"))
    val r = BleuCi.bleuPairedTest(triples(ps: _*), "grp", "pid",
      "hyp_a", "hyp_b", "ref", maxN = 2, nBoot = 40).collect().head
    assert(r.getAs[Double]("bleu_a") > r.getAs[Double]("bleu_b"))
    assert(r.getAs[Long]("wins_a") === 40 && r.getAs[Long]("n_boot") === 40)
    assert(r.getAs[Boolean]("significant"))
    assert(r.getAs[Double]("share_a") === 1.0)
  }

  test("identical systems tie every resample and are not significant") {
    val ps = (1L to 50L).map(i => ("g", i, s"w$i a b", s"w$i a b", s"w$i a c"))
    val r = BleuCi.bleuPairedTest(triples(ps: _*), "grp", "pid",
      "hyp_a", "hyp_b", "ref", maxN = 1, nBoot = 40).collect().head
    assert(r.getAs[Double]("bleu_a") === r.getAs[Double]("bleu_b"))
    assert(r.getAs[Long]("wins_a") === 0 && r.getAs[Long]("ties") === 40)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("near-equal systems split resamples (pairing shares multiplicities)") {
    // A and B swap which half of the corpus they nail — per-resample
    // weights decide each comparison, so neither sweeps
    val ps = (1L to 60L).map { i =>
      if (i % 2 == 0) ("g", i, s"w$i a b", "x y z", s"w$i a b")
      else ("g", i, "x y z", s"w$i a b", s"w$i a b")
    }
    val r = BleuCi.bleuPairedTest(triples(ps: _*), "grp", "pid",
      "hyp_a", "hyp_b", "ref", maxN = 1, nBoot = 40).collect().head
    val wins = r.getAs[Long]("wins_a")
    val ties = r.getAs[Long]("ties")
    assert(wins > 0 && wins + ties < 40, s"wins=$wins ties=$ties")
    assert(!r.getAs[Boolean]("significant"))
  }

  test("deterministic across runs") {
    val ps = (1L to 40L).map(i => ("g", i, s"w$i a b", s"w$i a",
      if (i % 2 == 0) s"w$i a b" else "p q"))
    val run = () => BleuCi.bleuPairedTest(triples(ps: _*), "grp", "pid",
      "hyp_a", "hyp_b", "ref", maxN = 1, nBoot = 40)
      .collect().head
    val (r1, r2) = (run(), run())
    assert(r1.getAs[Long]("wins_a") === r2.getAs[Long]("wins_a"))
    assert(r1.getAs[Double]("share_a") === r2.getAs[Double]("share_a"))
  }
}
