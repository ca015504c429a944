package graft.ops

import graft.SparkSpec

/** X85 Zipf fit: agreement with a driver-side micro-nat reference,
  * a perfect synthetic Zipf corpus recovering slope ≈ −1, and the
  * degenerate-vocabulary guard.
  */
class CorpusStatsSpec extends SparkSpec {

  import spark.implicits._

  /** Reference: identical micro-nat moments in BigInt. */
  private def ref(freqs: Seq[(String, Long)]): (Long, Double, Double) = {
    val ranked = freqs.sortBy { case (w, f) => (-f, w) }.zipWithIndex
    val pts = ranked.map { case ((_, f), i) =>
      (BigInt(math.round(math.log((i + 1).toDouble) * 1000000)),
        BigInt(math.round(math.log(f.toDouble) * 1000000)))
    }
    val n = BigInt(pts.size)
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val num = (n * sxy - sx * sy).toDouble
    val den = (n * sxx - sx * sx).toDouble
    val slopeRaw = num / den
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (pts.size.toLong, r6(slopeRaw),
      r6((sy.toDouble - slopeRaw * sx.toDouble) / n.toDouble / 1000000.0))
  }

  private def corpus(freqs: Seq[(String, Long)]): Seq[(Long, String)] =
    Seq((1L, freqs.flatMap { case (w, f) =>
      Seq.fill(f.toInt)(w) }.mkString(" ")))

  test("matches the driver-side reference") {
    val freqs = Seq("alpha" -> 40L, "beta" -> 17L, "gamma" -> 9L,
      "delta" -> 5L, "eps" -> 2L, "zeta" -> 1L)
    val got = CorpusStats.zipfFit(
        corpus(freqs).toDF("doc_id", "text"), "text")
      .collect().head
    assert((got.getLong(0), got.getDouble(1), got.getDouble(2)) ===
      ref(freqs))
  }

  test("a perfect Zipf corpus recovers slope ~ -1") {
    // freq(rank) = floor(1200 / rank): an exact 1/rank law
    val freqs = (1 to 30).map(r => f"w$r%02d" -> (1200L / r))
    val got = CorpusStats.zipfFit(
        corpus(freqs).toDF("doc_id", "text"), "text")
      .collect().head
    assert(math.abs(got.getDouble(1) + 1.0) < 0.05,
      s"slope ${got.getDouble(1)} not ~ -1")
  }

  test("heavy frequency ties match the naive-order reference " +
    "(the two-level rank decomposition is order-free within a tie)") {
    // 40 hapax words + a handful of tied mid bands: the decomposition
    // assigns ranks within a tie in md5 order, the reference in word
    // order — the regression moments must agree exactly regardless
    val freqs = Seq("top" -> 50L, "mid1" -> 7L, "mid2" -> 7L,
      "mid3" -> 7L, "low1" -> 3L, "low2" -> 3L) ++
      (1 to 40).map(i => f"hapax$i%02d" -> 1L)
    val got = CorpusStats.zipfFit(
        corpus(freqs).toDF("doc_id", "text"), "text")
      .collect().head
    assert((got.getLong(0), got.getDouble(1), got.getDouble(2)) ===
      ref(freqs))
  }

  test("degenerate vocabulary raises in-plan") {
    val one = Seq((1L, "same same same")).toDF("doc_id", "text")
    val e = intercept[Exception](
      CorpusStats.zipfFit(one, "text").collect())
    assert(e.getMessage.contains("degenerate"))
  }

  test("vocab coverage: boundary splits, frequency ties, and the " +
    "past-vocabulary fallthrough") {
    import spark.implicits._
    val docs = Seq(("g", "a a a b b c"), ("t", "x x y y z"))
      .toDF("lang", "text")
    val got = CorpusStats.vocabCoverage(docs, "lang", "text",
        Seq(1L, 2L, 3L, 10L))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // g: freqs a=3 b=2 c=1 over 6 tokens, 3 types
    assert(got(("g", 1L)) === ((3L, 6L, 3L, 500000L, 500000L)))
    assert(got(("g", 2L)) === ((3L, 6L, 5L, 833333L, 166666L)))
    assert(got(("g", 3L)) === ((3L, 6L, 6L, 1000000L, 0L)))
    assert(got(("g", 10L)) === ((3L, 6L, 6L, 1000000L, 0L))) // fallthrough
    // t: x=2 y=2 z=1 over 5 tokens — S=1 lands INSIDE the tied freq-2
    // group: covered = 0 + 1*2 (the tie split never needs a type order)
    assert(got(("t", 1L)) === ((3L, 5L, 2L, 400000L, 600000L)))
    assert(got(("t", 2L)) === ((3L, 5L, 4L, 800000L, 200000L)))
    assert(got(("t", 3L)) === ((3L, 5L, 5L, 1000000L, 0L)))
  }

  test("burstiness: hand-worked Fano factors — Poisson-like, bursty, " +
    "and deterministic-uniform words; null text leaves the denominator") {
    import spark.implicits._
    // N = 4 non-null docs. a: counts [2,2,0,0] -> VMR (4*8-16)/(4*4)=1;
    // b: [4,0,0,0] -> (4*16-16)/16 = 3 (bursty); c: [1,1,1,1] -> 0
    // (every doc exactly once: zero variance, sub-Poisson)
    val docs = Seq(
      (1L, "a a b b b b c"), (2L, "a a c"), (3L, "c"), (4L, "c"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = CorpusStats.burstiness(docs, "doc_id", "text", minDf = 1L)
      .orderBy("w").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("a", 2L, 4L, 1000000L),
      ("b", 1L, 4L, 3000000L),
      ("c", 4L, 4L, 0L)))
  }

  test("unigramKl: hand-worked micro-nat lanes against the pooled " +
    "corpus") {
    import spark.implicits._
    // g1: a2 b1 (t_s 3); g2: a1 c1 (t_s 2); pool a3 b1 c1, T_c 5
    // g1 terms: a ln(10/9)->105361, b ln(5/3)->510826
    //   -> (2*105361 + 510826) / 3 = 240516
    // g2 terms: a ln(5/6)->-182322, c ln(5/2)->916291
    //   -> (916291 - 182322) / 2 = 366984 (trunc of 366984.5)
    val docs = Seq(("g1", "a a b"), ("g2", "a c"),
      ("g2", null.asInstanceOf[String])).toDF("lang", "text")
    val got = CorpusStats.unigramKl(docs, "lang", "text")
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("g1", 3L, 2L, 240516L), ("g2", 2L, 2L, 366984L)))
  }

  test("unigramKl of a single group is exactly zero (the clamp's " +
    "identity case: every term is ln(1))") {
    import spark.implicits._
    val docs = Seq(("g", "a a b"), ("g", "c")).toDF("lang", "text")
    val got = CorpusStats.unigramKl(docs, "lang", "text").collect()
    assert(got.map(_.getLong(3)).toSeq === Seq(0L))
  }

  test("burstiness minDf gates out the rare tail") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b b b b c"), (2L, "a a c"), (3L, "c"), (4L, "c"))
      .toDF("doc_id", "text")
    val got = CorpusStats.burstiness(docs, "doc_id", "text", minDf = 2L)
      .orderBy("w").collect().map(_.getString(0))
    assert(got.toSeq === Seq("a", "c")) // b (df = 1) gated
  }
}
