package graft.ops

import graft.SparkSpec

/** X78 bitext margin: exact agreement with a driver-side reference of
  * the integer margin pipeline (quantize → IEEE cosine → floor micro →
  * NN sums → integral division → top-1), the hubness-correction
  * property the margin exists for, and the negative-cosine drop rule.
  */
class BitextMarginSpec extends SparkSpec {

  import spark.implicits._

  /** Reference: same arithmetic, driver-side. */
  private def ref(a: Seq[(Long, Seq[Float])], b: Seq[(Long, Seq[Float])],
                  k: Int): Map[Long, (Long, Long)] = {
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.floor(x.toDouble * 1000).toLong)
    def cmicro(x: Seq[Long], y: Seq[Long]): Long = {
      val dot = x.zip(y).map { case (p, q) => p * q }.sum.toDouble
      val cos = dot / (math.sqrt(x.map(p => p * p).sum.toDouble) *
        math.sqrt(y.map(q => q * q).sum.toDouble))
      math.floor(cos * 1000000L).toLong
    }
    val qa = a.map { case (i, v) => i -> quant(v) }
    val qb = b.map { case (i, v) => i -> quant(v) }
    val pairs = for ((ai, av) <- qa; (bi, bv) <- qb)
      yield (ai, bi, cmicro(av, bv))
    val sa = pairs.groupBy(_._1).map { case (ai, ps) =>
      ai -> ps.sortBy(p => (-p._3, p._2)).take(k).map(_._3).sum }
    val sb = pairs.groupBy(_._2).map { case (bi, ps) =>
      bi -> ps.sortBy(p => (-p._3, p._1)).take(k).map(_._3).sum }
    pairs
      .filter(p => p._3 >= 0 && sa(p._1) + sb(p._2) > 0)
      .map { case (ai, bi, c) =>
        (ai, bi, c * 2 * k * 1000000L / (sa(ai) + sb(bi))) }
      .groupBy(_._1)
      .map { case (ai, ms) =>
        val best = ms.minBy(m => (-m._3, m._2))
        ai -> (best._2, best._3)
      }
  }

  private def run(a: Seq[(Long, Seq[Float])], b: Seq[(Long, Seq[Float])],
                  k: Int): Map[Long, (Long, Long)] =
    Similarity.bitextMargin(a.toDF("vec_id", "embedding"),
        b.toDF("vec_id", "embedding"), "vec_id", "embedding", k)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("matches the reference on a deterministic vector set") {
    // pseudo-random but fixed vectors (no RNG: i-arithmetic)
    val a = (0L until 6L).map(i => i -> (0 until 8)
      .map(d => (((i * 7 + d * 13) % 19).toFloat - 9f) / 10f))
    val b = (100L until 108L).map(i => i -> (0 until 8)
      .map(d => (((i * 11 + d * 3) % 17).toFloat - 8f) / 10f))
    for (k <- Seq(1, 3))
      assert(run(a, b, k) === ref(a, b, k), s"k=$k")
  }

  test("margin corrects hubness: the hub's absolute-cosine win is vetoed") {
    // b10 is a "hub": a1 sits almost on top of it (cos ~.997) and a2 is
    // also drawn to it (cos ~.66 — a2's best PLAIN cosine). b11 is a2's
    // modest exclusive partner (cos ~.62, and a2 is b11's best). The
    // flip condition c11·sb10 > c10² holds (.62·.997 > .66²), so the
    // margin vetoes the hub for a2 while plain cosine would not.
    val a = Seq(
      1L -> Seq(0.75f, 0.65f, 0f),
      2L -> Seq(0f, 1f, 0.4f))
    val b = Seq(
      10L -> Seq(0.7f, 0.7f, 0f), // the hub
      11L -> Seq(0f, 0.3f, 1f)) // a2's exclusive partner
    val got = run(a, b, 1)
    assert(got(1L)._1 === 10L)
    assert(got(2L)._1 === 11L, s"expected the margin to veto the hub: $got")
  }

  test("anti-correlated queries drop entirely") {
    val a = Seq(1L -> Seq(1f, 0f), 2L -> Seq(-1f, 0f))
    val b = Seq(10L -> Seq(1f, 0.5f))
    val got = run(a, b, 1)
    assert(got.contains(1L) && !got.contains(2L))
  }
}
