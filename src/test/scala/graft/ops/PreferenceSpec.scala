package graft.ops

import graft.SparkSpec

/** X157 Bradley-Terry: the driver-side Zermelo iteration on
  * hand-solvable matrices (symmetric stability, an exact 3:2 fixed
  * point, dominance ordering, floor-bounded normalization) and the
  * end-to-end wiring rules (same-source and tie pairs carry no
  * preference).
  */
class PreferenceSpec extends SparkSpec {

  import spark.implicits._

  test("iterate: a symmetric win matrix is the fixed point itself — " +
    "every strength stays exactly at SCALE") {
    val got = Preference.iterate(
      Map(("a", "b") -> 2L, ("b", "a") -> 2L), iters = 5)
    assert(got === Seq(("a", 4L, 2L, 1000000L), ("b", 4L, 2L, 1000000L)))
  }

  test("iterate: the smoothed 3:2 duel reaches its exact fixed point " +
    "in one step and stays there (1200000 / 800000)") {
    // raw wins a->b: 2, b->a: 1; smoothed w' = 3/2, n' = 5. With
    // p_a + p_b = 2e6 the denominators are equal, so raw strengths
    // split exactly 3:2 and renormalize to 1.2e6 / 0.8e6 — which sums
    // to 2e6 again: a true integer fixed point, iteration-count-proof
    for (it <- Seq(1, 3, 5)) {
      val got = Preference.iterate(
        Map(("a", "b") -> 2L, ("b", "a") -> 1L), iters = it)
      assert(got === Seq(("a", 3L, 2L, 1200000L),
        ("b", 3L, 1L, 800000L)), s"iters=$it")
    }
  }

  test("iterate: dominance ordering, raw-count lanes, and the " +
    "normalization floor bound on a 3-source chain") {
    val got = Preference.iterate(Map(
      ("a", "b") -> 5L, ("b", "a") -> 1L,
      ("b", "c") -> 4L), iters = 5)
    val m = got.map(g => g._1 -> g).toMap
    assert(m("a")._2 === 6L && m("a")._3 === 5L)
    assert(m("b")._2 === 10L && m("b")._3 === 5L)
    assert(m("c")._2 === 4L && m("c")._3 === 0L)
    assert(m("a")._4 > m("b")._4 && m("b")._4 > m("c")._4)
    // mean renormalized to SCALE, up to one floor per source
    val tot = got.map(_._4).sum
    assert(tot <= 3L * 1000000L && tot > 3L * 1000000L - 3L)
    // empty evidence -> empty ranking
    assert(Preference.iterate(Map.empty, 5) === Seq.empty)
  }

  test("bradleyTerry end-to-end: same-source and exact-tie pairs are " +
    "excluded; the surviving duel hits the exact 3:2 point") {
    val docs = Seq(
      (1L, "A", "a b c d"), // q = 1.0
      (2L, "B", "a a b b"), // q = 0.5
      (3L, "B", "e f g h"), // q = 1.0
      (4L, "A", "x x x y"), // q = 0.5
      (5L, "A", "p q r s")  // q = 1.0
    ).toDF("doc_id", "source", "text")
    val pairs = Seq(
      (1L, 2L), // A(1.0) beats B(0.5)
      (3L, 4L), // B(1.0) beats A(0.5)
      (5L, 2L), // A(1.0) beats B(0.5)
      (1L, 3L), // tie (1.0 = 1.0): excluded
      (1L, 5L), // same source: excluded
      (2L, 4L)  // tie (0.5 = 0.5): excluded
    ).toDF("d1", "d2")
    val got = Preference.bradleyTerry(docs, pairs, "doc_id", "source",
        "text", iters = 5)
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq(("A", 3L, 2L, 1200000L), ("B", 3L, 1L, 800000L)))
  }
}
