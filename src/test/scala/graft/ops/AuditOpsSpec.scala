package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-15 audit trio: x133 Wilson intervals, x134 k-anonymity,
  * x135 soft-dedup weights — hand-worked fixtures plus naive replays.
  */
class AuditOpsSpec extends SparkSpec {

  import spark.implicits._

  // ---- x133 Wilson ----

  /** The engine's parenthesization replayed in driver doubles with the
    * same HALF_UP round-6 seam.
    */
  private def wilson(n: Long, nh: Long, z: Double,
                     sign: Int): Double = {
    val z2 = z * z
    val p = nh.toDouble / n
    val v = ((p + z2 / (2 * n)) + sign *
      (z * math.sqrt(p * (1 - p) / n + z2 / (4 * n.toDouble * n)))) /
      (1 + z2 / n)
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("wilsonRates: hand-counted groups match the closed form; the " +
    "interval brackets the rate and stays inside [0, 1]") {
    val df = Seq(("s1", true), ("s1", true), ("s1", true), ("s1", false),
      ("s2", true), ("s2", false),
      ("s3", false), ("s3", false), ("s3", false),
      ("s4", true)).toDF("source", "hit")
    val got = Eval.wilsonRates(df, "source", "hit")
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got.map(g => (g._1, g._2, g._3)) ===
      Seq(("s1", 4L, 3L), ("s2", 2L, 1L), ("s3", 3L, 0L), ("s4", 1L, 1L)))
    got.foreach { case (g, n, nh, rate, lo, hi) =>
      assert(lo === wilson(n, nh, 1.96, -1), g)
      assert(hi === wilson(n, nh, 1.96, +1), g)
      assert(lo >= 0.0 && hi <= 1.0, g)
      assert(lo <= rate && rate <= hi, g)
    }
    // extreme p-hat: the normal approximation would escape [0, 1];
    // Wilson does not (s3 all-fail, s4 single all-pass)
    val m = got.map(g => g._1 -> g).toMap
    assert(m("s3")._4 === 0.0 && m("s3")._5 === 0.0 && m("s3")._6 > 0.0)
    assert(m("s4")._4 === 1.0 && m("s4")._6 === 1.0 && m("s4")._5 < 1.0)
    // more data at the same rate tightens the interval
    val wide = Eval.wilsonRates(
      Seq.fill(40)(("s", true)) ++ Seq.fill(10)(("s", false))
        toDF("source", "hit"), "source", "hit").collect()(0)
    assert(wide.getDouble(5) - wide.getDouble(4) <
      m("s1")._6 - m("s1")._5)
  }

  // ---- x134 k-anonymity ----

  test("kAnonymity: class sizes, the risk flag, and the suppression " +
    "count over a hand-built quasi-identifier table") {
    val docs = (Seq.fill(5)(("en", "src0")) ++ Seq.fill(3)(("en", "src1"))
      ++ Seq(("fr", "src0")) ++ Seq.fill(2)(("de", "src2")))
      .toDF("lang", "source")
    val got = Pii.kAnonymity(docs, Seq("lang", "source"), k = 3L)
      .orderBy("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4))).toSeq
    assert(got === Seq(
      ("de", "src2", 2L, true, 3L),
      ("en", "src0", 5L, false, 3L),
      ("en", "src1", 3L, false, 3L),
      ("fr", "src0", 1L, true, 3L)))
  }

  test("kAnonymity: no at-risk classes yields n_suppressed 0; " +
    "degenerate k is refused") {
    val docs = Seq.fill(4)(("en", "s")).toDF("lang", "source")
    val got = Pii.kAnonymity(docs, Seq("lang", "source"), k = 3L).collect()
    assert(got.length === 1)
    assert(got(0).getLong(4) === 0L)
    intercept[IllegalArgumentException] {
      Pii.kAnonymity(docs, Seq("lang"), k = 1L)
    }
    intercept[IllegalArgumentException] {
      Pii.kAnonymity(docs, Seq.empty, k = 3L)
    }
  }

  // ---- x135 soft-dedup weights ----

  test("softDedupWeights: cluster members weight 1/size, singletons 1, " +
    "dense over the corpus") {
    val docs = (1L to 9L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    // components: {1,2,3} via transitive pairs, {7,8}; 4,5,6,9 untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("d1", "d2")
    val got = Dedup.softDedupWeights(docs, pairs, "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(
      (1L, 3L, 333333L), (2L, 3L, 333333L), (3L, 3L, 333333L),
      (4L, 1L, 1000000L), (5L, 1L, 1000000L), (6L, 1L, 1000000L),
      (7L, 2L, 500000L), (8L, 2L, 500000L), (9L, 1L, 1000000L)))
    // expected training mass per cluster is one document's worth
    assert(got.filter(_._2 === 3L).map(_._3).sum === 999999L)
  }

  // ---- x138 source concentration ----

  test("sourceConcentration: hand-worked HHI/Gini/top-share lanes") {
    // even corpus: 4 sources x 3 docs — HHI = 1/4, Gini = 0
    val even = (1 to 4).flatMap(s => Seq.fill(3)(s"src$s"))
      .toDF("source")
    val e = Report.sourceConcentration(even, "source").collect()(0)
    assert((e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3),
      e.getLong(4)) === ((4L, 12L, 250000L, 0L, 250000L)))
    // dominated corpus: counts (8, 1, 1) + a null row (excluded) —
    // HHI = 66/100, Gini num = 28 -> 28e6/(2*3*10), top = 8/10
    val dom = (Seq.fill(8)("big") ++ Seq("s2", "s3",
      null.asInstanceOf[String])).toDF("source")
    val d = Report.sourceConcentration(dom, "source").collect()(0)
    assert((d.getLong(0), d.getLong(1), d.getLong(2), d.getLong(3),
      d.getLong(4)) === ((3L, 10L, 660000L, 466666L, 800000L)))
  }

  // ---- x139 per-source dup participation ----

  test("dupGateJoint: cells and shares hand-worked; null text fails " +
    "the gate closed; dup membership from either pair side") {
    val good = (1 to 8).map(i => s"t$i").mkString(" ")
    val repetitive = Seq.fill(8)("w").mkString(" ")
    val docs = Seq(
      (1L, good),                         // clean, passes
      (2L, good + " t9"),                 // clean, passes, dup member
      (3L, repetitive),                   // fails (quality + dup lanes)
      (4L, null.asInstanceOf[String]),    // null text: fails CLOSED
      (5L, good + " t9 t10")              // passes, dup member (d2 side)
    ).toDF("doc_id", "text")
    val pairs = Seq((2L, 5L)).toDF("d1", "d2")
    val r = Dedup.dupGateJoint(docs, pairs, "doc_id", "text", 0.5, 0.2)
      .orderBy("is_dup", "passed").collect().map(_.toSeq).toSeq
    assert(r === Seq(
      Seq(false, false, 2L, 400000L), // repetitive + null text
      Seq(false, true, 1L, 200000L),  // doc 1
      Seq(true, true, 2L, 400000L)))  // docs 2 and 5
  }

  test("sourceDupRate: membership in ANY pair counts once; sources " +
    "with no pairs report zero; null sources drop") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"),
      (5L, "b"), (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "source")
    // doc 2 appears in TWO pairs — still one participant
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2")
    val got = Dedup.sourceDupRate(docs, pairs, "doc_id", "source")
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq(("a", 3L, 3L, 1000000L), ("b", 2L, 0L, 0L)))
  }

  // ---- x140 cross-source dup matrix ----

  test("crossSourceDupMatrix: pairs attribute to unordered source " +
    "pairs; null-source members drop the pair") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "source")
    // (1,2) diagonal a-a; (1,3) cross a-b; (3,1) must land in the SAME
    // unordered cell; (4,5) has a null member and drops
    val pairs = Seq((1L, 2L), (1L, 3L), (3L, 2L), (4L, 5L))
      .toDF("d1", "d2")
    val got = Dedup.crossSourceDupMatrix(docs, pairs, "doc_id", "source")
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(("a", "a", 1L), ("a", "b", 2L)))
  }

  // ---- x141 dup-cluster size histogram ----

  test("dupClusterHistogram: hand-worked size lanes; singletons fold " +
    "from corpus minus members") {
    val docs = (1L to 9L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    // {1,2,3} size 3, {7,8} size 2, four singletons (4,5,6,9)
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("d1", "d2")
    val got = Dedup.dupClusterHistogram(docs, pairs)
      .orderBy("cluster_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq((1L, 4L, 4L, 444444L), (2L, 1L, 2L, 222222L),
      (3L, 1L, 3L, 333333L)))
    // corpus mass is fully attributed
    assert(got.map(_._3).sum === 9L)
  }

  test("dupClusterHistogram: empty pair table is one all-singleton row") {
    val docs = (1L to 4L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val pairs = spark.emptyDataFrame
      .select(lit(0L).as("d1"), lit(0L).as("d2")).limit(0)
    val got = Dedup.dupClusterHistogram(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq((1L, 4L, 4L, 1000000L)))
  }

  // ---- x144 gate-rule attribution ----

  test("gateAttribution: rules counted independently, a doc can trip " +
    "several, n_failed is the any-rule count; null sources drop") {
    val good = (1 to 8).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      ("a", good),                              // passes
      ("a", Seq.fill(8)("w").mkString(" ")),    // low_quality AND repetitive
      ("a", "x"),                               // too_short (0 bigrams)
      ("b", good), ("b", good + " t9"),         // both pass
      (null.asInstanceOf[String], "dropped"))
      .toDF("source", "text")
    val got = Curate.gateAttribution(docs, "source", "text", 0.5, 0.2)
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === Seq(
      ("a", 3L, 1L, 1L, 1L, 2L, 666666L),
      ("b", 2L, 0L, 0L, 0L, 0L, 0L)))
  }

  // ---- x145 dedup-tier overlap ----

  test("dedupTierOverlap: exact membership via normalized fingerprint " +
    "groups, near via the pair union; null text never exact") {
    val docs = Seq(
      (1L, "dup text a"), (2L, "dup text a"),   // exact group
      (3L, "foo bar"), (4L, "baz qux"),         // near-only (pairs below)
      (5L, "unique here"),
      (6L, null.asInstanceOf[String]),          // null text: never exact
      (7L, "Dup, TEXT a!"))                     // normalizes into the group
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("d1", "d2")
    val got = Dedup.dedupTierOverlap(docs, pairs, "doc_id", "text")
      .collect()(0)
    assert((0 to 6).map(got.getLong) ===
      Seq(7L, 3L, 4L, 2L, 1L, 2L, 500000L))
  }

  test("dedupTierOverlap: empty pair table reports zero near and " +
    "zero ppm (no division by zero)") {
    val docs = Seq((1L, "same"), (2L, "same"), (3L, "other"))
      .toDF("doc_id", "text")
    val pairs = spark.emptyDataFrame
      .select(lit(0L).as("d1"), lit(0L).as("d2")).limit(0)
    val got = Dedup.dedupTierOverlap(docs, pairs, "doc_id", "text")
      .collect()(0)
    assert((0 to 6).map(got.getLong) ===
      Seq(3L, 2L, 0L, 0L, 2L, 0L, 0L))
  }

  // ---- x146 exact-cluster histogram ----

  test("exactClusterHistogram: fingerprint group sizes; null texts " +
    "and normalization-distinct docs are singletons") {
    val docs = Seq(
      (1L, "dup text a"), (2L, "dup text a"), (3L, "Dup, TEXT a!"),
      (4L, "same b"), (5L, "same b"),
      (6L, "unique"), (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Dedup.exactClusterHistogram(docs, "doc_id", "text")
      .orderBy("cluster_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // one 3-cluster (1,2,3 normalize together), one 2-cluster (4,5),
    // two singletons (6 and the null-text 7)
    assert(got === Seq((1L, 2L, 2L, 285714L), (2L, 1L, 2L, 285714L),
      (3L, 1L, 3L, 428571L)))
    assert(got.map(_._3).sum === 7L)
  }

  // ---- x143 pair-similarity histogram ----

  test("pairSimilarityHistogram: centi buckets with the cumulative " +
    "at-or-above lane (the threshold-sensitivity curve)") {
    // 0.57 is NOT double-representable (0.5699999...): floor(jac*100)
    // would misbucket it to 56 — the micro-grain round must not
    val pairs = Seq((1L, 2L, 0.80), (3L, 4L, 0.83), (5L, 6L, 0.837),
      (7L, 8L, 0.95), (9L, 10L, 1.0), (11L, 12L, 0.57))
      .toDF("d1", "d2", "jac")
    val got = Dedup.pairSimilarityHistogram(pairs)
      .orderBy("jac_centi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((57L, 1L, 6L), (80L, 1L, 5L), (83L, 2L, 4L),
      (95L, 1L, 2L), (100L, 1L, 1L)))
  }

  // ---- x142 dedup token savings ----

  test("dedupSavings: keep-one canonicals priced in tokens; null " +
    "texts count zero; a zero-token source reports 0 ppm") {
    val docs = Seq(
      (1L, "a", "w w w w"), (2L, "a", "w w"), (3L, "a", "x"),
      (4L, "b", "y y y"), (5L, "b", null),
      (6L, null, "z"),
      (7L, "c", null), (8L, "c", null))
      .toDF("doc_id", "source", "text")
    // {1,2}: canon 1, removed 2 (2 toks); {4,5}: canon 4, removed 5
    // (null text, 0 toks); {7,8}: canon 7, removed 8 — source c has
    // ZERO total tokens, the ppm lane must not divide by zero
    val pairs = Seq((1L, 2L), (4L, 5L), (7L, 8L)).toDF("d1", "d2")
    val got = Dedup.dedupSavings(docs, pairs, "doc_id", "source", "text")
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === Seq(
      ("a", 3L, 1L, 7L, 2L, 285714L),
      ("b", 2L, 1L, 3L, 0L, 0L),
      ("c", 2L, 1L, 0L, 0L, 0L)))
  }

  test("softDedupWeights: empty pair table weights everything 1") {
    val docs = (1L to 4L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val pairs = spark.emptyDataFrame
      .select(lit(0L).as("d1"), lit(0L).as("d2")).limit(0)
    val got = Dedup.softDedupWeights(docs, pairs, "doc_id")
      .orderBy("doc_id").collect()
    assert(got.length === 4)
    assert(got.forall(r => r.getLong(1) === 1L && r.getLong(2) === 1000000L))
  }
}
