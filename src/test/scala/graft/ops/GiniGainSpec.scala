package graft.ops

import graft.SparkSpec

/** X155 Gini information gain: hand-worked per-value terms over a
  * two-field fixture (null field value and null text included), the
  * perfectly-predictive bound (gain = base), and the guard rails.
  */
class GiniGainSpec extends SparkSpec {

  import spark.implicits._

  private val QMin = 0.5
  private val DMax = 0.2

  test("giniGain: hand-computed base, per-value floored terms, and " +
    "gains over a (lang, src) fixture with null groups") {
    val docs = Seq(
      ("en", "s1", "a b c d"), // pass
      ("en", "s1", "e f g h"), // pass
      ("en", "s2", "a a a a"), // fail (quality 0.25)
      ("fr", "s2", "b b b b"), // fail
      ("fr", "s2", "c d e f"), // pass
      (null, "s3", null)       // fail closed; null lang is a group
    ).toDF("lang", "src", "text")
    val got = Curate.giniGain(docs, "text", Seq("lang", "src"),
        QMin, DMax)
      .orderBy("field").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    // n=6 p=3: base = 2*3*3*1e6 // 36 = 500000
    // lang: en(3,2)->4e6//18=222222, fr(2,1)->2e6//12=166666, null(1,0)->0
    // src : s1(2,2)->0, s2(3,1)->4e6//18=222222, s3(1,0)->0
    assert(got === Seq(
      ("lang", 3L, 6L, 3L, 500000L, 388888L, 111112L),
      ("src", 3L, 6L, 3L, 500000L, 222222L, 277778L)))
  }

  test("giniGain: a perfectly predictive field removes all impurity " +
    "(gain = base); a constant field removes none (gain 0 or -1)") {
    val docs = Seq(
      ("g1", "k", "a b c d"), // pass
      ("g2", "k", "a a a a")  // fail
    ).toDF("g", "k", "text")
    val got = Curate.giniGain(docs, "text", Seq("g", "k"), QMin, DMax)
      .orderBy("field").collect()
      .map(r => (r.getString(0), r.getLong(4), r.getLong(5),
        r.getLong(6))).toSeq
    // base = 2*1*1*1e6 // 4 = 500000; g splits purely -> cond 0;
    // k is constant -> its one value IS the corpus: cond = base
    assert(got === Seq(("g", 500000L, 0L, 500000L),
      ("k", 500000L, 500000L, 0L)))
  }

  test("giniGain: refuses an empty field list and textCol among the " +
    "fields") {
    val docs = Seq(("a", "x y")).toDF("g", "text")
    intercept[IllegalArgumentException] {
      Curate.giniGain(docs, "text", Seq.empty, QMin, DMax)
    }
    intercept[IllegalArgumentException] {
      Curate.giniGain(docs, "text", Seq("g", "text"), QMin, DMax)
    }
  }
}
