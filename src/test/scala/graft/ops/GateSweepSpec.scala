package graft.ops

import graft.SparkSpec

/** X158 gate-threshold sweep: hand-priced grid arms over a fixture
  * whose documents sit on both sides of every knob, plus the
  * empty-corpus all-zero-rows contract.
  */
class GateSweepSpec extends SparkSpec {

  import spark.implicits._

  test("gateSweep: each arm applies the exact gate predicate; doc and " +
    "token lanes ppm-priced against hand counts") {
    val docs = Seq(
      "a b c d", // q=1.0  dup=0        4 tokens
      "a a b b", // q=0.5  dup=0        4 tokens
      "a a a a", // q=0.25 dup=0.666667 4 tokens
      "solo",    // 0 bigrams: never passes, 1 token
      null       // fails closed, 0 tokens
    ).toDF("text")
    val got = Curate.gateSweep(docs, "text", Seq(0.2, 0.6), Seq(0.1, 0.7))
      .orderBy("quality_min", "dup_max").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSeq
    assert(got === Seq(
      (0.2, 0.1, 5L, 2L, 400000L, 13L, 8L, 615384L),
      (0.2, 0.7, 5L, 3L, 600000L, 13L, 12L, 923076L),
      (0.6, 0.1, 5L, 1L, 200000L, 13L, 4L, 307692L),
      (0.6, 0.7, 5L, 1L, 200000L, 13L, 4L, 307692L)))
  }

  test("gateSweep: an empty corpus still yields one all-zero row per " +
    "arm (fixed curve shape for dashboards)") {
    val docs = Seq.empty[String].toDF("text")
    val got = Curate.gateSweep(docs, "text", Seq(0.5), Seq(0.05, 0.1))
      .orderBy("dup_max").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSeq
    assert(got === Seq(
      (0.5, 0.05, 0L, 0L, 0L, 0L, 0L, 0L),
      (0.5, 0.1, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("gateSweep refuses an empty axis") {
    val docs = Seq("a b").toDF("text")
    intercept[IllegalArgumentException] {
      Curate.gateSweep(docs, "text", Seq.empty, Seq(0.1))
    }
  }
}
