package graft.ops

import graft.SparkSpec

/** X159 readability lanes: hand-counted vowel groups, the >= 1 clamp
  * for vowelless words, the complex-word rule, null handling, and the
  * zero-word language guard.
  */
class ReadabilitySpec extends SparkSpec {

  import spark.implicits._

  test("readability: hand-counted syllable and complex-word lanes " +
    "per language; null text is a zero-word doc; null lang excluded") {
    val docs = Seq(
      // hello = 2 groups (e, o); beautiful = 3 (eau, i, u) -> complex;
      // x = 0 groups -> clamped to 1 syllable
      ("en", "hello beautiful x"),
      ("en", null),
      // bcd = vowelless -> 1; xyz -> y counts as a vowel -> 1
      ("fr", "bcd xyz"),
      ("de", null), // a whole language of null text: zero-guard row
      (null.asInstanceOf[String], "ignored entirely")
    ).toDF("lang", "text")
    val got = TextAnalysis.readability(docs, "lang", "text")
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === Seq(
      ("de", 1L, 0L, 0L, 0L, 0L, 0L),
      ("en", 2L, 3L, 6L, 2000000L, 1L, 333333L),
      ("fr", 1L, 2L, 2L, 1000000L, 0L, 0L)))
  }
}
