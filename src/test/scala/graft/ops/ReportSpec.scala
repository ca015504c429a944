package graft.ops

import graft.SparkSpec

/** X76 data card: cube grain (slices + marginals + grand total in one
  * pass), exact token/char/dup accounting, and the '(all)' marginal
  * labeling.
  */
class ReportSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "s0", "en", "one two three", 13L),
    (2L, "s0", "en", "one two three", 13L), // exact dup of 1
    (3L, "s0", "de", "eins  zwei", 10L), // double space: 2 tokens
    (4L, "s1", "en", "four", 4L)
  ).toDF("doc_id", "source", "lang", "text", "n_chars")

  private lazy val card = Report
    .dataCard(docs, "source", "lang", "text", "n_chars")
    .collect()
    .map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    .toMap

  test("cube emits slices, both marginals, and the grand total") {
    assert(card.keySet === Set(
      ("s0", "en"), ("s0", "de"), ("s1", "en"),
      ("s0", "(all)"), ("s1", "(all)"),
      ("(all)", "en"), ("(all)", "de"),
      ("(all)", "(all)")))
  }

  test("slice metrics are exact") {
    // (n_docs, n_tokens, n_chars, n_distinct_texts, n_dup_docs)
    assert(card(("s0", "en")) === ((2L, 6L, 26L, 1L, 1L)))
    assert(card(("s0", "de")) === ((1L, 2L, 10L, 1L, 0L)))
    assert(card(("s1", "en")) === ((1L, 1L, 4L, 1L, 0L)))
  }

  test("marginals and grand total aggregate exactly") {
    assert(card(("s0", "(all)")) === ((3L, 8L, 36L, 2L, 1L)))
    assert(card(("(all)", "en")) === ((3L, 7L, 30L, 2L, 1L)))
    assert(card(("(all)", "(all)")) === ((4L, 9L, 40L, 3L, 1L)))
  }

  test("dirty dimensions fail loudly instead of merging into marginals") {
    // a real '(all)' value would be indistinguishable from a marginal
    val collide = Seq((1L, "(all)", "en", "x", 1L))
      .toDF("doc_id", "source", "lang", "text", "n_chars")
    val e1 = intercept[Exception] {
      Report.dataCard(collide, "source", "lang", "text", "n_chars").collect()
    }
    assert(e1.getMessage.contains("NULL or '(all)'"))
    // a NULL dimension would land in the marginal slot via the cube NULL
    val nulled = Seq((1L, null.asInstanceOf[String], "en", "x", 1L))
      .toDF("doc_id", "source", "lang", "text", "n_chars")
    val e2 = intercept[Exception] {
      Report.dataCard(nulled, "source", "lang", "text", "n_chars").collect()
    }
    assert(e2.getMessage.contains("NULL or '(all)'"))
  }
}
