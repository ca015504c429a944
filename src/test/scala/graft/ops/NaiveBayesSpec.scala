package graft.ops

import graft.SparkSpec

/** X42 NB classifier invariants beyond the DuckDB oracle: a two-class
  * toy corpus whose scores are hand-computed below, tie-breaking, unseen
  * tokens, and the class-cardinality guard.
  */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def classify(train: Seq[(Long, String, String)],
                       docs: Seq[(Long, String)]): Seq[(Long, String, Long)] =
    NaiveBayes.classify(
      docs.toDF("doc_id", "text"),
      train.toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("two-class toy corpus: scores match the hand computation exactly") {
    // train: class a = {"x x y"}, class b = {"z z y"};
    // vocab {x, y, z} V=3, tokens(a)=3, tokens(b)=3, priors 1/2 each.
    //   p(x|a)=(2+1)/6=.5   p(y|a)=(1+1)/6=1/3  p(z|a)=(0+1)/6=1/6
    //   p(x|b)=(0+1)/6=1/6  p(y|b)=(1+1)/6=1/3  p(z|b)=(2+1)/6=.5
    // doc 10 = "x y": score(a) = ln(.5)+ln(.5)+ln(1/3)   (prior first)
    //                 score(b) = ln(.5)+ln(1/6)+ln(1/3)  -> a wins
    val train = Seq((1L, "x x y", "a"), (2L, "z z y", "b"))
    val got = classify(train, Seq(10L -> "x y"))
    def micro(p: Double): Long = math.round(math.log(p) * 1e6)
    val sa = micro(0.5) + micro(0.5) + micro(1.0 / 3)
    val sb = micro(0.5) + micro(1.0 / 6) + micro(1.0 / 3)
    assert(sa > sb)
    assert(got === Seq((10L, "a", sa)))
  }

  test("unseen tokens get the Laplace floor; all-unseen doc ties to the lex-smaller class") {
    // "q q" is unseen in both classes: per-token ln(1/6) either way and
    // equal priors -> exact tie -> lex-smaller label "a" wins
    val train = Seq((1L, "x x y", "a"), (2L, "z z y", "b"))
    val got = classify(train, Seq(10L -> "q q"))
    assert(got.head._2 === "a")
  }

  test("skewed priors break an otherwise-even token score") {
    // both classes have identical token distributions, but b has twice
    // the documents: prior ln(2/3) vs ln(1/3) decides every doc
    val train = Seq((1L, "x y", "a"), (2L, "x y", "b"), (3L, "x y", "b"))
    val got = classify(train, Seq(10L -> "x y"))
    assert(got.head._2 === "b")
  }

  test("null-labeled ref rows are excluded from every model statistic") {
    // a null-labeled row would otherwise inflate nDocs (skewing priors)
    // and leak its tokens into the vocabulary — model must equal the one
    // trained on the labeled subset alone
    val labeled = Seq((1L, "x x y", "a"), (2L, "z z y", "b"))
    val withNull = labeled.map { case (i, t, l) => (i, t, Option(l)) } :+
      ((3L, "q q q q", Option.empty[String]))
    val got = NaiveBayes.classify(
      Seq(10L -> "x y").toDF("doc_id", "text"),
      withNull.toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === classify(labeled, Seq(10L -> "x y")))
  }

  test("class-cardinality guard fails loudly past MaxClasses") {
    val train = (0 to NaiveBayes.MaxClasses)
      .map(i => (i.toLong, "x", s"c$i"))
    val e = intercept[IllegalArgumentException] {
      classify(train, Seq(10L -> "x"))
    }
    assert(e.getMessage.contains("cap"))
  }

  test("margin_micro is the exact winner-minus-runner-up gap; a tied " +
    "doc margins 0; one class yields null; base columns unchanged") {
    val train = Seq((1L, "x x y", "a"), (2L, "z z y", "b"))
    val withM = NaiveBayes.classify(
      Seq(10L -> "x y", 11L -> "q q").toDF("doc_id", "text"),
      train.toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang", withMargin = true)
      .orderBy("doc_id").collect()
    def micro(p: Double): Long = math.round(math.log(p) * 1e6)
    val sa = micro(0.5) + micro(0.5) + micro(1.0 / 3)
    val sb = micro(0.5) + micro(1.0 / 6) + micro(1.0 / 3)
    assert(withM.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toSeq === Seq(
      (10L, "a", sa, sa - sb), // margin = exact score gap
      (11L, "a", micro(0.5) + 2 * micro(1.0 / 6), 0L))) // all-unseen tie
    // the base projection is byte-identical with the margin dropped
    assert(withM.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq === classify(train, Seq(10L -> "x y", 11L -> "q q")))
    // a one-class model has no runner-up: margin is null, not 0
    val one = NaiveBayes.classify(
      Seq(10L -> "x").toDF("doc_id", "text"),
      Seq((1L, "x", "a")).toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang", withMargin = true).collect().head
    assert(one.isNullAt(3))
  }
}
