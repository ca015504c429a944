package graft.ops

import graft.SparkSpec

/** X24 TF-IDF / X25 BM25: hand-derived values with the same 6-dp ln seam,
  * tie ordering, k > vocabulary, and all-terms-absent edge cases.
  */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("tf-idf matches hand-derived values; k > vocab returns all terms") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = Retrieval.tfIdfTopTerms(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id", "rnk")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
    val ln2 = round6(math.log(2.0)) // idf of df=1 terms; df=2 → ln(1)=0
    assert(got.toSeq === Seq(
      (1L, "b", 1L, 1L, ln2, 1), // k=5 > 2 distinct terms: both returned
      (1L, "a", 2L, 2L, 0.0, 2),
      (2L, "c", 1L, 1L, ln2, 1),
      (2L, "a", 1L, 2L, 0.0, 2)))
  }

  test("bm25 matches a driver-side mirror of the same expression tree") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val got = Retrieval.bm25(docs, "doc_id", "text", Seq("a"), topK = 10)
      .orderBy("rank")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    // n=3, df(a)=2, total_tokens=5; mirror the operator tree order exactly
    val idf = round6(math.log((3.0 - 2 + 0.5) / (2 + 0.5) + 1.0))
    val avgdl = 5.0 / 3.0
    val lenNorm = (1.0 - 0.75) + (0.75 * 2.0) / avgdl
    val expected = round6((idf * (1.0 * (1.2 + 1.0))) / (1.0 + 1.2 * lenNorm))
    assert(got.toSeq === Seq(
      (1L, expected, 1), // identical docs score identically;
      (2L, expected, 2))) // the tie resolves to the lower doc_id
    // doc 3 (score 0) is filtered, not ranked
  }

  test("a query whose terms are absent from the corpus returns no rows") {
    val docs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val got = Retrieval.bm25(docs, "doc_id", "text", Seq("zzz"), topK = 10)
    assert(got.count() === 0L)
  }

  test("phraseSearch finds all matches including overlapping ones") {
    val docs = Seq(
      (1L, "a a a a"),   // 'a a' matches at positions 1, 2, 3 (overlapping)
      (2L, "b a a b"),   // one match at position 2
      (3L, "a b a b")    // no 'a a'
    ).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text", Seq("a", "a"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 3L, 1L), (2L, 1L, 2L)))
  }

  test("phraseSearch: a phrase straddling the document end never matches") {
    val docs = Seq((1L, "x y"), (2L, "x y z")).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text", Seq("x", "y", "z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((2L, 1L, 1L))) // doc 1's 'x y' has no 'z' after
  }

  test("phraseSearch: single-term phrase degenerates to term lookup") {
    val docs = Seq((1L, "q w q"), (2L, "w w")).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text", Seq("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 1L)))
  }

  test("tf-idf ties within a document break by token, deterministically") {
    val docs = Seq((1L, "b c"), (2L, "b c")).toDF("doc_id", "text")
    // b and c both have df=2 → idf=0 → tfidf ties at 0.0 for both terms
    val got = Retrieval.tfIdfTopTerms(docs, "doc_id", "text", k = 1)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(5)))
    assert(got.toSeq === Seq((1L, "b", 1), (2L, "b", 1)))
  }
}
