package graft.ops

import graft.SparkSpec

/** X41 substring-run invariants beyond the DuckDB oracle: planted shared
  * paragraphs with hand-computed offsets, doc-end boundary runs,
  * whole-document duplicates agreeing with X1 exact dedup, repeated
  * paragraphs yielding one run per alignment, and the boilerplate
  * window-frequency cap.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // ten-token shared paragraph; every other token below is unique to its
  // document, so no window crossing a paragraph boundary can match
  private val P = (0 until 10).map(i => s"p$i").mkString(" ")

  private def runs(docs: Seq[(Long, String)], k: Int, minSpan: Int,
                   cap: Option[Int] = None): Seq[(Long, Long, Int, Int, Long)] =
    Dedup.substringRuns(docs.toDF("doc_id", "text"), "doc_id", "text",
        k, minSpan, cap)
      .orderBy("d1", "d2", "a_start", "b_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4))).toSeq

  test("a mid-document shared paragraph yields one maximal run with exact offsets") {
    // P sits at token 3 of doc 1 and token 2 of doc 2; the maximal run
    // is exactly the 10-token paragraph, not its individual windows
    val got = runs(Seq(
      1L -> s"u0 u1 u2 $P v0 v1",
      2L -> s"w0 w1 $P x0"), k = 3, minSpan = 5)
    assert(got === Seq((1L, 2L, 3, 2, 10L)))
  }

  test("a run ending at the document boundary is still closed and maximal") {
    val got = runs(Seq(
      1L -> s"c0 c1 $P", // P is the suffix: last window ends at doc end
      2L -> s"d0 $P"), k = 4, minSpan = 5)
    assert(got === Seq((1L, 2L, 2, 1, 10L)))
  }

  test("a whole-document duplicate is one full-length run and agrees with X1 exact") {
    val text = (0 until 12).map(i => s"q$i").mkString(" ")
    val docs = Seq(5L -> text, 6L -> text)
    assert(runs(docs, k = 3, minSpan = 5) === Seq((5L, 6L, 0, 0, 12L)))
    val exact = Dedup.exactDedup(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("keep_id", "dups").as[(Long, Long)].collect().toSeq
    assert(exact === Seq((5L, 2L))) // same verdict: 6 duplicates 5
  }

  test("a paragraph repeated in one document yields one run per alignment") {
    // doc 1 carries P twice (tokens 1 and 12); doc 2 once (token 1):
    // two diagonals, two maximal 10-token runs
    val got = runs(Seq(
      1L -> s"s0 $P s1 $P",
      2L -> s"t0 $P t1"), k = 3, minSpan = 5)
    assert(got === Seq((1L, 2L, 1, 1, 10L), (1L, 2L, 12, 1, 10L)))
  }

  test("shared spans below minSpan are dropped; minSpan below k is rejected") {
    val short = Seq(
      1L -> "a0 a1 p0 p1 p2 p3 a2",
      2L -> "b0 p0 p1 p2 p3 b1") // 4-token shared span
    assert(runs(short, k = 3, minSpan = 5) === Seq.empty)
    assert(runs(short, k = 3, minSpan = 4) === Seq((1L, 2L, 2, 1, 4L)))
    intercept[IllegalArgumentException] {
      runs(short, k = 3, minSpan = 2)
    }
  }

  private def removed(docs: Seq[(Long, String)], k: Int,
                      minSpan: Int): Seq[(Long, String, Long)] =
    Dedup.removeRuns(docs.toDF("doc_id", "text"), "doc_id", "text", k, minSpan)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("removeRuns: the later doc drops the shared span, the canonical survives") {
    val got = removed(Seq(
      1L -> s"u0 u1 u2 $P v0 v1",
      2L -> s"w0 w1 $P x0"), k = 3, minSpan = 5)
    assert(got === Seq(
      (1L, s"u0 u1 u2 $P v0 v1", 0L), // canonical: untouched, verbatim
      (2L, "w0 w1 x0", 10L)))
  }

  test("removeRuns: overlapping spans from different partners union per doc") {
    // doc 3 shares p0..p9 with doc 1 and p5..p9 q0..q4 with doc 2: the
    // removed intervals [1,10] and [6,15] overlap -> 15 tokens removed
    val Q = (0 until 5).map(i => s"q$i").mkString(" ")
    val got = removed(Seq(
      1L -> s"a0 $P a1",
      2L -> s"b0 ${P.split(" ").drop(5).mkString(" ")} $Q b1",
      3L -> s"c0 $P $Q c1"), k = 3, minSpan = 5)
    assert(got(2) === ((3L, "c0 c1", 15L)))
  }

  test("removeRuns: a whole-document duplicate empties the later copy") {
    val text = (0 until 12).map(i => s"q$i").mkString(" ")
    val got = removed(Seq(5L -> text, 6L -> text), k = 3, minSpan = 5)
    assert(got === Seq((5L, text, 0L), (6L, "", 12L)))
  }

  test("maxWindowFreq drops boilerplate-anchored runs, keeps rare ones") {
    // P is boilerplate (in all 5 docs); the 10-token R span is shared by
    // only two docs and must survive the cap
    val R = (0 until 10).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      1L -> s"a0 $P a1 $R",
      2L -> s"b0 $P $R b1",
      3L -> s"c0 $P c1",
      4L -> s"d0 $P d1",
      5L -> s"e0 $P e1")
    val capped = runs(docs, k = 3, minSpan = 5, cap = Some(4))
    assert(capped === Seq((1L, 2L, 12, 11, 10L)))
    // uncapped: the P runs reappear (10 pairs) alongside the R run
    assert(runs(docs, k = 3, minSpan = 5).size === 11)
  }
}
