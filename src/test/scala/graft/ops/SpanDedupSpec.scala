package graft.ops

import graft.SparkSpec

/** X69 span-dedup invariants on hand rows: within-doc and cross-doc
  * first-occurrence keeps, overlapping removal union, and short-doc
  * passthrough.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def dedup(rows: (Long, String)*): Map[Long, (Long, Long, String)] =
    C4.spanDedup(rows.toDF("doc_id", "page"), "doc_id", "page", span = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("a repeated within-doc span is excised; the first occurrence stays") {
    // spans: abc(1) bca(2) cab(3) abc(4) -> span 4 duplicates span 1
    val out = dedup(1L -> "a1\nb1\nc1\na1\nb1\nc1")(1L)
    assert(out === ((6L, 3L, "a1\nb1\nc1")))
  }

  test("cross-doc: the smaller (doc, start) keeps, the later doc is cut") {
    val out = dedup(
      1L -> "a2\nb2\nc2\nx2",
      2L -> "a2\nb2\nc2\ny2")
    assert(out(1L) === ((4L, 0L, "a2\nb2\nc2\nx2")))
    assert(out(2L) === ((4L, 3L, "y2")))
  }

  test("overlapping removed spans union: each line removed once") {
    // lines a b c a b c a: duplicate spans start at 4 (abc) and 5
    // (bca) -> covered 4..6 U 5..7 = 4 lines
    val out = dedup(1L -> "a3\nb3\nc3\na3\nb3\nc3\na3")(1L)
    assert(out === ((7L, 4L, "a3\nb3\nc3")))
  }

  test("docs shorter than the span pass through untouched") {
    val out = dedup(1L -> "a4\nb4", 2L -> "solo4")
    assert(out(1L) === ((2L, 0L, "a4\nb4")))
    assert(out(2L) === ((1L, 0L, "solo4")))
  }

  test("a doc whose every line is covered empties to ''") {
    val out = dedup(
      1L -> "a5\nb5\nc5",
      2L -> "a5\nb5\nc5")
    assert(out(1L) === ((3L, 0L, "a5\nb5\nc5")))
    assert(out(2L) === ((3L, 3L, "")))
  }
}
