package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

/** X67 repetition signals pinned on hand-computed pages: duplicate-line
  * fractions, top-n-gram tie-breaking, overlapping duplicate-n-gram
  * coverage counted once, and the verdict conjunction.
  */
class GopherRepSpec extends SparkSpec {
  import spark.implicits._

  private def signals(pages: (Long, String)*): Map[Long, Row] =
    Gopher.repetitionSignals(pages.toDF("doc_id", "page"),
        "doc_id", "page")
      .collect().map(r => r.getLong(0) -> r).toMap

  private def v(r: Row, name: String): Long = r.getLong(r.fieldIndex(name))

  test("hand-computed page: line fractions, top-gram chars with " +
    "lexicographic tie-break") {
    // lines: "a b c" x2 + "d e f"; words a b c a b c d e f (twc 9)
    val r = signals(1L -> "a b c\na b c\nd e f")(1L)
    assert(v(r, "n_lines") === 3L)
    assert(v(r, "dup_line_ppm") === 333333L)      // 1 of 3 lines
    assert(v(r, "dup_line_char_ppm") === 333333L) // 5 of 15 chars
    // "a b" and "b c" both occur twice; tie goes to "a b" (2 chars x2)
    assert(v(r, "top2_char_ppm") === 444444L)     // 4 of 9
    assert(v(r, "top3_char_ppm") === 666666L)     // "a b c" x2: 6 of 9
    // all 4-grams unique; smallest is "a b c a" (4 word chars, 1 occ)
    assert(v(r, "top4_char_ppm") === 444444L)
    assert(v(r, "dup5_char_ppm") === 0L)
    assert(r.getBoolean(r.fieldIndex("kept_doc")) === false) // line rule
  }

  test("duplicate n-gram coverage is a position union, counted once") {
    val out = signals(
      // "x y z w v" recurs at positions 1 and 6 -> covers 1..10 of 11
      1L -> "x y z w v x y z w v u",
      // overlapping occurrences of "a a a a a" cover all 7 positions
      2L -> "a a a a a a a",
      // a 20-word page that is its own 10-word repeat: every dup-gram
      // signal saturates
      3L -> "q w e r t y u i o p q w e r t y u i o p")
    assert(v(out(1L), "dup5_char_ppm") === 909090L) // 10 of 11
    assert(v(out(1L), "dup6_char_ppm") === 0L)
    assert(v(out(2L), "dup5_char_ppm") === 1000000L)
    // top-gram counting is occurrence-based (the paper's form): 6
    // overlapping "a a" occurrences x 2 word chars = 12 of 7 — the
    // ratio exceeds 1 on pathological overlap, unlike the dup-gram
    // coverage union, which counts positions once
    assert(v(out(2L), "top2_char_ppm") === 1714285L)
    assert(v(out(3L), "dup5_char_ppm") === 1000000L)
    assert(v(out(3L), "dup10_char_ppm") === 1000000L)
    assert(out.values.forall(r => !r.getBoolean(r.fieldIndex("kept_doc"))))
  }

  test("a long unrepetitive page keeps; signals are zero or tiny") {
    val page = (1 to 100).map(i => f"w$i%03d").mkString(" ")
    val r = signals(1L -> page)(1L)
    assert(v(r, "dup_line_ppm") === 0L)
    assert(v(r, "dup5_char_ppm") === 0L)
    assert(v(r, "top2_char_ppm") === 20000L) // one 8-char 2-gram of 400
    assert(r.getBoolean(r.fieldIndex("kept_doc")))
  }

  test("the adversarial page — 5000 copies of one word — computes in " +
    "one pass (the declarative forms were quadratic-or-worse here)") {
    // every n-gram is the same gram, so every position is covered for
    // every n: all dup-gram signals saturate at exactly 10^6
    val r = signals(1L -> Seq.fill(5000)("spam").mkString(" "))(1L)
    (5 to 10).foreach(n => assert(v(r, s"dup${n}_char_ppm") === 1000000L))
    assert(!r.getBoolean(r.fieldIndex("kept_doc")))
  }

  test("docs shorter than the gram size report 0 for that signal") {
    val r = signals(1L -> "only three words")(1L)
    assert(v(r, "dup5_char_ppm") === 0L)
    assert(v(r, "dup10_char_ppm") === 0L)
    assert(v(r, "top4_char_ppm") === 0L) // no 4-gram exists
  }
}
