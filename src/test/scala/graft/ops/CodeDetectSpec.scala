package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

/** X72 code detection pinned on hand-built pages: each signal's exact
  * ppm value, the >=2-of-4 vote, and threshold boundaries.
  */
class CodeDetectSpec extends SparkSpec {
  import spark.implicits._

  private def detect(pages: (Long, String)*): Map[Long, Row] =
    CodeDetect.detect(pages.toDF("doc_id", "page"), "doc_id", "page")
      .collect().map(r => r.getLong(0) -> r).toMap

  private def v(r: Row, name: String): Long = r.getLong(r.fieldIndex(name))

  test("a hand-computed code page: every signal exact") {
    // 4 lines; 2 indented; all 4 end in ;/{/}; keywords: int, if,
    // return x2
    val page = "int f() {\n  if (x) return 1;\n  return 0;\n}"
    val r = detect(1L -> page)(1L)
    assert(v(r, "n_lines") === 4L)
    // words: [int, f(), {, if, (x), return, 1;, return, 0;, }] = 10
    assert(v(r, "n_words") === 10L)
    // syntax chars: ( ) { ( ) ; ; } = 8 of the page's chars
    assert(v(r, "sym_ppm") === 8L * 1000000L / page.length)
    // keyword words: int, if, return, return = 4 of 10
    assert(v(r, "kw_ppm") === 400000L)
    assert(v(r, "indent_ppm") === 500000L)
    assert(v(r, "punctline_ppm") === 1000000L)
    assert(r.getBoolean(r.fieldIndex("is_code")))
  }

  test("prose fires nothing; a single weak signal is not enough") {
    val prose = "the quick brown fox jumps over the lazy dog.\n" +
      "it was the best of times, it was the worst of times."
    val r = detect(1L -> prose)(1L)
    assert(v(r, "sym_ppm") === 0L)
    assert(v(r, "kw_ppm") === 0L)
    assert(!r.getBoolean(r.fieldIndex("is_code")))
    // one vote only (indent) stays prose: 1 of 2 lines indented fires
    // indent_ppm but nothing else
    val halfIndent = "plain words on the first line here\n" +
      "  and an indented second line of prose"
    val r2 = detect(2L -> halfIndent)(2L)
    assert(v(r2, "indent_ppm") === 500000L)
    assert(!r2.getBoolean(r2.fieldIndex("is_code")))
  }

  test("vote boundary: exactly two signals at exactly their thresholds") {
    // kw_ppm exactly 80000 = 2 keywords of 25 PAGE words (16 + 3 + 3x2);
    // indent exactly 200000 = 1 of 5 lines; sym and punct zero
    val words23 = (1 to 14).map(i => s"w$i").mkString(" ")
    val page = Seq(
      s"if for $words23", // 16 words, 2 keywords
      "  indented prose line",
      "plain line", "plain line", "plain line").mkString("\n")
    val r = detect(1L -> page)(1L)
    assert(v(r, "kw_ppm") === 80000L)
    assert(v(r, "indent_ppm") === 200000L)
    assert(r.getBoolean(r.fieldIndex("is_code")))
    // one word more and kw_ppm drops below threshold: 1 vote, prose
    val page2 = Seq(
      s"if for $words23 extra",
      "  indented prose line",
      "plain line", "plain line", "plain line").mkString("\n")
    val r2 = detect(2L -> page2)(2L)
    assert(v(r2, "kw_ppm") < 80000L)
    assert(!r2.getBoolean(r2.fieldIndex("is_code")))
  }

  test("keyword match is case-insensitive and word-exact") {
    // "Return" matches; "returns" does not
    val r = detect(1L -> "Return returns RETURN returning")(1L)
    assert(v(r, "kw_ppm") === 500000L) // 2 of 4
  }
}
