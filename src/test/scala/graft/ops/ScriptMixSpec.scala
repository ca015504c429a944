package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

/** X73 script mix pinned on hand-built strings: exact codepoint counts
  * per class, ppm arithmetic, the alphabetical tie-break, and 'none'.
  */
class ScriptMixSpec extends SparkSpec {
  import spark.implicits._

  private def run(pages: (Long, String)*): Map[Long, Row] =
    ScriptMix.analyze(pages.toDF("doc_id", "page"), "doc_id", "page")
      .collect().map(r => r.getLong(0) -> r).toMap

  private def v(r: Row, name: String): Long = r.getLong(r.fieldIndex(name))
  private def dom(r: Row): String =
    r.getString(r.fieldIndex("dominant"))

  test("hand-counted mixed page: every class and ppm exact") {
    // 5 latin + 6 cyrillic + 3 greek + 2 han + 3 separators = 19 chars
    val page = "abcde привет αβγ 中文"
    val r = run(1L -> page)(1L)
    assert(v(r, "n_chars") === 19L)
    assert(v(r, "latin_chars") === 5L)
    assert(v(r, "cyrillic_chars") === 6L)
    assert(v(r, "greek_chars") === 3L)
    assert(v(r, "han_chars") === 2L)
    assert(v(r, "cyrillic_ppm") === 6L * 1000000L / 19L)
    assert(v(r, "han_ppm") === 2L * 1000000L / 19L)
    assert(dom(r) === "cyrillic")
  }

  test("dominant: strict majority wins; ties go to the alphabetically " +
    "first script; all-zero is 'none'") {
    val out = run(
      1L -> "abc абв",   // 3 vs 3 — tie: cyrillic < latin alphabetically
      2L -> "abcd абв",  // latin 4 > 3
      3L -> "αβ 中文",    // greek 2 = han 2 — greek first
      4L -> "12345 !?")  // no script chars at all
    assert(dom(out(1L)) === "cyrillic")
    assert(dom(out(2L)) === "latin")
    assert(dom(out(3L)) === "greek")
    assert(dom(out(4L)) === "none")
    assert(v(out(4L), "latin_ppm") === 0L)
  }

  test("range endpoints are inclusive (Ѐ, ӿ, Ͱ, Ͽ, 一, 鿿 all count)") {
    val r = run(1L -> "Ѐӿ Ͱ Ͽ 一鿿")(1L)
    assert(v(r, "cyrillic_chars") === 2L)
    assert(v(r, "greek_chars") === 2L)
    assert(v(r, "han_chars") === 2L)
    assert(v(r, "latin_chars") === 0L)
  }
}
