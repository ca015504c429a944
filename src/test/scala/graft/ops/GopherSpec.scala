package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

/** X65 Gopher rules pinned on hand-built pages — each published rule
  * tripped in isolation, including the two (mean word length, alpha
  * ratio) the synthesized corpus never trips, plus boundary equality
  * for the cross-multiplied thresholds.
  */
class GopherSpec extends SparkSpec {
  import spark.implicits._

  // a 50-word page that passes every rule (words avg 4 chars, one
  // stopword pair, no symbols/bullets/ellipses)
  private val okWords = (1 to 48).map(i => s"w${i % 7}ord").mkString(" ")
  private val okPage = s"the with $okWords"

  private def rules(pages: (Long, String)*): Map[Long, Row] =
    Gopher.qualityRules(pages.toDF("doc_id", "page"), "doc_id", "page")
      .collect().map(r => r.getLong(0) -> r).toMap

  private def gate(r: Row, name: String): Boolean =
    r.getBoolean(r.fieldIndex(name))

  test("the all-pass page keeps; each rule then trips in isolation") {
    val out = rules(
      1L -> okPage,
      // 2: word count below 50 (one word short)
      2L -> okPage.split(" ").drop(1).mkString(" "),
      // 3: mean word length below 3 (50 one-char words + stopword hit
      //    still >= 2 distinct? no — keep 'the'+'of', rest 'a b c')
      3L -> ("the of " + Seq.fill(48)("a").mkString(" ")),
      // 4: symbol ratio: 6 hashes over 56 words > 1/10
      4L -> (okPage + " # # # # # #"),
      // 5: bullets: 1 bullet line of 2 lines > 10%
      5L -> (okPage + "\n- bullet line here"),
      // 6: ellipses: 1 of 2 lines ends '...' > 30%
      6L -> (okPage + "\nthis line trails off..."),
      // 7: alpha: 13 numeric words over 63 total < 80% alpha
      7L -> (okPage + " " + (100 to 112).map(_.toString).mkString(" ")),
      // 8: stopwords: only 'the' present (1 < 2)
      8L -> okPage.replace("the with ", "the zzz "))
    assert(gate(out(1L), "kept_doc"))
    assert(!gate(out(2L), "g_words") && !gate(out(2L), "kept_doc"))
    assert(!gate(out(3L), "g_meanlen") && !gate(out(3L), "kept_doc"))
    assert(!gate(out(4L), "g_symbol") && !gate(out(4L), "kept_doc"))
    assert(!gate(out(5L), "g_bullet") && !gate(out(5L), "kept_doc"))
    assert(!gate(out(6L), "g_ellipsis") && !gate(out(6L), "kept_doc"))
    assert(!gate(out(7L), "g_alpha") && !gate(out(7L), "kept_doc"))
    assert(!gate(out(8L), "g_stop") && !gate(out(8L), "kept_doc"))
  }

  test("thresholds are inclusive at the published boundaries " +
    "(cross-multiplication, not floating division)") {
    // exactly 10% bullets: 1 of 10 lines -> 10*1 <= 10 holds
    val tenLines = (okPage +: Seq.fill(8)("tail line here.") :+
      "- bullet line here.").mkString("\n")
    // exactly 30% ellipses: 3 of 10 lines -> 10*3 <= 3*10 holds
    val thirtyEll = (okPage +: Seq.fill(6)("tail line here.") ++:
      Seq.fill(3)("trails off...")).mkString("\n")
    // exactly 80% alpha: 12 numeric of 60 words -> 10*48 >= 8*60 holds
    val eightyAlpha = okPage.split(" ").take(48).mkString(" ") + " " +
      (100 to 111).map(_.toString).mkString(" ")
    val out = rules(1L -> tenLines, 2L -> thirtyEll, 3L -> eightyAlpha)
    assert(gate(out(1L), "g_bullet"))
    assert(gate(out(2L), "g_ellipsis"))
    assert(gate(out(3L), "g_alpha"))
    // and one past each boundary fails
    val out2 = rules(
      1L -> (tenLines + "\n- second bullet here."), // 2 of 11 > 10%
      3L -> (eightyAlpha + " 113"))                 // 48 alpha of 61 < 80%
    assert(!gate(out2(1L), "g_bullet"))
    assert(!gate(out2(3L), "g_alpha"))
  }

  test("word-count boundaries: exactly 50 keeps, 49 drops") {
    val w50 = ("the of " + (1 to 48).map(i => s"word$i").mkString(" "))
    val w49 = ("the of " + (1 to 47).map(i => s"word$i").mkString(" "))
    val out = rules(1L -> w50, 2L -> w49)
    assert(gate(out(1L), "g_words"))
    assert(!gate(out(2L), "g_words"))
  }
}
