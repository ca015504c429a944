package graft.ops

import graft.SparkSpec

/** X64 C4 line/page rules pinned on hand-built pages, beyond the DuckDB
  * oracle: each published rule (Raffel et al. 2020 §2.2) tripped in
  * isolation, plus the kept-doc reassembly contract.
  */
class C4Spec extends SparkSpec {
  import spark.implicits._

  private def clean(pages: (Long, String)*): Map[Long, (Long, Long, Boolean, String)] =
    C4.clean(pages.toDF("doc_id", "page"), "doc_id", "page",
        minWords = 3, minLines = 2)
      .as[(Long, Long, Long, Boolean, Option[String])].collect()
      .map { case (id, nl, nk, kd, cl) => id -> ((nl, nk, kd, cl.orNull)) }
      .toMap

  test("line rules: no terminal punct, short, and javascript lines drop; " +
    "kept lines rejoin in order") {
    val page = Seq(
      "alpha beta gamma.",        // kept
      "delta epsilon zeta",       // dropped: no terminal punctuation
      "eta theta.",               // dropped: 2 words < minWords
      "iota javascript kappa.",   // dropped: javascript mention
      "lambda mu nu!",            // kept (bang terminates)
      "xi omicron pi?",           // kept (question mark terminates)
      "rho sigma tau\"").mkString("\n") // kept (closing quote terminates)
    val (nl, nk, kd, cl) = clean(1L -> page)(1L)
    assert(nl === 7L)
    assert(nk === 4L)
    assert(kd)
    assert(cl === "alpha beta gamma.\nlambda mu nu!\nxi omicron pi?\n" +
      "rho sigma tau\"")
  }

  test("page rules: curly brace, lorem ipsum, and too-few-kept-lines " +
    "each drop the whole doc (cleaned is NULL, counts still reported)") {
    val good = "one two three.\nfour five six."
    val out = clean(
      1L -> good,
      2L -> "one two three.\nfour five { six.",  // brace -> dropped
      3L -> "one two three.\nlorem ipsum four.", // boilerplate -> dropped
      4L -> "one two three.\nfour five six")     // 1 kept < minLines=2
    assert(out(1L) === ((2L, 2L, true, good)))
    assert(out(2L)._3 === false && out(2L)._4 === null)
    assert(out(3L)._3 === false && out(3L)._4 === null)
    assert(out(4L) === ((2L, 1L, false, null)))
  }

  test("the gate is line-local for line rules and page-global for page " +
    "rules: a brace anywhere kills even all-kept pages") {
    val out = clean(5L -> "a b c.\nd e f.\ng h { i.")
    assert(out(5L)._2 === 3L) // every line individually passes
    assert(out(5L)._3 === false)
  }
}
