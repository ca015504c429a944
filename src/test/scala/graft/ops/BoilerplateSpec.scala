package graft.ops

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // threshold 400000 ppm over the 5 non-null docs => removal at
  // document frequency >= 2 (HALF sits exactly ON the edge)
  private val docs = Seq(
    (1L, "x\nBOILER\nHALF\ny"),
    (2L, "BOILER\nz\nONE"),
    (3L, "HALF\nw"),
    (4L, "BOILER\nBOILER\nv"),
    (5L, "BOILER"),
    (6L, null.asInstanceOf[String]))
    .toDF("doc_id", "text")

  test("corpus-frequent lines are removed everywhere, including the " +
    "first occurrence; the >= threshold edge fires; rare lines stay") {
    val out = Boilerplate.removeFrequentLines(docs, "doc_id", "text",
      docFracPpm = 400000L).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 4L, 2L, "x\ny"),       // BOILER + HALF excised mid-doc
      (2L, 3L, 1L, "z\nONE"),     // ONE (df=1) kept
      (3L, 2L, 1L, "w"),          // HALF df=2 == the edge -> removed
      (4L, 3L, 2L, "v"),          // BOTH occurrences go (no keep-first)
      (5L, 1L, 1L, "")))          // all-boilerplate doc keeps "" (dense)
  }

  test("null-text docs are excluded from output AND the frequency " +
    "denominator") {
    // with 6 docs in the denominator the threshold would be df >= 2.4
    // and HALF (df=2) would survive — the fixture pins n_docs = 5
    val fr = Boilerplate.frequentLines(docs, "doc_id", "text", 400000L)
      .orderBy("df").collect()
    assert(fr.map(_.getAs[Long]("n_docs")).toSeq === Seq(5L, 5L))
    assert(fr.map(_.getAs[Long]("df")).toSeq === Seq(2L, 4L))
  }

  test("no line reaches the threshold -> every doc passes through " +
    "unchanged") {
    val out = Boilerplate.removeFrequentLines(docs, "doc_id", "text",
      docFracPpm = 900000L).orderBy("doc_id").collect()
    assert(out.forall(_.getAs[Long]("n_removed") === 0L))
    assert(out.map(_.getAs[String]("cleaned")).toSeq ===
      docs.filter($"text".isNotNull).orderBy("doc_id")
        .collect().map(_.getString(1)).toSeq)
  }

  // --- charEntropy -------------------------------------------------

  /** The spec's own replay of the micro-nat lanes. */
  private def expected(text: String): (Long, Long, Long, Long, Long) = {
    val cps = text.codePoints().toArray.toSeq
    val n = cps.size.toLong
    val counts = cps.groupBy(identity).values.map(_.size.toLong)
    val s = counts.map(c => math.round(math.log(c.toDouble) * c * 1e6)).sum
    val k = counts.size.toLong
    val e = if (n == 0) 0L
      else math.round(math.log(n.toDouble) * 1e6) - s / n
    val norm = if (k > 1 && e > 0)
      e * 1000000L / math.round(math.log(k.toDouble) * 1e6) else 0L
    (n, k, s, e, norm)
  }

  private def entropyOf(rows: Seq[(Long, String)]) =
    TextAnalysis.charEntropy(rows.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))

  test("hand-replayed micro-nat lanes: mixed, uniform, and skewed texts") {
    val texts = Seq("aab", "abcabc", "aaaaaaab", "hello world")
    val got = entropyOf(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    assert(got.toSeq === texts.map(expected))
  }

  test("single-char alphabet has exactly zero entropy and zero norm") {
    val Seq((n, k, _, e, norm)) = entropyOf(Seq((1L, "aaaa"))).toSeq
    assert((n, k, e, norm) === (4L, 1L, 0L, 0L))
  }

  test("empty text keeps a dense zero row; null text is excluded") {
    val got = TextAnalysis.charEntropy(
      Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "ab"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(got.head.getLong(1) === 0L && got.head.getLong(4) === 0L)
  }

  test("supplementary-plane text counts at CODEPOINT grain (the x98 " +
    "pinned seam): astral pairs equal their BMP twins") {
    // same count multiset {2, 1}: a UTF-16-unit engine would see the
    // surrogate halves of each emoji and double the lanes
    val bmp = entropyOf(Seq((1L, "aab")))
    val astral = entropyOf(Seq((1L, "😀😀a")))
    assert(astral.toSeq === bmp.toSeq)
  }
}
